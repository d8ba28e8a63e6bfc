from gphocs_tpu.cli import main

raise SystemExit(main())
