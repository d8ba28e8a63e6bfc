from gphocs_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_sampler_state,
    init_distributed,
)
