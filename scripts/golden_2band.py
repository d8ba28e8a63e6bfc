"""Multi-band unphased-diploid posterior gate (BASELINE config 3).

4-pop tree, TWO migration bands (D->B and A->C), diploid samples with
phase integration — the band-interaction code paths (tau bounds from
multiple windows, per-band stat deltas, multi-band SPR hazard) have a
committed C gate of their own here.  Runs the PRODUCTION path (fused TPU
f32 fast-RNG) against the compiled C reference; writes
GOLDEN_2BAND_r05.json.  Run ON THE TPU HOST:

    python scripts/golden_2band.py

Reference twins: multi-band parsing/validation src/MCMCcontrol.c:1124-1266,
per-band stats src/patch.c:2403-2460.
"""
import json
import os
import sys

os.environ.setdefault("GPHOCS_GOLDEN_BACKEND", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from golden_compare import CTL_TEMPLATE, run_comparison  # noqa: E402
from tests.test_golden import build_c_reference  # noqa: E402

CTL_2BAND = CTL_TEMPLATE.replace(
    """MIG-BANDS-START
	BAND-START
       source  D
       target  B
       mig-rate-print 0.1
	BAND-END
MIG-BANDS-END""",
    """MIG-BANDS-START
	BAND-START
       source  D
       target  B
       mig-rate-print 0.1
	BAND-END
	BAND-START
       source  A
       target  C
       mig-rate-print 0.1
	BAND-END
MIG-BANDS-END""")
assert CTL_2BAND.count("BAND-START") == 2


def main():
    import tempfile

    work = tempfile.mkdtemp(prefix="golden2band_")
    binary = build_c_reference(work)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "16000")),
        n_chains=int(os.environ.get("GC_CHAINS", "16")),
        burnin=int(os.environ.get("GC_BURNIN", "1500")),
        nl=int(os.environ.get("GC_LOCI", "80")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "12")),
        ctl_template=CTL_2BAND,
        jax_kwargs=dict(dtype=jnp.float32, rng_mode="fast"),
    )
    out["jax_path"] = "fused TPU f32 fast-RNG, 2 migration bands"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GOLDEN_2BAND_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    worst = max(abs(r["z"]) for r in out["results"])
    print(f"worst |z| = {worst:.2f}")
    assert worst < 3.5, "2-band posterior mismatch vs C reference"


if __name__ == "__main__":
    main()
