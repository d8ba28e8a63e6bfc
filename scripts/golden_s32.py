"""S=32 posterior gate: the bucketed TPU production path vs the compiled
C reference on a 32-sequence (16-diploid) configuration.

Round-4 had NO working S>=16 TPU configuration (SAMPLES_r04 crash rows);
round-5 root-caused the crashes to dense max-pattern padding and runs
S>=32 pattern-bucketed with per-bucket fused gating.  This gate proves
the bucketed path samples the right posterior at S=32 against the C
reference (which keeps exact ragged per-locus profiles,
src/AlignmentProcessor.h:25-31).  Writes GOLDEN_S32_r05.json.
Run ON THE TPU HOST:

    python scripts/golden_s32.py
"""
import json
import os
import sys

os.environ.setdefault("GPHOCS_GOLDEN_BACKEND", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from golden_compare import run_comparison  # noqa: E402
from tests.test_golden import build_c_reference  # noqa: E402
from tests.test_samples32 import S32_CTL  # noqa: E402

CTL_S32 = (S32_CTL
           .replace("mcmc-iterations     40", "mcmc-iterations     {iters}")
           .replace("burn-in             0", "burn-in             {burnin}")
           .replace("random-seed         19", "random-seed         {seed}"))


def main():
    import tempfile

    work = tempfile.mkdtemp(prefix="goldens32_")
    binary = build_c_reference(work)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "5000")),
        n_chains=int(os.environ.get("GC_CHAINS", "6")),
        burnin=int(os.environ.get("GC_BURNIN", "800")),
        nl=int(os.environ.get("GC_LOCI", "40")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "4")),
        ctl_template=CTL_S32,
        jax_kwargs=dict(dtype=jnp.float32, rng_mode="fast",
                        buckets=int(os.environ.get("GC_BUCKETS", "8"))),
    )
    out["jax_path"] = ("S=32 bucketed TPU f32 fast-RNG "
                      "(per-bucket fused gate)")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GOLDEN_S32_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    worst = max(abs(r["z"]) for r in out["results"])
    print(f"worst |z| = {worst:.2f}")
    assert worst < 3.5, "S=32 posterior mismatch vs C reference"


if __name__ == "__main__":
    main()
