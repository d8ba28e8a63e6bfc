"""Posterior gate for the PRODUCTION path: fused TPU f32 fast-RNG chains
vs the compiled C reference on the bundled-sample-shape config.

Round-5 strengthening (VERDICT Weak #4): 16 C chains x 12 jax chains x
16k iterations so the migration-rate between-chain SE tightens enough
that a ~1.5x systematic m bias would fail the 3-sigma gate (the round-4
gates passed a 2.8x m gap at z=-1.75).

The committed gates (GOLDEN_r02 / *_r03) run the conformance path
(legacy RNG, f64, CPU).  This gate runs the exact code the benchmark
measures — whole-sweep Pallas kernels, f32, counter-based RNG — and
asserts the same between-chain posterior agreement.  Writes
GOLDEN_FUSED_r05.json.  Run ON THE TPU HOST:

    GPHOCS_GOLDEN_BACKEND=tpu python scripts/golden_fused_tpu.py
"""
import json
import os
import subprocess
import sys

os.environ.setdefault("GPHOCS_GOLDEN_BACKEND", "tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from golden_compare import run_comparison  # noqa: E402
from tests.test_golden import build_c_reference  # noqa: E402


def main():
    import tempfile

    work = tempfile.mkdtemp(prefix="goldenfused_")
    binary = build_c_reference(work)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "16000")),
        n_chains=int(os.environ.get("GC_CHAINS", "16")),
        burnin=int(os.environ.get("GC_BURNIN", "1500")),
        nl=int(os.environ.get("GC_LOCI", "100")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "12")),
        jax_kwargs=dict(dtype=jnp.float32, rng_mode="fast"),
    )
    out["jax_path"] = "fused TPU f32 fast-RNG (ops/sweeps_pallas.py)"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GOLDEN_FUSED_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    worst = max(abs(r["z"]) for r in out["results"])
    print(f"worst |z| = {worst:.2f}")
    assert worst < 3.0, "fused-path posterior mismatch vs C reference"


if __name__ == "__main__":
    main()
