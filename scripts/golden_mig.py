"""Identifiable-migration posterior gate (round-5, VERDICT Weak #4).

The committed gates simulate with m drawn from the reference's default
heavy-tailed prior (shape 0.002) — the true rate is ~0, the data carry
no migration signal, and the m chain means ride rare prior excursions,
so the between-chain SE can never resolve a moderate systematic bias
(round-4 gates passed a 2.8x m gap).  Here the data are simulated WITH
a real migration rate, the posterior concentrates, and the m column
becomes a sharp two-sided test of the fused SPR/mig-age/mig-rate
kernels that own migration.  Writes GOLDEN_MIG_r05.json.  Run ON THE
TPU HOST:

    python scripts/golden_mig.py

Reference twins: UpdateMigRates src/GPhoCS.c:3115-3212, traceLineage
migration branching src/patch.c:1140-1225.
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


def main():
    import tempfile

    work = tempfile.mkdtemp(prefix="goldenmig_")
    binary = build_c_reference(work)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "12000")),
        n_chains=int(os.environ.get("GC_CHAINS", "10")),
        burnin=int(os.environ.get("GC_BURNIN", "1500")),
        nl=int(os.environ.get("GC_LOCI", "100")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "8")),
        jax_kwargs=dict(dtype=jnp.float32, rng_mode="fast"),
        true_mig_rate=float(os.environ.get("GC_TRUE_M", "200.0")),
    )
    out["jax_path"] = "fused TPU f32 fast-RNG; data simulated with m=200"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GOLDEN_MIG_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    m_rows = [r for r in out["results"] if r["param"].startswith("m_")]
    worst = max(abs(r["z"]) for r in out["results"])
    print(f"worst |z| = {worst:.2f}")
    for r in m_rows:
        rel_se = r["se"] / max(abs(r["c_mean"]), 1e-12)
        print(f"  {r['param']}: c={r['c_mean']:.2f} jax={r['jax_mean']:.2f} "
              f"se/c_mean={rel_se:.2%} z={r['z']:.2f}")
        assert rel_se < 0.2, "m gate underpowered"
    assert worst < 3.5, "identifiable-m posterior mismatch vs C reference"


if __name__ == "__main__":
    main()
