"""Sample-axis bench: per-iteration cost at S=8 / S=32 / S=64 (run on TPU).

Writes SAMPLES_r05.json.  The reference supports NS=200
(src/patch.h:17-22); this measures how per-locus cost scales with the
sample count at 1000 loci.

Round-4 ledger: S=32/64 CRASHED the TPU worker (SAMPLES_r04.json).
Round-5 root cause: not a kernel fault but HBM exhaustion from global
max-pattern padding — the phased-pattern distribution is extremely
heavy-tailed (S=32 simulated data: median 1 pattern/locus, ONE locus at
1025 = a 2^10 phasing expansion), so dense padding multiplied the
conditional tensors 355x and the compiled chunk's temporaries hit
~13 GB at L=1000 (XLA memory analysis: 6.5 GB temp at L=500).  Fix:
pattern-axis bucketing (sampler/bucketed.py) — the designed answer for
ragged loci — with the round-5 per-bucket fused gate (small-pattern
buckets keep the fused Pallas sweeps; only VMEM-oversized buckets fall
back to XLA).  S>=32 rows therefore run with --buckets.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_LOCI = int(os.environ.get("GPHOCS_S_LOCI", "1000"))
ITERS = int(os.environ.get("GPHOCS_S_ITERS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.sampler.driver import Sampler
    from tests.test_control import SAMPLE_CTL
    from tests.test_samples32 import S32_CTL

    # S=64: 8 diploid individuals per current pop (32 diploids total)
    S64_CTL = S32_CTL
    for pop in "abcd":
        S64_CTL = S64_CTL.replace(
            f"samples  {pop}1 d {pop}2 d {pop}3 d {pop}4 d",
            f"samples  {pop}1 d {pop}2 d {pop}3 d {pop}4 d "
            f"{pop}5 d {pop}6 d {pop}7 d {pop}8 d")

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    rows = []
    for name, ctl_text, buckets in (
            ("S8", SAMPLE_CTL, 1),
            ("S32", S32_CTL.format(seq="x", trace="t.out"), 8),
            ("S64", S64_CTL.format(seq="x", trace="t.out"), 8)):
        cfg = parse_control_text(ctl_text)
        tree = build_poptree(cfg)
        S = tree.num_samples
        path = f"/tmp/gphocs_sbench_{S}_{NUM_LOCI}.txt"
        if not os.path.exists(path):
            simulate_seq_file(cfg, tree, path, num_loci=NUM_LOCI,
                              seq_len=1000, seed=29)
        cfg.mcmc.random_seed = 11
        cfg.mcmc.start_mig = 0
        try:
            t0 = time.time()
            s = Sampler(cfg, seq_path=path, dtype=dtype, rng_mode="fast",
                        buckets=buckets)
            s.initialize()
            init_s = time.time() - t0
            t0 = time.time()
            s.step_chunk(ITERS, do_migrate=True)
            jax.block_until_ready(s.params.theta)
            compile_s = time.time() - t0
            t0 = time.time()
            s.step_chunk(ITERS, do_migrate=True)
            jax.block_until_ready(s.params.theta)
            dt = (time.time() - t0) / ITERS
            if buckets > 1:
                pats = [int(q.leaf_base.shape[2]) for q in s.seqs]
                path_desc = ("bucketed x%d (fused buckets: %s; pattern "
                             "caps: %s)" % (buckets,
                                            list(s.bucket_fused), pats))
            else:
                pats = [int(s.seq.leaf_base.shape[2])]
                path_desc = "fused" if s.use_fused else "xla"
            rows.append(dict(config=name, samples=S,
                             patterns=max(pats),
                             path=path_desc,
                             ms_per_iter=round(dt * 1e3, 3),
                             init_s=round(init_s, 1),
                             compile_s=round(compile_s, 1)))
        except Exception as exc:  # record the failure mode (VMEM etc.)
            rows.append(dict(config=name, samples=S,
                             error=str(exc)[:400]))
        print(rows[-1], flush=True)

    r8 = rows[0]
    out = dict(device=str(jax.devices()[0]), num_loci=NUM_LOCI, iters=ITERS,
               notes=("S>=32 rows run pattern-bucketed (8 buckets) with "
                      "the per-bucket fused gate: the r04 worker crashes "
                      "were HBM exhaustion from dense max-pattern padding "
                      "(heavy-tailed phasing expansion), not kernel "
                      "faults.  The fused SPR kernel's Mosaic program is "
                      "O(log^2 K) per node step since round 5 (bitonic "
                      "2D sort; was an O(K^2) unrolled network)."),
               rows=rows,
               cost_ratio_vs_S8={r["config"]: round(
                   r["ms_per_iter"] / r8["ms_per_iter"], 2)
                   for r in rows if "ms_per_iter" in r})
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SAMPLES_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
