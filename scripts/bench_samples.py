"""Sample-axis bench: per-iteration cost at S=8 / S=32 / S=64 (run on TPU).

Writes SAMPLES_r04.json.  The reference supports NS=200
(src/patch.h:17-22); this measures how the fused-sweep per-locus cost
scales with the sample count at 1000 loci.
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
    for name, ctl_text in (("S8", SAMPLE_CTL),
                           ("S32", S32_CTL.format(seq="x", trace="t.out")),
                           ("S64", S64_CTL.format(seq="x", trace="t.out"))):
        cfg = parse_control_text(ctl_text)
        tree = build_poptree(cfg)
        S = tree.num_samples
        path = f"/tmp/gphocs_sbench_{S}_{NUM_LOCI}.txt"
        if not os.path.exists(path):
            simulate_seq_file(cfg, tree, path, num_loci=NUM_LOCI,
                              seq_len=1000, seed=29)
        cfg.mcmc.random_seed = 11
        cfg.mcmc.start_mig = 0
        # S >= 32: the whole-sweep SPR kernel's Mosaic program grows
        # ~O(N^2) (segment sort network + per-node coverage loops) and
        # its compile time blows past an hour at N=63 — measured, not
        # worth it for an artifact run.  Record the XLA-path numbers for
        # the large-S rows and the limitation itself.
        fused_ok = S <= 16
        if not fused_ok:
            os.environ["GPHOCS_FUSED"] = "0"
        try:
            t0 = time.time()
            s = Sampler(cfg, seq_path=path, dtype=dtype, rng_mode="fast")
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
            rows.append(dict(config=name, samples=S,
                             patterns=int(s.seq.leaf_base.shape[2]),
                             path="fused" if s.use_fused else "xla",
                             ms_per_iter=round(dt * 1e3, 3),
                             init_s=round(init_s, 1),
                             compile_s=round(compile_s, 1)))
        except Exception as exc:  # record the failure mode (VMEM etc.)
            rows.append(dict(config=name, samples=S,
                             error=str(exc)[:400]))
        finally:
            os.environ.pop("GPHOCS_FUSED", None)
        print(rows[-1], flush=True)

    r8 = rows[0]
    out = dict(device=str(jax.devices()[0]), num_loci=NUM_LOCI, iters=ITERS,
               fused_limit=("fused whole-sweep kernels: VMEM tile budget "
                            "caps N*CPWP<=8192 (driver auto-fallback) and "
                            "the SPR kernel's Mosaic compile grows ~O(N^2)"
                            " — S>16 rows measured on the XLA path"),
               rows=rows,
               cost_ratio_vs_S8={r["config"]: round(
                   r["ms_per_iter"] / r8["ms_per_iter"], 2)
                   for r in rows if "ms_per_iter" in r})
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SAMPLES_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
