"""Smoke + timing of the fused node-age sweep kernel on real TPU (f32)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler
from tests.test_control import SAMPLE_CTL

NUM_LOCI = int(os.environ.get("GPHOCS_BENCH_LOCI", "1000"))


def main():
    path = f"/tmp/gphocs_bench_seqs_{NUM_LOCI}.txt"
    if not os.path.exists(path):
        from gphocs_tpu.io.simulate import simulate_seq_file
        from gphocs_tpu.model import build_poptree
        cfg = parse_control_text(SAMPLE_CTL)
        tree = build_poptree(cfg)
        simulate_seq_file(cfg, tree, path, num_loci=NUM_LOCI, seq_len=1000,
                          seed=20260817)
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 111
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float32, rng_mode="fast")
    s.initialize()
    s.step_chunk(3, do_migrate=True)  # warm state
    jax.block_until_ready(s.gen.age)

    from gphocs_tpu.kernels.node_age import update_internal_node_ages
    from gphocs_tpu.ops.sweeps_pallas import node_age_sweep_pallas

    args = (s.gen, s.params, s.seq, s.lrng, s.ctx, s.ft.coal_time,
            s.lnld, s.lnp, s.cond)

    xla = jax.jit(lambda g, p, sq, r, ld, lp, c: update_internal_node_ages(
        g, p, sq, r, s.ctx, s.ft.coal_time, ld, lp, c))
    fused = jax.jit(lambda g, p, sq, r, ld, lp, c: node_age_sweep_pallas(
        g, p, sq, r, s.ctx, s.ft.coal_time, ld, lp, c))

    t0 = time.time()
    o1 = xla(s.gen, s.params, s.seq, s.lrng, s.lnld, s.lnp, s.cond)
    jax.block_until_ready(o1[0].age)
    print(f"xla compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    o2 = fused(s.gen, s.params, s.seq, s.lrng, s.lnld, s.lnp, s.cond)
    jax.block_until_ready(o2[0].age)
    print(f"fused compile+run: {time.time()-t0:.1f}s")

    a1, a2 = np.asarray(o1[0].age), np.asarray(o2[0].age)
    mism = np.sum(np.abs(a1 - a2) > 1e-6)
    print("acc xla:", int(o1[5]), " acc fused:", int(o2[5]),
          " age mismatches:", int(mism), "/", a1.size)
    print("lnld maxdiff:", float(np.max(np.abs(np.asarray(o1[2])
                                               - np.asarray(o2[2])))))
    print("lnp  maxdiff:", float(np.max(np.abs(np.asarray(o1[3])
                                               - np.asarray(o2[3])))))

    for name, fn, out in (("xla", xla, o1), ("fused", fused, o2)):
        n = 50
        t0 = time.time()
        for _ in range(n):
            out = fn(s.gen, s.params, s.seq, s.lrng, s.lnld, s.lnp, s.cond)
        jax.block_until_ready(out[0].age)
        print(f"{name:6s} sweep: {(time.time()-t0)/n*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
