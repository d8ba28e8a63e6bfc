"""In-chunk ablation profile of the fast-mode iteration (run on TPU).

Per-call kernel timings are meaningless (per-dispatch ~2.7 ms through the
TPU relay, DESIGN.md); this measures mcmc_chunk wall time with individual
update families disabled via the *_on static flags, attributing the delta
to each family.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler
from tests.test_control import SAMPLE_CTL

NUM_LOCI = int(os.environ.get("GPHOCS_BENCH_LOCI", "1000"))
ITERS = int(os.environ.get("GPHOCS_BENCH_ITERS", "25"))


def bench_data_path():
    path = f"/tmp/gphocs_bench_seqs_{NUM_LOCI}.txt"
    if not os.path.exists(path):
        from gphocs_tpu.io.simulate import simulate_seq_file
        from gphocs_tpu.model import build_poptree
        cfg = parse_control_text(SAMPLE_CTL)
        tree = build_poptree(cfg)
        simulate_seq_file(cfg, tree, path, num_loci=NUM_LOCI, seq_len=1000,
                          seed=20260817)
    return path


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 111
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=bench_data_path(), dtype=dtype,
                rng_mode="fast")
    s.initialize()
    print("leaf_base:", s.seq.leaf_base.shape, "nodes:", s.gen.age.shape,
          "fused:", s.use_fused)

    from gphocs_tpu.sampler.step import mcmc_chunk

    base_kw = dict(ctx=s.ctx, n_iters=ITERS,
                   genetree_samples=cfg.mcmc.genetree_samples,
                   do_migrate=True, do_mixing=cfg.mcmc.do_mixing,
                   num_pops=s.tree.num_pops,
                   num_cur_pops=s.tree.num_cur_pops,
                   sample_age_mask=tuple(bool(b)
                                         for b in s.tree.update_sample_age),
                   use_fused=getattr(s, "use_fused", False))

    def run(**over):
        kw = dict(base_kw)
        kw.update(over)
        out = mcmc_chunk(s.gen, s.params, s.seq, s.lrng, s.grng, s.lnld,
                         s.lnp, s.cond, s.ft, **kw)
        jax.block_until_ready(out[0].age)
        t0 = time.time()
        out = mcmc_chunk(s.gen, s.params, s.seq, s.lrng, s.grng, s.lnld,
                         s.lnp, s.cond, s.ft, **kw)
        jax.block_until_ready(out[0].age)
        return (time.time() - t0) / ITERS

    full = run()
    print(f"{'full iteration':28s} {full*1e3:9.3f} ms/iter")
    for flag in ("coal_time_on", "mig_time_on", "spr_on", "tau_on",
                 "theta_on", "mig_rate_on", "mixing_on"):
        t = run(**{flag: False})
        print(f"{'minus ' + flag:28s} {t*1e3:9.3f} ms/iter   "
              f"(family ~{(full-t)*1e3:7.3f} ms)")


if __name__ == "__main__":
    main()
