"""Per-kernel wall-time profile on the bench workload (run on TPU)."""
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


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:35s} {dt*1e3:9.3f} ms")
    return dt


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 111
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=bench_data_path(), dtype=dtype)
    s.initialize()
    print("P (patterns padded):", s.seq.leaf_base.shape,
          "nodes:", s.gen.age.shape)

    from gphocs_tpu.kernels.node_age import update_internal_node_ages
    from gphocs_tpu.kernels.mig_age import update_mig_ages
    from gphocs_tpu.kernels.spr import update_spr
    from gphocs_tpu.kernels.tau import update_taus
    from gphocs_tpu.kernels.mixing import update_mixing
    from gphocs_tpu.kernels.scalar_params import update_thetas, update_mig_rates
    from gphocs_tpu.kernels.common import full_stats, gen_log_prior
    from gphocs_tpu.ops.pruning import data_log_likelihood

    gen, params, seq = s.gen, s.params, s.seq
    lrng, grng, lnld, lnp, ctx, ft = s.lrng, s.grng, s.lnld, s.lnp, s.ctx, s.ft
    cond = s.cond

    timeit("data_log_likelihood (1 pass)",
           jax.jit(data_log_likelihood), gen, seq)
    timeit("gen_log_prior (1 pass)",
           jax.jit(lambda g, p: gen_log_prior(g, p, ctx)), gen, params)
    timeit("full_stats",
           jax.jit(lambda g, p: full_stats(g, p, ctx)), gen, params)
    timeit("update_internal_node_ages",
           jax.jit(lambda *a: update_internal_node_ages(*a, ctx, ft.coal_time,
                                                        lnld, lnp, cond)),
           gen, params, seq, lrng)
    timeit("update_mig_ages",
           jax.jit(lambda *a: update_mig_ages(*a, ctx, ft.mig_time, lnp)),
           gen, params, lrng)
    timeit("update_spr",
           jax.jit(lambda *a: update_spr(*a, ctx, lnld, cond)),
           gen, params, seq, lrng)
    stats = full_stats(gen, params, ctx)
    timeit("update_thetas",
           jax.jit(lambda *a: update_thetas(*a, ctx, ft.theta, lnp, stats)),
           gen, params, grng)
    timeit("update_mig_rates",
           jax.jit(lambda *a: update_mig_rates(*a, ctx, ft.mig_rate, lnp,
                                               stats)),
           gen, params, grng)
    timeit("update_taus",
           jax.jit(lambda *a: update_taus(*a, ctx, ft.taus, lnld, lnp, cond,
                                          s.tree.num_pops,
                                          s.tree.num_cur_pops)),
           gen, params, seq, grng)
    timeit("update_mixing",
           jax.jit(lambda *a: update_mixing(*a, ctx, ft.mixing, lnld, lnp,
                                            cond, stats,
                                            s.tree.num_cur_pops)),
           gen, params, seq, grng)


if __name__ == "__main__":
    main()
