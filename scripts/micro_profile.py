"""Micro-profile the non-fused building blocks of the iteration (TPU).

Each block is timed inside ONE jitted fori_loop of REPS trips (carrying
its outputs) so per-call dispatch (~2.7 ms, DESIGN.md) is amortized and
XLA cannot dead-code the body.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# f64 on CPU (exact conformance twin; no-op on TPU where the f32 branch
# below is taken) — mirrors bench.py/golden_compare.py
if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler
from tests.test_control import SAMPLE_CTL

NUM_LOCI = int(os.environ.get("GPHOCS_BENCH_LOCI", "1000"))
REPS = int(os.environ.get("GPHOCS_REPS", "50"))


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


def timeit(name, fn, *args, n_timed: int = 3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n_timed):  # min over reps rejects host-side jitter
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / REPS)
    print(f"{name:34s} {best*1e3:9.4f} ms/call")
    return best


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 111
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=bench_data_path(), dtype=dtype,
                rng_mode="fast")
    s.initialize()

    from gphocs_tpu.kernels.common import full_stats, gen_log_prior
    from gphocs_tpu.kernels.mig_age import update_mig_ages
    from gphocs_tpu.kernels.mixing import update_mixing
    from gphocs_tpu.kernels.tau import update_taus
    from gphocs_tpu.ops.likelihood_cache import (
        full_rebuild_and_lnld, make_tables, full_build)
    from gphocs_tpu.ops.sweeps_pallas import (
        node_age_sweep_pallas, spr_sweep_pallas)

    gen, params, seq, ctx = s.gen, s.params, s.seq, s.ctx
    lnld, lnp, cond = s.lnld, s.lnp, s.cond
    lrng, grng, ft = s.lrng, s.grng, s.ft
    P = s.tree.num_pops
    PC = s.tree.num_cur_pops

    # perturb-carry loops: carry a scalar into the inputs so iterations chain
    def loop(body):
        def f(x0):
            def step(i, c):
                return body(c, i)
            return jax.lax.fori_loop(0, REPS, step, x0)
        return f

    tables = make_tables(gen)

    timeit("full_stats", loop(
        lambda c, i: c + sum(map(jnp.sum, jax.tree_util.tree_leaves(
            full_stats(gen._replace(age=gen.age + c * 1e-30), params,
                       ctx))))
        * 1e-30), jnp.zeros((), dtype))

    timeit("gen_log_prior", loop(
        lambda c, i: c + jnp.sum(gen_log_prior(
            gen._replace(age=gen.age + c * 1e-30), params, ctx)) * 1e-30),
        jnp.zeros((), dtype))

    timeit("make_tables", loop(
        lambda c, i: c + sum(map(jnp.sum, jax.tree_util.tree_leaves(
            make_tables(gen._replace(
                # fold-proof int perturbation: nonzero only if the f32
                # carry ever exceeds 2^30 (it cannot), but opaque to the
                # algebraic simplifier unlike `c * 0`
                father=gen.father + (c.astype(jnp.int32)
                                     // jnp.int32(1 << 30))))))).astype(
                    dtype) * 1e-30), jnp.zeros((), dtype))

    timeit("full_rebuild_and_lnld", loop(
        lambda c, i: c + jnp.sum(full_rebuild_and_lnld(
            gen._replace(age=gen.age + c * 1e-30), seq, tables)[1]) * 1e-30),
        jnp.zeros((), dtype))

    timeit("full_build", loop(
        lambda c, i: c + jnp.sum(full_build(
            gen._replace(age=gen.age + c * 1e-30), seq)) * 1e-30),
        jnp.zeros((), dtype))

    def mig_body(carry, i):
        g, r, lp = carry
        g2, r2, lp2, _ = update_mig_ages(g, params, r, ctx, ft.mig_time, lp)
        return (g2, r2, lp2)
    timeit("update_mig_ages (sweep)", loop(mig_body), (gen, lrng, lnp))

    def tau_body(carry, i):
        g, p, r, ld, lp, cd = carry
        g, p, r, ld, lp, cd, _, _ = update_taus(
            g, p, seq, r, ctx, ft.taus, ld, lp, cd, P, PC)
        return (g, p, r, ld, lp, cd)
    timeit("update_taus (sweep)", loop(tau_body),
           (gen, params, grng, lnld, lnp, cond))

    def mix_body(carry, i):
        g, p, r, ld, lp, cd = carry
        st = full_stats(g, p, ctx)
        g, p, r, ld, lp, cd, _ = update_mixing(
            g, p, seq, r, ctx, ft.mixing, ld, lp, cd, st, PC)
        return (g, p, r, ld, lp, cd)
    timeit("full_stats+update_mixing", loop(mix_body),
           (gen, params, grng, lnld, lnp, cond))

    def na_body(carry, i):
        g, r, ld, lp, cd = carry
        g, r, ld, lp, cd, _ = node_age_sweep_pallas(
            g, params, seq, r, ctx, ft.coal_time, ld, lp, cd)
        return (g, r, ld, lp, cd)
    timeit("node_age_sweep_pallas", loop(na_body),
           (gen, lrng, lnld, lnp, cond))

    def spr_body(carry, i):
        g, r, ld, cd = carry
        g, r, ld, cd, _ = spr_sweep_pallas(g, params, seq, r, ctx, ld, cd)
        return (g, r, ld, cd)
    timeit("spr_sweep_pallas", loop(spr_body), (gen, lrng, lnld, cond))


if __name__ == "__main__":
    main()
