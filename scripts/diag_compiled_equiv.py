"""TPU diagnostics for the fused-path bias (VERDICT r3 item 1).

Three checks, run ON THE TPU HOST with f32 fast-RNG (the production
configuration):

1. compiled-kernel equivalence: one node-age sweep and one SPR sweep via
   the compiled Pallas kernels vs their XLA twins from the SAME state —
   acceptance counts and resulting states must agree (float32 tolerance;
   SPR compared with a single tile so RNG trip sync matches).
2. carried-state drift: after K fused iterations, recompute lnld and lnp
   from scratch in f64 and diff against the carried f32 values.
3. component decomposition: report num_migs / per-pop num_coals /
   coal_stats over the run so a prior shift can be attributed.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from diag_runner import ensure_data, SEQ, NL, BURNIN  # noqa: E402
from golden_compare import CTL_TEMPLATE  # noqa: E402
from gphocs_tpu.config import parse_control_text  # noqa: E402
from gphocs_tpu.sampler.driver import Sampler  # noqa: E402


def main():
    ensure_data()
    ctl = CTL_TEMPLATE.format(seq=SEQ, trace="t.out", iters=4000,
                              burnin=BURNIN, seed=1357)
    cfg = parse_control_text(ctl)
    cfg.mcmc.random_seed = 999
    s = Sampler(cfg, seq_path=SEQ, dtype=jnp.float32, rng_mode="fast")
    assert s.use_fused, "must run on TPU"
    s.initialize()
    # warm: burn in some iterations so migration events are live
    s._sample_mig_rates_device()
    for _ in range(5):
        s.step_chunk(20, do_migrate=True)
    nmig = int(jnp.sum(s.gen.mig_branch >= 0))
    print(f"after warmup: {nmig} live migration events")

    # ---- check 1: compiled Pallas vs XLA twins, same state ----
    from gphocs_tpu.kernels.node_age import update_internal_node_ages
    from gphocs_tpu.kernels.spr import update_spr
    from gphocs_tpu.ops.sweeps_pallas import (node_age_sweep_pallas,
                                              spr_sweep_pallas)

    gen, params, seq = s.gen, s.params, s.seq
    lrng, lnld, lnp, cond = s.lrng, s.lnld, s.lnp, s.cond

    g1, r1, ld1, lp1, c1, a1 = jax.jit(update_internal_node_ages,
                                       static_argnames=())(
        gen, params, seq, lrng, s.ctx, s.ft.coal_time, lnld, lnp, cond)
    g2, r2, ld2, lp2, c2, a2 = jax.jit(
        lambda *xs: node_age_sweep_pallas(*xs))(
        gen, params, seq, lrng, s.ctx, s.ft.coal_time, lnld, lnp, cond)
    d_age = np.max(np.abs(np.asarray(g1.age) - np.asarray(g2.age)))
    d_ld = np.max(np.abs(np.asarray(ld1) - np.asarray(ld2)))
    d_lp = np.max(np.abs(np.asarray(lp1) - np.asarray(lp2)))
    same_moves = np.mean(
        (np.abs(np.asarray(g1.age) - np.asarray(g2.age)) < 1e-9))
    print(f"[node-age] acc XLA={int(a1)} pallas={int(a2)} "
          f"max|dage|={d_age:.3g} max|dlnld|={d_ld:.3g} "
          f"max|dlnp|={d_lp:.3g} frac_same_age={same_moves:.4f}")

    g1s, r1s, ld1s, c1s, a1s = jax.jit(update_spr)(
        gen, params, seq, lrng, s.ctx, lnld, cond)
    g2s, r2s, ld2s, c2s, a2s = jax.jit(
        lambda *xs: spr_sweep_pallas(*xs, tile=128))(
        gen, params, seq, lrng, s.ctx, lnld, cond)
    # single tile only if L <= 128; with NL=80 padded to 128 -> one tile
    same_fa = np.mean(np.asarray(g1s.father) == np.asarray(g2s.father))
    d_lds = np.max(np.abs(np.asarray(ld1s) - np.asarray(ld2s)))
    print(f"[spr] acc XLA={int(a1s)} pallas={int(a2s)} "
          f"frac_same_father={same_fa:.4f} max|dlnld|={d_lds:.3g} "
          f"ctr XLA={int(r1s.ctr)} pallas={int(r2s.ctr)}")

    # ---- check 2: drift after K more fused iterations ----
    K = int(os.environ.get("DIAG_DRIFT_ITERS", "1000"))
    done = 0
    while done < K:
        s.step_chunk(min(64, K - done), do_migrate=True)
        done += min(64, K - done)
    from gphocs_tpu.ops.likelihood_cache import full_build, lnld_from_cond
    from gphocs_tpu.kernels.common import gen_log_prior

    cond_f = full_build(s.gen, s.seq)
    lnld_f = lnld_from_cond(cond_f, s.gen, s.seq)
    lnp_f = gen_log_prior(s.gen, s.params, s.ctx)
    d_ld = np.asarray(s.lnld - lnld_f)
    d_lp = np.asarray(s.lnp - lnp_f)
    d_cond = np.max(np.abs(np.asarray(s.cond - cond_f)))
    print(f"[drift after {done} fused iters] "
          f"lnld: max|d|={np.max(np.abs(d_ld)):.3g} sum_d={np.sum(d_ld):.3g}"
          f"  lnp: max|d|={np.max(np.abs(d_lp)):.3g} "
          f"sum_d={np.sum(d_lp):.3g}  max|dcond|={d_cond:.3g}")

    # f64 recompute of lnp on host (exact formula, f64 accumulation)
    import gphocs_tpu.ops.coalstats as CS
    from gphocs_tpu.kernels.common import make_context, band_windows
    tree64 = s.tree
    ctx64 = make_context(tree64, jnp.float64)
    from gphocs_tpu.state import GenState, Params
    gen64 = s.gen._replace(age=jnp.asarray(np.asarray(s.gen.age), jnp.float64),
                           mig_age=jnp.asarray(np.asarray(s.gen.mig_age),
                                               jnp.float64),
                           mut_rate=jnp.asarray(np.asarray(s.gen.mut_rate),
                                                jnp.float64))
    p64 = Params(*[jnp.asarray(np.asarray(x), jnp.float64)
                   for x in s.params])
    bs, be = band_windows(ctx64, p64.tau)
    st64 = CS.sufficient_stats(gen64, p64, ctx64.father_pop,
                               ctx64.is_ancestral, ctx64.band_source,
                               ctx64.band_target, bs, be, ctx64.oldage)
    lnp64 = CS.genealogy_log_prior(st64, p64)
    d64 = np.asarray(s.lnp, np.float64) - np.asarray(lnp64)
    print(f"[lnp f32-carried vs f64-fresh] max|d|={np.max(np.abs(d64)):.3g} "
          f"sum_d={np.sum(d64):.3g}")
    print(f"[state] num_migs={int(jnp.sum(s.gen.mig_branch >= 0))} "
          f"lnp_sum={float(jnp.sum(s.lnp)):.3f} "
          f"lnld_sum={float(jnp.sum(s.lnld)):.3f}")


if __name__ == "__main__":
    main()
