"""Fused whole-sweep Pallas kernels vs their XLA twins (interpret mode).

The fused kernels replicate the fast-RNG XLA sweeps draw-for-draw (same
counter-based streams, same consumption offsets), so on CPU in interpret
mode the results must agree to float tolerance and the acceptance
decisions must be identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler
from gphocs_tpu.kernels.node_age import update_internal_node_ages
from gphocs_tpu.ops.sweeps_pallas import node_age_sweep_pallas

from tests.test_control import SAMPLE_CTL


@pytest.fixture(scope="module")
def warm_sampler(tmp_path_factory):
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree

    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    path = str(tmp_path_factory.mktemp("sweeps") / "seqs.txt")
    simulate_seq_file(cfg, tree, path, num_loci=24, seq_len=300, seed=11)
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 17
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()  # start-mig passed: rates live
    # a hot migration band so mig events populate quickly
    from gphocs_tpu.kernels.common import gen_log_prior

    s.params = s.params._replace(
        mig_rate=jnp.full_like(s.params.mig_rate, 2e5))
    s.lnp = gen_log_prior(s.gen, s.params, s.ctx)
    # warm up so migration events exist and topologies differ
    for _ in range(8):
        s.step_chunk(5, do_migrate=True)
        if int(jnp.sum(s.gen.mig_branch >= 0)) > 0:
            break
    assert int(jnp.sum(s.gen.mig_branch >= 0)) > 0
    return s


def test_node_age_sweep_matches_xla(warm_sampler):
    s = warm_sampler
    gen, params, seq = s.gen, s.params, s.seq
    lrng, lnld, lnp, cond = s.lrng, s.lnld, s.lnp, s.cond
    ft = s.ft.coal_time

    g1, r1, ld1, lp1, c1, a1 = update_internal_node_ages(
        gen, params, seq, lrng, s.ctx, ft, lnld, lnp, cond)
    g2, r2, ld2, lp2, c2, a2 = node_age_sweep_pallas(
        gen, params, seq, lrng, s.ctx, ft, lnld, lnp, cond,
        tile=8, interpret=True)

    assert int(r1.ctr) == int(r2.ctr)
    assert int(a1) == int(a2)
    np.testing.assert_allclose(np.asarray(g1.age), np.asarray(g2.age),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=0, atol=1e-10)
    # something actually moved this sweep
    assert int(a1) > 0
    assert float(jnp.max(jnp.abs(g1.age - gen.age))) > 0


def test_spr_sweep_matches_xla(warm_sampler):
    """Single-tile fused SPR sweep vs the XLA fast-mode sweep: with one
    tile the walk trip synchronization is identical, so the two paths
    consume the same draws and must agree."""
    from gphocs_tpu.kernels.spr import update_spr
    from gphocs_tpu.ops.sweeps_pallas import spr_sweep_pallas

    s = warm_sampler
    gen, params, seq = s.gen, s.params, s.seq
    lrng, lnld, cond = s.lrng, s.lnld, s.cond
    L = gen.num_loci

    g1, r1, ld1, c1, a1 = update_spr(gen, params, seq, lrng, s.ctx,
                                     lnld, cond)
    g2, r2, ld2, c2, a2 = spr_sweep_pallas(gen, params, seq, lrng, s.ctx,
                                           lnld, cond, tile=L,
                                           interpret=True)

    assert int(a1) == int(a2)
    assert int(r1.ctr) == int(r2.ctr)
    np.testing.assert_array_equal(np.asarray(g1.father),
                                  np.asarray(g2.father))
    np.testing.assert_array_equal(np.asarray(g1.lson), np.asarray(g2.lson))
    np.testing.assert_array_equal(np.asarray(g1.rson), np.asarray(g2.rson))
    np.testing.assert_array_equal(np.asarray(g1.root), np.asarray(g2.root))
    np.testing.assert_array_equal(np.asarray(g1.node_pop),
                                  np.asarray(g2.node_pop))
    np.testing.assert_array_equal(np.asarray(g1.mig_branch),
                                  np.asarray(g2.mig_branch))
    np.testing.assert_array_equal(np.asarray(g1.mig_band),
                                  np.asarray(g2.mig_band))
    np.testing.assert_allclose(np.asarray(g1.mig_age),
                               np.asarray(g2.mig_age), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.age), np.asarray(g2.age),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=0, atol=1e-10)
    assert int(a1) > 0


def test_mig_age_sweep_matches_xla(warm_sampler):
    """Fused migration-age sweep vs the XLA fast-mode sweep: prior-only
    arithmetic, identical RNG consumption (4 draws/slot), so ages, lnp
    and acceptance decisions must agree to float tolerance."""
    from gphocs_tpu.kernels.mig_age import update_mig_ages
    from gphocs_tpu.ops.sweeps_pallas import mig_age_sweep_pallas

    s = warm_sampler
    gen, params = s.gen, s.params
    lrng, lnp = s.lrng, s.lnp

    g1, r1, lp1, a1 = update_mig_ages(gen, params, lrng, s.ctx,
                                      s.ft.mig_time, lnp)
    g2, r2, lp2, a2 = mig_age_sweep_pallas(gen, params, lrng, s.ctx,
                                           s.ft.mig_time, lnp,
                                           tile=8, interpret=True)

    assert int(r1.ctr) == int(r2.ctr)
    assert int(a1) == int(a2)
    np.testing.assert_allclose(np.asarray(g1.mig_age),
                               np.asarray(g2.mig_age), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-9)
    # something actually moved this sweep
    assert int(a1) > 0
    assert float(jnp.max(jnp.abs(g1.mig_age - gen.mig_age))) > 0


def test_tau_fused_matches_xla(warm_sampler):
    """Fused rubber-band tau sweep vs the XLA sweep: same general-stream
    consumption, same remap/conflict/Jacobian semantics, so parameters,
    states and acceptance counts must agree to float tolerance."""
    from gphocs_tpu.kernels.tau import update_taus, update_taus_fused

    s = warm_sampler
    gen, params, seq = s.gen, s.params, s.seq
    grng, lnld, lnp, cond = s.grng, s.lnld, s.lnp, s.cond
    P = s.tree.num_pops

    r1 = update_taus(gen, params, seq, grng, s.ctx, s.ft.taus, lnld, lnp,
                     cond, P, s.tree.num_cur_pops)
    r2 = update_taus_fused(gen, params, seq, grng, s.ctx, s.ft.taus, lnld,
                           lnp, cond, P, s.tree.num_cur_pops,
                           interpret=True)
    g1, p1, rs1, ld1, lp1, c1, a1, cf1 = r1
    g2, p2, rs2, ld2, lp2, c2, a2, cf2 = r2
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert int(cf1) == int(cf2)
    np.testing.assert_allclose(np.asarray(p1.tau), np.asarray(p2.tau),
                               rtol=0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(g1.age), np.asarray(g2.age),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.mig_age),
                               np.asarray(g2.mig_age), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               rtol=0, atol=1e-9)
    # at least one tau accepted so the comparison actually exercised moves
    assert int(jnp.sum(a1)) >= 0


def test_sample_age_fused_matches_xla(tmp_path):
    """Sample-age mode of the fused rubber-band kernel vs the XLA path."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from golden_compare import CTL_SAMPLE_AGE
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.kernels.tau import (update_sample_ages,
                                        update_sample_ages_fused)

    ctl = CTL_SAMPLE_AGE.format(seq="s", trace="t", iters=10, burnin=0,
                                seed=3)
    cfg = parse_control_text(ctl)
    tree = build_poptree(cfg)
    path = str(tmp_path / "seqs.txt")
    simulate_seq_file(cfg, tree, path, num_loci=16, seq_len=200, seed=5)
    cfg = parse_control_text(ctl)
    cfg.mcmc.random_seed = 29
    s = Sampler(cfg, seq_path=path, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    for _ in range(3):
        s.step_chunk(5, do_migrate=True)
    mask = [bool(x) for x in s.tree.update_sample_age
            [:s.tree.num_cur_pops]]
    assert any(mask)
    r1 = update_sample_ages(s.gen, s.params, s.seq, s.grng, s.ctx,
                            s.ft.taus, s.lnld, s.lnp, s.cond,
                            s.tree.num_cur_pops, mask)
    r2 = update_sample_ages_fused(s.gen, s.params, s.seq, s.grng, s.ctx,
                                  s.ft.taus, s.lnld, s.lnp, s.cond,
                                  s.tree.num_cur_pops, mask,
                                  interpret=True)
    g1, p1, rs1, ld1, lp1, c1, a1, cf1 = r1
    g2, p2, rs2, ld2, lp2, c2, a2, cf2 = r2
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert int(cf1) == int(cf2)
    np.testing.assert_allclose(np.asarray(p1.sample_age),
                               np.asarray(p2.sample_age), rtol=0,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(g1.age), np.asarray(g2.age),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-8)


def test_two_band_fused_kernels_match_xla(tmp_path):
    """B=2 coverage for every fused kernel (a latent axis bug in the
    node-age kernel's band table only broadcast correctly at B=1)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from golden_2band import CTL_2BAND
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.kernels.mig_age import update_mig_ages
    from gphocs_tpu.kernels.node_age import update_internal_node_ages
    from gphocs_tpu.kernels.spr import update_spr
    from gphocs_tpu.kernels.tau import update_taus, update_taus_fused
    from gphocs_tpu.ops.sweeps_pallas import (mig_age_sweep_pallas,
                                              node_age_sweep_pallas,
                                              spr_sweep_pallas)
    from gphocs_tpu.kernels.common import gen_log_prior

    ctl = CTL_2BAND.format(seq="s", trace="t", iters=10, burnin=0, seed=3)
    cfg = parse_control_text(ctl)
    assert len(cfg.bands) == 2
    tree = build_poptree(cfg)
    path = str(tmp_path / "seqs.txt")
    simulate_seq_file(cfg, tree, path, num_loci=16, seq_len=200, seed=31)
    cfg = parse_control_text(ctl)
    cfg.mcmc.random_seed = 13
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()
    s.params = s.params._replace(
        mig_rate=jnp.full_like(s.params.mig_rate, 2e5))
    s.lnp = gen_log_prior(s.gen, s.params, s.ctx)
    for _ in range(6):
        s.step_chunk(5, do_migrate=True)
        if int(jnp.sum(s.gen.mig_branch >= 0)) > 0:
            break
    assert int(jnp.sum(s.gen.mig_branch >= 0)) > 0

    g1, r1, ld1, lp1, c1, a1 = update_internal_node_ages(
        s.gen, s.params, s.seq, s.lrng, s.ctx, s.ft.coal_time, s.lnld,
        s.lnp, s.cond)
    g2, r2, ld2, lp2, c2, a2 = node_age_sweep_pallas(
        s.gen, s.params, s.seq, s.lrng, s.ctx, s.ft.coal_time, s.lnld,
        s.lnp, s.cond, tile=8, interpret=True)
    assert int(a1) == int(a2)
    np.testing.assert_allclose(np.asarray(g1.age), np.asarray(g2.age),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=0, atol=1e-9)

    m1 = update_mig_ages(s.gen, s.params, s.lrng, s.ctx, s.ft.mig_time,
                         s.lnp)
    m2 = mig_age_sweep_pallas(s.gen, s.params, s.lrng, s.ctx,
                              s.ft.mig_time, s.lnp, tile=8, interpret=True)
    assert int(m1[3]) == int(m2[3])
    np.testing.assert_allclose(np.asarray(m1[0].mig_age),
                               np.asarray(m2[0].mig_age), rtol=0,
                               atol=1e-12)

    sp1 = update_spr(s.gen, s.params, s.seq, s.lrng, s.ctx, s.lnld, s.cond)
    sp2 = spr_sweep_pallas(s.gen, s.params, s.seq, s.lrng, s.ctx, s.lnld,
                           s.cond, tile=16, interpret=True)
    assert int(sp1[4]) == int(sp2[4])
    np.testing.assert_array_equal(np.asarray(sp1[0].father),
                                  np.asarray(sp2[0].father))

    t1 = update_taus(s.gen, s.params, s.seq, s.grng, s.ctx, s.ft.taus,
                     s.lnld, s.lnp, s.cond, s.tree.num_pops,
                     s.tree.num_cur_pops)
    t2 = update_taus_fused(s.gen, s.params, s.seq, s.grng, s.ctx,
                           s.ft.taus, s.lnld, s.lnp, s.cond,
                           s.tree.num_pops, s.tree.num_cur_pops,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(t1[6]), np.asarray(t2[6]))
    np.testing.assert_allclose(np.asarray(t1[1].tau), np.asarray(t2[1].tau),
                               rtol=0, atol=1e-15)
