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
