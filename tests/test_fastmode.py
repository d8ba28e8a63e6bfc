"""Production (fast-RNG) mode: correctness invariants and RNG quality.

The fast path changes RNG consumption order (documented deviation), so it
cannot be golden-tested against the C streams; instead every chunk is
gated by the checkAll-style invariant (reference src/patch.c:2745-2884):
the carried data log-likelihood and genealogy log-prior must equal a
from-scratch recomputation on the current state.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gphocs_tpu import rng_fast as RF
from gphocs_tpu.config import parse_control_text
from gphocs_tpu.kernels.common import gen_log_prior
from gphocs_tpu.model import build_poptree
from gphocs_tpu.ops.likelihood_cache import data_log_likelihood_cached
from gphocs_tpu.sampler.driver import Sampler

from tests.test_control import SAMPLE_CTL


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    from gphocs_tpu.io.simulate import simulate_seq_file

    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    path = str(tmp_path_factory.mktemp("fastmode") / "seqs.txt")
    simulate_seq_file(cfg, tree, path, num_loci=40, seq_len=300, seed=7)
    return path


def test_fast_mode_invariants(data_file):
    """Run chunks in fast mode and recheck carried lnld/lnp every chunk."""
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 5
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=data_file, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    total_spr = 0
    for _ in range(3):
        st, _ = s.step_chunk(4, do_migrate=True)
        lnld2 = data_log_likelihood_cached(s.gen, s.seq)
        lnp2 = gen_log_prior(s.gen, s.params, s.ctx)
        assert float(jnp.max(jnp.abs(s.lnld - lnld2))) < 1e-7
        assert float(jnp.max(jnp.abs(s.lnp - lnp2))) < 1e-6
        total_spr += int(st.acc_spr)
    assert total_spr > 0  # the chain is actually moving


def test_fast_rng_uniform_moments():
    st = RF.init_fast(4096, 123)
    u, st = RF.rndu(st, None)
    vals = [np.asarray(u)]
    for _ in range(15):
        u, st = RF.rndu(st, None)
        vals.append(np.asarray(u))
    x = np.concatenate(vals)
    assert abs(x.mean() - 0.5) < 0.005
    assert abs(x.var() - 1.0 / 12.0) < 0.002
    # lag-1 serial correlation within a lane across counters
    lanes = np.stack(vals)          # [16, 4096]
    a, b = lanes[:-1].ravel(), lanes[1:].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.01
    # cross-lane correlation at the same counter
    corr2 = np.corrcoef(lanes[:, :-1].ravel(), lanes[:, 1:].ravel())[0, 1]
    assert abs(corr2) < 0.01


def test_fast_rng_normal_moments():
    st = RF.init_fast(8192, 7)
    n, st = RF.rndnormal(st, None)
    x = np.asarray(n)
    assert abs(x.mean()) < 0.05
    assert abs(x.var() - 1.0) < 0.05
    # mixture kernel: mean 0, variance 1 (m^2 + s^2 = 1)
    z, st = RF.rnd2normal8(st, None)
    z = np.asarray(z)
    assert abs(z.mean()) < 0.05
    assert abs((z ** 2).mean() - 1.0) < 0.05
    # bimodal: essentially no mass near 0 (|m| = 0.943, s = 0.333)
    assert (np.abs(z) < 0.05).mean() < 0.02


def test_fast_batch_draws_match_stream():
    """batch_u/batch_2normal8 must consume the same counters as repeated
    single draws from the general stream."""
    st = RF.init_fast(1, 99)
    batch, st2 = RF.batch_u(st, 5)
    singles = []
    s = st
    for _ in range(5):
        u, s = RF.rndu(s, None)
        singles.append(float(u[0]))
    np.testing.assert_allclose(np.asarray(batch), singles, rtol=1e-12)
    assert int(st2.ctr) == int(s.ctr)


def test_fast_mode_with_mesh(data_file):
    """Fast RNG + loci mesh: the scalar draw counter must replicate while
    per-locus keys shard (regression: device_put of the rank-0 counter
    with a loci PartitionSpec)."""
    import jax
    from gphocs_tpu.parallel.mesh import make_mesh

    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 5
    cfg.mcmc.start_mig = 0
    mesh = make_mesh(jax.devices())
    s = Sampler(cfg, seq_path=data_file, dtype=jnp.float64,
                rng_mode="fast", mesh=mesh)
    s.initialize()
    st, _ = s.step_chunk(2, do_migrate=True)
    lnld2 = data_log_likelihood_cached(s.gen, s.seq)
    assert float(jnp.max(jnp.abs(s.lnld - lnld2))) < 1e-7


def test_f32_long_run_structural_invariants(data_file):
    """Regression gate for the round-3 GOLDEN_FUSED f32 bias: the SPR
    hazard inversion used prev_cum = cum_k - hz_k, which cancels
    catastrophically in f32 on the huge [root age, OLDAGE] segment and
    committed coalescences BELOW the segment (nodes outside their pop
    window, eventually cyclic topologies).  400 f32 iterations of the
    production update schedule must keep every structural invariant and
    an acyclic father map.  (The f32 XLA path is the bitwise-tested twin
    of the fused TPU kernels, so this gates the production path.)"""
    from gphocs_tpu.debugcheck import check_gen_state

    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 4242
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=data_file, dtype=jnp.float32, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()
    for _ in range(4):
        s.step_chunk(100, do_migrate=True)
        # f32-scaled tolerance: ulp-level window rounding is fine, the
        # bug-class violations were 1e-5-scale
        errs = check_gen_state(s.gen, s.params, s.tree, atol=1e-6)
        assert not errs, errs[:5]
        fa = np.asarray(s.gen.father)
        L, N = fa.shape
        # acyclicity: N father-hops from any node must reach the root
        cur = np.arange(N)[None, :].repeat(L, 0)
        for _h in range(N):
            cur = np.where(cur >= 0, fa[np.arange(L)[:, None],
                                        np.maximum(cur, 0)], cur)
        assert (cur < 0).all(), "father map contains a cycle"
        # carried likelihoods stay consistent at f32 tolerance
        lnld2 = data_log_likelihood_cached(s.gen, s.seq)
        lnp2 = gen_log_prior(s.gen, s.params, s.ctx)
        assert float(jnp.max(jnp.abs(s.lnld - lnld2))) < 5e-3
        assert float(jnp.max(jnp.abs(s.lnp - lnp2))) < 5e-2
