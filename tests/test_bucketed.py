"""Pattern-bucketed sampler: ragged loci without global max-P padding.

The reference stores exact per-locus pattern profiles
(src/AlignmentProcessor.h:25-31).  Bucketed mode (sampler/bucketed.py)
pads each bucket only to its own max pattern count; these tests assert
(a) the padded capacity actually shrinks on ragged data, (b) the chain
satisfies the checkAll-style carried-likelihood invariants, and (c) the
posterior agrees statistically with the unbucketed sampler on the same
data.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.kernels.common import gen_log_prior
from gphocs_tpu.ops.likelihood_cache import data_log_likelihood_cached
from gphocs_tpu.sampler.driver import Sampler

from tests.test_control import SAMPLE_CTL


@pytest.fixture(scope="module")
def ragged_file(tmp_path_factory):
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree

    from gphocs_tpu.rng_host import HostRng
    from gphocs_tpu.sampler.init import sample_pop_parameters

    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    path = str(tmp_path_factory.mktemp("ragged") / "seqs.txt")
    # ~10x ragged pattern counts: sequence lengths from 60 to 2000 and a
    # boosted diversity so pattern counts track locus length
    rs = np.random.RandomState(3)
    lens = rs.choice([60, 120, 300, 800, 2000], size=48,
                     p=[0.35, 0.25, 0.2, 0.12, 0.08])
    tp = sample_pop_parameters(tree, HostRng(49, 7))
    tp = tp._replace(theta=tp.theta * 40, tau=tp.tau * 40)
    simulate_seq_file(cfg, tree, path, num_loci=48, seq_len=lens, seed=13,
                      params=tp)
    return path


def _make(cfg_seed, path, buckets):
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = cfg_seed
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float64, rng_mode="fast",
                buckets=buckets)
    s.initialize()
    return s


def test_bucketed_capacity_shrinks(ragged_file):
    s1 = _make(11, ragged_file, 1)
    s4 = _make(11, ragged_file, 4)
    P_max = s1.seq.leaf_base.shape[2]
    dense_cells = s1.num_loci * P_max
    bucket_cells = sum(sq.leaf_base.shape[0] * sq.leaf_base.shape[2]
                       for sq in s4.seqs)
    # ragged 10x data: bucketed capacity must be well below dense padding
    assert bucket_cells < 0.55 * dense_cells, (bucket_cells, dense_cells)
    assert sum(s4.bucket_sizes) == s4.num_loci
    # bucket pattern capacities are increasing with the sort
    caps = [sq.leaf_base.shape[2] for sq in s4.seqs]
    assert caps == sorted(caps)


def test_bucketed_invariants_and_moves(ragged_file):
    s = _make(11, ragged_file, 3)
    st, _ = s.step_chunk(6, do_migrate=True)
    assert int(st.acc_coal_time) > 0
    assert int(st.acc_spr) > 0
    # checkAll-style gate per bucket: carried lnld/lnp equal recompute
    for k in range(len(s.gens)):
        lnld2 = data_log_likelihood_cached(s.gens[k], s.seqs[k])
        lnp2 = gen_log_prior(s.gens[k], s.params, s.ctx)
        assert float(jnp.max(jnp.abs(s.lnlds[k] - lnld2))) < 1e-7
        assert float(jnp.max(jnp.abs(s.lnps[k] - lnp2))) < 1e-6


def test_bucketed_posterior_matches_unbucketed(ragged_file):
    """Same data, same priors: bucketed and unbucketed runs must agree on
    posterior means within between-chain MC error (they are different
    valid chains on the same target, not bitwise twins)."""
    def run(buckets, seed):
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = seed
        cfg.mcmc.start_mig = 0
        cfg.mcmc.mcmc_iterations = 1500
        cfg.mcmc.burn_in = 300
        s = Sampler(cfg, seq_path=ragged_file, dtype=jnp.float64,
                    rng_mode="fast", buckets=buckets)
        cols, rows = s.run()
        return cols, rows[300:]

    chains_b = [run(3, sd)[1] for sd in (21, 22)]
    cols, r0 = run(1, 23)
    chains_u = [r0, run(1, 24)[1]]

    def mstats(chs):
        m = np.stack([c.mean(axis=0) for c in chs])
        return m.mean(axis=0), m.std(axis=0, ddof=1) / np.sqrt(len(chs))

    mb, seb = mstats(chains_b)
    mu, seu = mstats(chains_u)
    se = np.sqrt(seb**2 + seu**2) + 1e-12
    # skip the Sample counter column
    z = np.abs(mb[1:] - mu[1:]) / se[1:]
    assert np.max(z) < 6.0, (cols, z)


def test_bucketed_checkpoint_resume_bit_exact(ragged_file, tmp_path):
    """Checkpoint + resume in bucketed mode must continue bit-identically
    (round-3 gap: save_checkpoint used to serialize the stale dense gen
    and cond=None for bucketed samplers)."""
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 21
    cfg.mcmc.mcmc_iterations = 8
    cfg.mcmc.burn_in = 0
    ckpt = str(tmp_path / "b.npz")

    s1 = Sampler(cfg, seq_path=ragged_file, dtype=jnp.float64,
                 rng_mode="fast", buckets=3)
    cols1, rows1 = s1.run(checkpoint_path=ckpt, checkpoint_every=4)

    # restart from the mid-run checkpoint written at iteration 4
    import numpy as _np
    from gphocs_tpu.checkpoint import load_checkpoint, save_checkpoint

    cfg2 = parse_control_text(SAMPLE_CTL)
    cfg2.mcmc.random_seed = 21
    cfg2.mcmc.mcmc_iterations = 8
    cfg2.mcmc.burn_in = 0
    s2 = Sampler(cfg2, seq_path=ragged_file, dtype=jnp.float64,
                 rng_mode="fast", buckets=3)
    s2.initialize()
    # write a fresh checkpoint at iteration 4 by re-running the first half
    s2.step_chunk(4, do_migrate=cfg2.mcmc.start_mig < 0)
    save_checkpoint(s2, str(tmp_path / "mid.npz"), 4)

    s3 = Sampler(cfg2, seq_path=ragged_file, dtype=jnp.float64,
                 rng_mode="fast", buckets=3)
    s3.initialize()
    it = load_checkpoint(s3, str(tmp_path / "mid.npz"))
    assert it == 4
    for a, b in zip(s2.gens, s3.gens):
        for x, y in zip(a, b):
            _np.testing.assert_array_equal(_np.asarray(x), _np.asarray(y))
    # continue both; they must stay identical
    s2.step_chunk(4, do_migrate=cfg2.mcmc.start_mig < 0)
    s3.step_chunk(4, do_migrate=cfg2.mcmc.start_mig < 0)
    _np.testing.assert_array_equal(_np.asarray(s2.lnld),
                                   _np.asarray(s3.lnld))
    for a, b in zip(s2.gens, s3.gens):
        _np.testing.assert_array_equal(_np.asarray(a.age),
                                       _np.asarray(b.age))


def test_bucketed_debug_check_gate(ragged_file):
    """--debug-check must work (not silently mis-compare) in bucketed
    mode: clean run passes, corrupted carried lnld is caught."""
    from gphocs_tpu.debugcheck import check_likelihoods

    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 23
    cfg.mcmc.mcmc_iterations = 6
    cfg.mcmc.burn_in = 0
    s = Sampler(cfg, seq_path=ragged_file, dtype=jnp.float64,
                rng_mode="fast", buckets=3)
    s.run(debug_check=True)  # gate at the final log point must pass
    assert check_likelihoods(s) == []
    # corrupt one bucket's carried lnld: the gate must fire
    s.lnlds = tuple(ln + (0.5 if k == 1 else 0.0)
                    for k, ln in enumerate(s.lnlds))
    errs = check_likelihoods(s)
    assert errs and "bucket 1" in errs[0]


def test_bucketed_fused_per_bucket_gate(ragged_file):
    """Per-bucket fused gating: small-pattern buckets run the fused
    Pallas sweeps (interpret mode here) while any VMEM-oversized bucket
    falls back to the XLA path; the chain keeps its invariants."""
    import os

    from gphocs_tpu.debugcheck import check_gen_state

    os.environ["GPHOCS_FUSED_INTERPRET"] = "1"
    try:
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = 19
        cfg.mcmc.start_mig = 0
        s = Sampler(cfg, seq_path=ragged_file, dtype=jnp.float32,
                    rng_mode="fast", buckets=3)
        assert s.use_fused
        assert len(s.bucket_fused) == 3 and any(s.bucket_fused)
        s.initialize()
        s.step_chunk(2, do_migrate=True)
    finally:
        os.environ.pop("GPHOCS_FUSED_INTERPRET", None)
    for k, g in enumerate(s.gens):
        errs = check_gen_state(g, s.params, s.tree, atol=1e-5)
        assert not errs, (k, errs[:3])
    # carried vs fresh likelihoods per bucket
    for k in range(3):
        tab_lnld = data_log_likelihood_cached(s.gens[k], s.seqs[k])
        np.testing.assert_allclose(np.asarray(tab_lnld),
                                   np.asarray(s.lnlds[k]), atol=2e-3)
