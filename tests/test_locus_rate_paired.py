"""Paired (vectorized) vs serial UpdateLocusRate: same target distribution.

The production kernel proposes within random disjoint pairs (one vector
step per iteration); the conformance kernel couples every locus to
reference locus 0 sequentially (reference src/GPhoCS.c:4598-4674).  Both
preserve sum(rates) = L exactly and target the same posterior, so their
long-run rate marginals must agree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler
from gphocs_tpu.kernels.locus_rate import (update_locus_rates,
                                           update_locus_rates_paired)
from gphocs_tpu.ops.likelihood_cache import (data_log_likelihood_cached,
                                             full_build)

from tests.test_control import SAMPLE_CTL


@pytest.fixture(scope="module")
def var_sampler(tmp_path_factory):
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree

    base = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(base)
    path = str(tmp_path_factory.mktemp("lrp") / "seqs.txt")
    simulate_seq_file(base, tree, path, num_loci=16, seq_len=400, seed=23)
    txt = SAMPLE_CTL.replace(
        "locus-mut-rate          CONST",
        "locus-mut-rate          VAR 1.0\n\tfinetune-locus-rate 0.4")
    cfg = parse_control_text(txt)
    cfg.mcmc.random_seed = 9
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    return s


def _run_kernel(s, paired: bool, iters: int):
    gen, lnld, cond, rng = s.gen, s.lnld, s.cond, s.lrng
    ft = s.ft.locus_rate
    rates = []

    if paired:
        def step(carry, _):
            gen, rng, lnld, cond = carry
            gen, rng, lnld, cond, a, dv = update_locus_rates_paired(
                gen, s.seq, rng, ft, lnld, 1.0, cond)
            return (gen, rng, lnld, cond), gen.mut_rate
    else:
        def step(carry, _):
            gen, rng, lnld, cond = carry
            gen, rng, lnld, a, dv = update_locus_rates(
                gen, s.seq, rng, ft, lnld, 1.0)
            cond = full_build(gen, s.seq)
            return (gen, rng, lnld, cond), gen.mut_rate

    (gen, rng, lnld, cond), rs = jax.jit(
        lambda c: jax.lax.scan(step, c, None, length=iters))(
            (gen, rng, lnld, cond))
    # invariants: rate-sum conservation and carried-lnld consistency
    np.testing.assert_allclose(float(jnp.sum(gen.mut_rate)),
                               gen.num_loci, rtol=1e-9)
    lnld2 = data_log_likelihood_cached(gen, s.seq)
    assert float(jnp.max(jnp.abs(lnld - lnld2))) < 1e-7
    return np.asarray(rs)


def test_paired_matches_serial_marginals(var_sampler):
    s = var_sampler
    iters = 1200
    rs_pair = _run_kernel(s, True, iters)[200:]
    rs_serial = _run_kernel(s, False, iters)[200:]

    # both kernels move
    assert np.std(rs_pair, axis=0).mean() > 0.01
    assert np.std(rs_serial, axis=0).mean() > 0.01

    # per-locus marginal means agree within between-batch MC error
    def batch_se(x):  # [T, L]
        bm = np.array([b.mean(axis=0) for b in np.array_split(x, 6)])
        return bm.std(axis=0, ddof=1) / np.sqrt(len(bm))

    m1, m2 = rs_pair.mean(axis=0), rs_serial.mean(axis=0)
    se = np.sqrt(batch_se(rs_pair) ** 2 + batch_se(rs_serial) ** 2) + 1e-12
    z = np.abs(m1 - m2) / se
    assert np.max(z) < 5.0, (np.max(z), m1, m2)
    # pooled dispersion of rates agrees within 25%
    sd1 = rs_pair.std()
    sd2 = rs_serial.std()
    assert abs(sd1 - sd2) / max(sd2, 1e-9) < 0.25, (sd1, sd2)
