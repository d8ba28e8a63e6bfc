"""Carried-conditionals cache: full build, incremental refresh and root
reduction must agree with the scan pruning (ops/pruning.py) exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.model import build_poptree
from gphocs_tpu.ops.likelihood_cache import (
    data_log_likelihood_cached,
    full_build,
    lnld_from_cond,
    make_tables,
    refresh,
)
from gphocs_tpu.ops.pruning import data_log_likelihood
from gphocs_tpu.rng_host import HostRng
from gphocs_tpu.sampler.init import init_gen_state, sample_pop_parameters
from gphocs_tpu.state import GenState, SeqData

from tests.test_control import SAMPLE_CTL
from tests.test_ops import _random_seqdata

L = 12


@pytest.fixture(scope="module")
def setup():
    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    rng = HostRng(L + 1, 1234)
    params = sample_pop_parameters(tree, rng)
    gen = init_gen_state(tree, params, rng, L, np.ones(L))
    seq = _random_seqdata(gen, seed=17)
    jgen = GenState(*[jnp.asarray(x) for x in gen])
    jseq = SeqData(*[jnp.asarray(x) for x in seq])
    return jgen, jseq


def test_full_build_matches_scan_pruning(setup):
    gen, seq = setup
    a = data_log_likelihood(gen, seq)
    b = data_log_likelihood_cached(gen, seq)
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-12)


def test_refresh_after_age_move(setup):
    gen, seq = setup
    cond = full_build(gen, seq)
    S = gen.num_samples
    N = gen.num_nodes
    rs = np.random.RandomState(0)
    for inode in (S, S + 2, N - 1):
        # nudge the node age without violating order constraints
        age = np.array(gen.age)
        fa = np.array(gen.father)
        for l in range(L):
            hi = age[l, fa[l, inode]] if fa[l, inode] >= 0 \
                else age[l, inode] + 1.0
            lo = max(float(age[l, np.array(gen.lson)[l, inode]]),
                     float(age[l, np.array(gen.rson)[l, inode]]))
            age[l, inode] = lo + (hi - lo) * rs.uniform(0.05, 0.95)
        gen2 = gen._replace(age=jnp.asarray(age))
        dirty0 = jnp.zeros((N,), bool).at[inode].set(True)
        cond2 = refresh(cond, gen2, seq, dirty0)
        expect = full_build(gen2, seq)
        np.testing.assert_allclose(np.array(cond2), np.array(expect),
                                   rtol=1e-12)
        np.testing.assert_allclose(
            np.array(lnld_from_cond(cond2, gen2, seq)),
            np.array(data_log_likelihood(gen2, seq)), rtol=1e-12)


def test_refresh_after_topology_change(setup):
    """An SPR-style rewire: refresh with the changed nodes marked dirty
    must reproduce a from-scratch build on the new topology."""
    gen, seq = setup
    cond = full_build(gen, seq)
    N = gen.num_nodes
    fa = np.array(gen.father)
    ls = np.array(gen.lson)
    rs_ = np.array(gen.rson)
    age = np.array(gen.age)
    root = np.array(gen.root)
    dirty = np.zeros((L, N), bool)
    moved = 0
    for l in range(L):
        # swap the two sons of the root's children where both are internal:
        # regraft root.lson's left child onto root.rson's edge
        r = int(root[l])
        a, b = int(ls[l, r]), int(rs_[l, r])
        S = gen.num_samples
        if a < S or b < S:
            continue
        u = int(ls[l, a])
        if age[l, u] >= age[l, b]:
            continue
        # detach u from a, attach under b: a keeps only rson; create the
        # simplest valid rewire: swap u with b's lson if order permits
        v = int(ls[l, b])
        if age[l, v] >= age[l, a]:
            continue
        ls[l, a], ls[l, b] = v, u
        fa[l, u], fa[l, v] = b, a
        dirty[l, [a, b]] = True
        moved += 1
    assert moved > 0
    gen2 = gen._replace(father=jnp.asarray(fa), lson=jnp.asarray(ls),
                        rson=jnp.asarray(rs_))
    cond2 = refresh(cond, gen2, seq, jnp.asarray(dirty))
    expect = full_build(gen2, seq)
    np.testing.assert_allclose(np.array(cond2), np.array(expect), rtol=1e-12)


def test_refresh_noop_when_clean(setup):
    gen, seq = setup
    cond = full_build(gen, seq)
    out = refresh(cond, gen, seq, jnp.zeros((gen.num_nodes,), bool))
    np.testing.assert_array_equal(np.array(out), np.array(cond))


def test_tables_reusable(setup):
    gen, seq = setup
    tb = make_tables(gen)
    a = full_build(gen, seq, tb)
    b = full_build(gen, seq)
    np.testing.assert_array_equal(np.array(a), np.array(b))
