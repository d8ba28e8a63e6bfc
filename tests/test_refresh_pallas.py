"""Fused Pallas refresh kernel vs the XLA dirty-frontier refresh.

Interpret mode runs everywhere (CI is CPU); the compiled-mode test runs
when a real TPU is visible (the kernel was verified on v5e: compiled ==
interpret bit-for-bit, and == XLA to f32 rounding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.model import build_poptree
from gphocs_tpu.ops.likelihood_cache import (
    full_build,
    lnld_from_cond,
    refresh,
)
from gphocs_tpu.ops.refresh_pallas import refresh_lnld_pallas
from gphocs_tpu.rng_host import HostRng
from gphocs_tpu.sampler.init import init_gen_state, sample_pop_parameters
from gphocs_tpu.state import GenState, SeqData

from tests.test_control import SAMPLE_CTL
from tests.test_ops import _random_seqdata

L = 24


@pytest.fixture(scope="module")
def setup():
    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    rng = HostRng(L + 1, 1234)
    params = sample_pop_parameters(tree, rng)
    gen_np = init_gen_state(tree, params, rng, L, np.ones(L),
                            dtype=np.float32)
    gen = GenState(*[jnp.asarray(x) for x in gen_np])
    gen = gen._replace(age=gen.age.astype(jnp.float32),
                       mig_age=gen.mig_age.astype(jnp.float32),
                       mut_rate=gen.mut_rate.astype(jnp.float32))
    seq_np = _random_seqdata(gen, seed=17)
    seq = SeqData(*[
        jnp.asarray(np.asarray(x, np.float32)
                    if getattr(x, "dtype", None) == np.float64 else x)
        for x in seq_np])
    cond = full_build(gen, seq)
    # move one internal node's age within its legal range and mark dirty
    S = gen.num_samples
    inode = S + 1
    age = np.array(gen.age)
    fa = np.array(gen_np.father)
    for l in range(L):
        hi = age[l, fa[l, inode]] if fa[l, inode] >= 0 \
            else age[l, inode] + 1.0
        lo = max(float(age[l, np.array(gen_np.lson)[l, inode]]),
                 float(age[l, np.array(gen_np.rson)[l, inode]]))
        age[l, inode] = lo + (hi - lo) * 0.37
    gen2 = gen._replace(age=jnp.asarray(age, jnp.float32))
    dirty0 = jnp.zeros((gen.num_nodes,), bool).at[inode].set(True)
    return gen2, seq, cond, dirty0


def _xla(cond, gen, seq, dirty0):
    c2 = refresh(cond, gen, seq, dirty0)
    return c2, lnld_from_cond(c2, gen, seq)


def test_interpret_matches_xla(setup):
    gen, seq, cond, dirty0 = setup
    want_c, want_l = _xla(cond, gen, seq, dirty0)
    got_c, got_l = refresh_lnld_pallas(cond, gen, seq, dirty0,
                                       interpret=True)
    np.testing.assert_allclose(np.array(got_c), np.array(want_c),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.array(got_l), np.array(want_l),
        rtol=2e-6, atol=2e-3)  # f32 log-accumulation order


def test_full_rebuild_via_all_dirty(setup):
    """All-internal dirty must reproduce a from-scratch build."""
    gen, seq, cond, _ = setup
    from gphocs_tpu.ops.pruning import leaf_conditionals

    N = gen.num_nodes
    S = gen.num_samples
    leaf = leaf_conditionals(seq.leaf_base, jnp.float32)
    cond0 = jnp.zeros(cond.shape, jnp.float32).at[:, :S].set(leaf)
    got_c, got_l = refresh_lnld_pallas(cond0, gen, seq,
                                       jnp.ones((N,), bool),
                                       interpret=True)
    want_c = full_build(gen, seq)
    np.testing.assert_allclose(np.array(got_c), np.array(want_c),
                               atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-mode check requires a TPU")
def test_compiled_matches_interpret(setup):
    gen, seq, cond, dirty0 = setup
    ic, il = refresh_lnld_pallas(cond, gen, seq, dirty0, interpret=True)
    cc, cl = refresh_lnld_pallas(cond, gen, seq, dirty0)
    np.testing.assert_allclose(np.array(cc), np.array(ic), atol=1e-6)
    np.testing.assert_allclose(np.array(cl), np.array(il), atol=1e-3)
