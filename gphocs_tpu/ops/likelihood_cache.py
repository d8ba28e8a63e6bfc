"""Carried pruning conditionals with incremental (dirty-path) refresh.

The reference keeps per-node conditional-probability arrays inside each
LocusData and recomputes only *dirty* nodes per proposal
(src/LocusDataLikelihood.c:426-520 reuse path; dirty marking in
adjustGenNodeAge :875-930, computeConditionalJC_new :1559).  Round-1 of
this rebuild recomputed the full pruning recursion per proposal, which made
the TPU dispatch-bound (a full [L, N, P, 4] scan per node per sweep).

This module is the tensor twin of the reference's dirty-flag machinery:

  * the conditionals live in a carried tensor `cond` [L, N, P, 4] that
    flows through the MH sweeps;
  * a proposal marks the directly-touched nodes dirty; `refresh` then
    recomputes bottom-up along the dirty *frontier* only — fathers of
    recomputed nodes become dirty, so ancestor paths are discovered on the
    fly and the while-loop runs max-path-length trips instead of a full
    recursion;
  * all per-locus topology indexing is expressed as one-hot einsum
    contractions ([L,N,N] selection matrices), never gather/scatter —
    measured 3-7x faster per step on TPU v5e at sampler-scale shapes.

The math is identical to ops/pruning.py (JC edge probability
(1 - exp(-4 mu dt / 3)) / 4, reference src/LocusDataLikelihood.c:1831-1848;
root sum over 4 bases and phase groups :471-479).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from gphocs_tpu.state import GenState, SeqData
from gphocs_tpu.ops.pruning import _edge_p, leaf_conditionals


class TopoTables(NamedTuple):
    """One-hot topology selection matrices (valid until topology changes)."""

    sel_l: jnp.ndarray   # [L, N, N] one-hot of lson (zero row for leaves)
    sel_r: jnp.ndarray   # [L, N, N] one-hot of rson
    fa_oh: jnp.ndarray   # [L, N, N] one-hot of father (zero row for root)


def make_tables(gen: GenState, dtype=None) -> TopoTables:
    dt = dtype or gen.age.dtype
    nid = jnp.arange(gen.num_nodes, dtype=jnp.int32)
    sel_l = (gen.lson[:, :, None] == nid[None, None, :]).astype(dt)
    sel_r = (gen.rson[:, :, None] == nid[None, None, :]).astype(dt)
    fa_oh = (gen.father[:, :, None] == nid[None, None, :]).astype(dt)
    return TopoTables(sel_l=sel_l, sel_r=sel_r, fa_oh=fa_oh)


def _edge_factors(gen: GenState, tb: TopoTables):
    """Per-node JC substitution probabilities toward each son: [L, N] x2."""
    age_l = jnp.einsum("lnm,lm->ln", tb.sel_l, gen.age)
    age_r = jnp.einsum("lnm,lm->ln", tb.sel_r, gen.age)
    mu = gen.mut_rate[:, None]
    pl = _edge_p(mu * (gen.age - age_l)).astype(gen.age.dtype)
    pr = _edge_p(mu * (gen.age - age_r)).astype(gen.age.dtype)
    return pl, pr


def _combine(cond: jnp.ndarray, tb: TopoTables, pl, pr):
    """New conditionals for ALL nodes from current son conditionals.

    cond: [L, N, P, 4].  Returns [L, N, P, 4] (garbage on leaf rows —
    callers mask).  One batched-matmul gather per son side.
    """
    L, N, P, _ = cond.shape
    c2 = cond.reshape(L, N, P * 4)
    ca = jnp.einsum("lnm,lmq->lnq", tb.sel_l, c2).reshape(L, N, P, 4)
    cb = jnp.einsum("lnm,lmq->lnq", tb.sel_r, c2).reshape(L, N, P, 4)
    a = pl[:, :, None, None]
    b = pr[:, :, None, None]
    fa = a * jnp.sum(ca, -1, keepdims=True) + (1.0 - 4.0 * a) * ca
    fb = b * jnp.sum(cb, -1, keepdims=True) + (1.0 - 4.0 * b) * cb
    # x4 Felsenstein rescale per internal node (see ops/pruning.py):
    # stored conditionals are 4^(subtree internal count) x true
    return 4.0 * fa * fb


def full_build(gen: GenState, seq: SeqData,
               tables: TopoTables | None = None) -> jnp.ndarray:
    """Conditionals for all nodes by Jacobi iteration: trip k finalizes all
    nodes of subtree height <= k, so S-1 trips converge for any topology.
    Each trip is one fused batched-einsum update (no per-locus indexing)."""
    L, N = gen.father.shape
    S = (N + 1) // 2
    dt = gen.age.dtype
    tb = tables if tables is not None else make_tables(gen)
    pl, pr = _edge_factors(gen, tb)
    leaf = leaf_conditionals(seq.leaf_base, dt)
    cond = jnp.zeros((L, N) + leaf.shape[2:], dt).at[:, :S].set(leaf)
    internal = (jnp.arange(N) >= S)[None, :, None, None]

    def trip(_, cond):
        return jnp.where(internal, _combine(cond, tb, pl, pr), cond)

    return lax.fori_loop(0, S - 1, trip, cond)


def refresh(cond: jnp.ndarray, gen: GenState, seq: SeqData,
            dirty0: jnp.ndarray, tables: TopoTables | None = None
            ) -> jnp.ndarray:
    """Recompute `cond` for the dirty nodes and (transitively) their
    ancestors, bottom-up along the dirty frontier.

    dirty0: [L, N] bool (or [N], broadcast) — the directly-touched nodes.
    Ancestors are discovered on the fly: recomputing a node marks its
    father dirty (the tensor twin of the reference's dirty-flag
    propagation, src/LocusDataLikelihood.c:875-930).
    """
    L, N = gen.father.shape
    S = (N + 1) // 2
    tb = tables if tables is not None else make_tables(gen)
    pl, pr = _edge_factors(gen, tb)
    internal = (jnp.arange(N) >= S)[None, :]
    dirty = jnp.broadcast_to(dirty0, (L, N)) & internal

    def cond_fn(st):
        dirty, _, it = st
        # multiple dirty seeds (e.g. SPR marks f, g, target's father) can
        # legitimately recompute a shared ancestor more than once as the
        # waves merge, so the safety cap must exceed one tree height
        return jnp.any(dirty) & (it < 2 * N)

    def body(st):
        dirty, cond, it = st
        df = dirty.astype(cond.dtype)
        sons_dirty = (jnp.einsum("lnm,lm->ln", tb.sel_l, df)
                      + jnp.einsum("lnm,lm->ln", tb.sel_r, df)) > 0.5
        ready = dirty & ~sons_dirty
        new = _combine(cond, tb, pl, pr)
        cond = jnp.where(ready[:, :, None, None], new, cond)
        rf = ready.astype(cond.dtype)
        father_dirty = jnp.einsum("ln,lnm->lm", rf, tb.fa_oh) > 0.5
        dirty = (dirty & ~ready) | (father_dirty & internal)
        return dirty, cond, it + 1

    _, cond, _ = lax.while_loop(
        cond_fn, body, (dirty, cond, jnp.zeros((), jnp.int32)))
    return cond


def lnld_from_cond(cond: jnp.ndarray, gen: GenState, seq: SeqData
                   ) -> jnp.ndarray:
    """Per-locus data log-likelihood from root conditionals.

    Averages over the 4 root bases AND all phasings of each het-pattern
    group (reference src/LocusDataLikelihood.c:471-479), weighted by site
    counts.  Group reduction is a one-hot matmul (no segment scatter).
    """
    L, N, P, _ = cond.shape
    dt = cond.dtype
    root_oh = (jnp.arange(N, dtype=jnp.int32)[None, :]
               == gen.root[:, None]).astype(dt)
    root_c = jnp.einsum("ln,lnq->lq", root_oh,
                        cond.reshape(L, N, P * 4)).reshape(L, P, 4)
    root_sum = jnp.sum(root_c, axis=-1)
    root_sum = jnp.where(seq.pattern_valid, root_sum, 0.0)
    goh = (seq.group_id[:, :, None]
           == jnp.arange(P, dtype=seq.group_id.dtype)[None, None, :]
           ).astype(dt)
    seg = jnp.einsum("lpg,lp->lg", goh, root_sum)
    safe = jnp.where(seq.group_count > 0, seg, 1.0)
    S = (N + 1) // 2
    return jnp.sum(
        seq.group_count * (jnp.log(safe) - jnp.log(4.0 * seq.group_nphases)
                           - (S - 1) * jnp.log(jnp.asarray(4.0, dt))),
        axis=1)


def data_log_likelihood_cached(gen: GenState, seq: SeqData) -> jnp.ndarray:
    """One-shot twin of ops.pruning.data_log_likelihood (build + reduce)."""
    return lnld_from_cond(full_build(gen, seq), gen, seq)


def full_rebuild_and_lnld(gen: GenState, seq: SeqData,
                          tables: TopoTables | None = None):
    """Leaf init + full bottom-up rebuild (+ root reduce)."""
    cond = full_build(gen, seq, tables)
    return cond, lnld_from_cond(cond, gen, seq)


def refresh_and_lnld(cond, gen: GenState, seq: SeqData, dirty0,
                     tables: TopoTables | None = None):
    """Dirty refresh + root reduce (XLA path; the TPU production path is
    the fused whole-sweep kernels in ops/sweeps_pallas.py).

    The one-hot einsum selections REQUIRE full matmul precision (set
    package-wide in gphocs_tpu/__init__.py) — the TPU default rounds the
    conditionals through bfloat16 (measured ~2e-3 absolute error, vs
    ~1e-7 for exact-f32 selection).
    """
    cond = refresh(cond, gen, seq, dirty0, tables)
    return cond, lnld_from_cond(cond, gen, seq)
