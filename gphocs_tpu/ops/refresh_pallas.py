"""Pallas TPU kernel: fused dirty-path conditional refresh + root reduce.

The XLA dirty-frontier refresh (ops/likelihood_cache.py) costs ~0.6 ms per
proposal step at sampler scale — ~7 us/op of dispatch-depth across ~15 ops
per while-trip, times the path length.  This kernel runs the whole frontier
loop inside one pallas_call with everything resident in VMEM, so each trip
is a handful of VPU vector ops instead of a round of XLA op launches.

Layout: loci ride the SUBLANE axis (tile TL rows); the flattened
(node, pattern*4) component axis rides LANES, padded so each node's block
is PW = pad4(P*4) lanes.  Per-locus dynamic node indexing becomes a
one-hot masked accumulation over the N static node blocks — no gathers.

Semantics identical to likelihood_cache.refresh + lnld_from_cond
(JC edge probability (1-exp(-4 mu dt/3))/4, reference
src/LocusDataLikelihood.c:1831-1848; dirty-flag reuse :875-930; root
base/phase averaging :471-479).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(age_ref, mut_ref, lson_ref, rson_ref, father_ref, root_ref,
            dirty_ref, pvalid_ref, gid_ref, gcount_ref, gnph_ref,
            cond_in_ref, cond_out_ref, lnld_ref, *, N, P, PW, S):
    """One loci tile.  Shapes (TL = tile loci):
    age/lson/rson/father [TL, N]; mut/root [TL, 1]; dirty [TL, N] (int32);
    pvalid/gid/gcount/gnph [TL, P]; cond [TL, N*PW]; lnld out [TL, 1]."""
    TL = age_ref.shape[0]
    age = age_ref[:]
    mut = mut_ref[:]                       # [TL, 1]
    lson = lson_ref[:]
    rson = rson_ref[:]
    father = father_ref[:]
    cond_out_ref[:] = cond_in_ref[:]       # working buffer (in-place)
    # dirty carried as int32: Mosaic cannot legalize i1 vectors as
    # while-loop carries (vpad layout on scf.yield)
    dirty0 = dirty_ref[:]                  # [TL, N] int32

    nid = lax.broadcasted_iota(jnp.int32, (TL, N), 1)
    internal = nid >= S
    dirty0 = jnp.where(internal, dirty0, 0)

    def gather_node(idx, arr):
        """arr[l, idx[l]] -> [TL, 1] via one-hot reduce.  idx: [TL, N] col?"""
        return jnp.sum(jnp.where(nid == idx, arr, 0.0), axis=1,
                       keepdims=True)

    def son_block(son_idx):
        """[TL, PW] conditionals of per-locus node son_idx[l] ([TL, 1]),
        read from the working buffer."""
        acc = jnp.zeros((TL, PW), cond_out_ref.dtype)
        for s_node in range(N):
            m = (son_idx == s_node)        # [TL, 1]
            acc = acc + jnp.where(
                m, cond_out_ref[:, s_node * PW:(s_node + 1) * PW], 0.0)
        return acc

    group4 = lax.broadcasted_iota(jnp.int32, (1, PW), 1) // 4  # 4-wide ids
    valid4 = lax.broadcasted_iota(jnp.int32, (1, PW), 1) < P * 4

    def sum4(x):
        """Per-4-lane-group sums of [TL, PW] (the JC base sum)."""
        acc = jnp.zeros_like(x)
        for p_ in range(P):
            m = (group4 == p_) & valid4
            s = jnp.sum(jnp.where(m, x, 0.0), axis=1, keepdims=True)
            acc = acc + jnp.where(m, s, 0.0)
        return acc

    def edge_p(length):
        p = (1.0 - jnp.exp(-4.0 * length / 3.0)) / 4.0
        return jnp.where(length < 1e-30, 0.0, p)

    def body(state):
        dirty_i, it = state
        dirty = dirty_i > 0
        ls_d = jnp.zeros((TL, N), jnp.bool_)
        rs_d = jnp.zeros((TL, N), jnp.bool_)
        for s_node in range(S, N):
            dcol = dirty[:, s_node:s_node + 1]
            ls_d = ls_d | ((lson == s_node) & dcol)
            rs_d = rs_d | ((rson == s_node) & dcol)
        ready = dirty & ~(ls_d | rs_d)

        # in-place block updates: a ready node's sons are clean this trip,
        # so their blocks are not written concurrently
        for v in range(S, N):
            rv = ready[:, v:v + 1]
            ls_v = lson[:, v:v + 1]
            rs_v = rson[:, v:v + 1]
            tv = age[:, v:v + 1]
            ca = son_block(ls_v)
            cb = son_block(rs_v)
            pa = edge_p(mut * (tv - gather_node(ls_v, age)))
            pb = edge_p(mut * (tv - gather_node(rs_v, age)))
            fa = pa * sum4(ca) + (1.0 - 4.0 * pa) * ca
            fb = pb * sum4(cb) + (1.0 - 4.0 * pb) * cb
            blk = cond_out_ref[:, v * PW:(v + 1) * PW]
            cond_out_ref[:, v * PW:(v + 1) * PW] = jnp.where(
                rv, fa * fb, blk)

        # father of each ready node becomes dirty
        fd = jnp.zeros((TL, N), jnp.bool_)
        for v in range(S, N):
            rv = ready[:, v:v + 1]
            fv = father[:, v:v + 1]
            fd = fd | ((nid == fv) & rv)
        dirty = (dirty & ~ready) | (fd & internal)
        return dirty.astype(jnp.int32), it + 1

    def cond_fn(state):
        dirty_i, it = state
        return (jnp.max(dirty_i) > 0) & (it < 2 * N)

    lax.while_loop(cond_fn, body, (dirty0, jnp.zeros((), jnp.int32)))

    # ---- root reduce: lnld ----
    root = root_ref[:]                      # [TL, 1]
    root_c = son_block(root)                # [TL, PW]
    # per-pattern base sums: [TL, P] laid out on the first P lanes
    lane = lax.broadcasted_iota(jnp.int32, (1, PW), 1)
    pv = pvalid_ref[:]                      # [TL, P] (float 0/1)
    gid = gid_ref[:]                        # [TL, P] int32
    gcount = gcount_ref[:]
    gnph = gnph_ref[:]
    pat = jnp.zeros((TL, P), root_c.dtype)
    for p_ in range(P):
        s = jnp.sum(jnp.where((lane >= 4 * p_) & (lane < 4 * p_ + 4),
                              root_c, 0.0), axis=1, keepdims=True)
        pat = pat + jnp.where(
            lax.broadcasted_iota(jnp.int32, (TL, P), 1) == p_, s, 0.0)
    pat = pat * pv
    # group segment sums
    gsum = jnp.zeros((TL, P), root_c.dtype)
    pcol = lax.broadcasted_iota(jnp.int32, (TL, P), 1)
    for g_ in range(P):
        s = jnp.sum(jnp.where(gid == g_, pat, 0.0), axis=1, keepdims=True)
        gsum = gsum + jnp.where(pcol == g_, s, 0.0)
    safe = jnp.where(gcount > 0, gsum, 1.0)
    lnl = jnp.sum(gcount * (jnp.log(safe) - jnp.log(4.0 * gnph)),
                  axis=1, keepdims=True)
    lnld_ref[:] = lnl


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def refresh_lnld_pallas(cond, gen, seq, dirty0, interpret: bool = False):
    """Fused twin of likelihood_cache.refresh + lnld_from_cond.

    cond: [L, N, P, 4] float32.  dirty0: [L, N] bool (or [N]).
    Returns (cond' [L, N, P, 4], lnld [L]).  TPU fast path (f32).
    """
    L, N, P, _ = cond.shape
    S = (N + 1) // 2
    PW = _round_up(P * 4, 8)
    dt = jnp.float32

    # component-flattened, lane-padded conditionals
    c = cond.astype(dt)
    if PW != P * 4:
        c = jnp.pad(c.reshape(L, N, P * 4),
                    ((0, 0), (0, 0), (0, PW - P * 4)))
    c = c.reshape(L, N * PW)

    TL = 256
    target_bytes = 6 * 1024 * 1024
    while TL > 8 and TL * N * PW * 4 * 2 > target_bytes:
        TL //= 2
    padL = (-L) % TL
    Lp = L + padL

    def padl(x, fill=0):
        if padL == 0:
            return x
        cfg = [(0, padL)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    age = padl(gen.age.astype(dt))
    mut = padl(gen.mut_rate.astype(dt)).reshape(Lp, 1)
    lson = padl(gen.lson.astype(jnp.int32))
    rson = padl(gen.rson.astype(jnp.int32))
    father = padl(gen.father.astype(jnp.int32))
    root = padl(gen.root.astype(jnp.int32)).reshape(Lp, 1)
    dirty = jnp.broadcast_to(dirty0, (L, N))
    dirty = padl(dirty.astype(jnp.int32))
    pvalid = padl(seq.pattern_valid.astype(dt))
    gid = padl(seq.group_id.astype(jnp.int32))
    gcount = padl(seq.group_count.astype(dt))
    gnph = padl(seq.group_nphases.astype(dt), fill=1)
    c = padl(c)

    grid = (Lp // TL,)
    vspec = lambda w: pl.BlockSpec((TL, w), lambda i: (i, 0),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    cond_out, lnld = pl.pallas_call(
        functools.partial(_kernel, N=N, P=P, PW=PW, S=S),
        grid=grid,
        in_specs=[vspec(N), vspec(1), vspec(N), vspec(N), vspec(N),
                  vspec(1), vspec(N), vspec(P), vspec(P), vspec(P),
                  vspec(P), vspec(N * PW)],
        out_specs=(vspec(N * PW), vspec(1)),
        out_shape=(jax.ShapeDtypeStruct((Lp, N * PW), dt),
                   jax.ShapeDtypeStruct((Lp, 1), dt)),
        interpret=interpret,
    )(age, mut, lson, rson, father, root, dirty, pvalid, gid, gcount,
      gnph, c)

    out = cond_out[:L].reshape(L, N, PW)[:, :, :P * 4].reshape(L, N, P, 4)
    return out.astype(cond.dtype), lnld[:L, 0].astype(gen.age.dtype)
