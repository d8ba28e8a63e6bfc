"""Whole-sweep VMEM-resident Pallas TPU kernels for the hot MH sweeps.

Round-2 analysis (docs/DESIGN.md): the per-iteration cost of the XLA
sweeps is dominated by HBM traffic + op-launch depth — every node step of
the node-age / SPR sweeps re-streams multiple full [L, ...] tensors.  The
reference's economics are O(dirty path) per proposal on L1-resident state
(src/GPhoCS.c:2287-2428 sweep body; src/LocusDataLikelihood.c:426-520
conditional reuse).  These kernels are the TPU twin of that memory
behavior: ONE pallas_call runs the ENTIRE sweep with conditionals, ages,
topology and RNG resident in VMEM, so per-sweep HBM traffic collapses to
a single read + write of the state.

Layout: loci ride the LANE axis (tiles of TL lanes); per-locus structure
(nodes, patterns x 4 bases) rides sublanes.  Pruning conditionals are
[N * CPWP, L] with node-major blocks of CPWP = pad8(4 * P) rows.  Every
per-locus dynamic node index is resolved by one-hot masked reductions over
the static node axis — no gathers.

Semantics: identical to kernels/node_age.update_internal_node_ages in
fast-RNG mode (gphocs_tpu/rng_fast.py counter streams; consumption order
4 draws per node step), with the closed-form genealogy-prior delta of
ops/coalstats.node_age_move_delta and the dirty-path conditional refresh
of ops/likelihood_cache.refresh.  Reference twins: sweep body
src/GPhoCS.c:2287-2428, bounds :2320-2353, JC edge probability
src/LocusDataLikelihood.c:1831-1848, root reduce :471-479, delta walk
src/patch.c:1434-1530.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gphocs_tpu.state import GenState, Params, SeqData
from gphocs_tpu.kernels.common import Context, band_windows
from gphocs_tpu.rng_fast import FastRngState

_BIG = 1e30
_GOLD = 0x9E3779B9
# mixture-kernel constants (reference src/utils.c:437-441, m2s2 = 8)
_M2N = float(jnp.sqrt(8.0 / 9.0))
_S2N = float(jnp.sqrt(1.0 / 9.0))
_SLACK = 1e-9  # reflect slack (reference src/utils.c:337)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------------------
# in-kernel helpers (shared by the sweep kernels)
# --------------------------------------------------------------------------

def _fmix32(z):
    z = z ^ (z >> jnp.uint32(16))
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> jnp.uint32(13))
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> jnp.uint32(16))
    return z


def _uniform(key, ctr, off, dt):
    """Counter-based U(0,1) per lane — bit-identical to rng_fast._raw_u."""
    c = (ctr + off.astype(jnp.uint32)) * jnp.uint32(_GOLD)
    x = _fmix32(key ^ _fmix32(c))
    if jnp.dtype(dt) == jnp.dtype(jnp.float32):
        f = pltpu.bitcast((x >> jnp.uint32(9)) | jnp.uint32(0x3F800000),
                          jnp.float32)
        return f - jnp.float32(1.0 - 2.0 ** -24)
    return (x.astype(dt) + 0.5) * (2.0 ** -32)


def _rnd2normal8(key, ctr, off, dt):
    """3 draws at offsets off+1..off+3 (rng_fast.rnd2normal8 order)."""
    u1 = _uniform(key, ctr, off + 1, dt)
    u2 = _uniform(key, ctr, off + 2, dt)
    u3 = _uniform(key, ctr, off + 3, dt)
    nrm = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    zval = _M2N + nrm * _S2N
    return jnp.where(u3 < 0.5, zval, -zval)


def _reflect(x, a, b):
    """Vector twin of gphocs_tpu.utils.reflect (loop statically bounded)."""
    a = a + _SLACK
    b = b - _SLACK
    empty = b <= a
    a_s = jnp.where(empty, 0.0, a)
    b_s = jnp.where(empty, 1.0, b)
    inside = (x < b_s) & (x > a_s)
    xnew = jnp.where(x <= a_s, 2.0 * a_s - x, x)
    dbl = 2.0 * (b_s - a_s)
    xnew = xnew - dbl * jnp.floor((xnew - a_s) / dbl)
    xnew = jnp.where(xnew >= b_s, 2.0 * b_s - xnew, xnew)
    for _ in range(3):  # alternating fixup; a no-op once inside (a, b)
        xnew = jnp.where(xnew >= b_s, 2.0 * b_s - xnew, xnew)
        xnew = jnp.where(xnew <= a_s, 2.0 * a_s - xnew, xnew)
    return jnp.where(empty, (a + b) / 2.0, jnp.where(inside, x, xnew))


def _gather_rows(tbl, idx, nid):
    """tbl[idx[l], l] for a [N, TL] table and [1, TL] index (one [N, TL] op).

    nid: broadcasted iota [N, TL] over dim 0.  Out-of-range idx -> 0.
    """
    return jnp.sum(jnp.where(nid == idx, tbl, jnp.zeros((), tbl.dtype)),
                   axis=0, keepdims=True)


def _edge_p(length, dt):
    p = (1.0 - jnp.exp(-4.0 * length / 3.0)) / 4.0
    return jnp.where(length < 1e-30, jnp.zeros((), dt), p)


def _son_block(cond_ref, idx, N, CPWP, dt):
    """[CPWP, TL] conditional block of per-lane node idx ([1, TL])."""
    acc = jnp.zeros((CPWP, cond_ref.shape[1]), dt)
    for n in range(N):
        acc = acc + jnp.where(idx == n,
                              cond_ref[n * CPWP:(n + 1) * CPWP, :], 0.0)
    return acc


def _sum4(x, P, CPWP):
    """Per-pattern base sums of a [CPWP, TL] block, broadcast back."""
    TL = x.shape[1]
    rows = []
    for p_ in range(P):
        s = (x[4 * p_, :] + x[4 * p_ + 1, :] + x[4 * p_ + 2, :]
             + x[4 * p_ + 3, :])
        rows.append(jnp.broadcast_to(s[None, :], (4, TL)))
    if CPWP > 4 * P:
        rows.append(jnp.zeros((CPWP - 4 * P, TL), x.dtype))
    return jnp.concatenate(rows, axis=0)


def _combine_block(ca, cb, pa, pb, P, CPWP):
    """JC pruning combine for one node from its two son blocks (with the
    x4 Felsenstein rescale per internal node — see ops/pruning.py)."""
    fa = pa * _sum4(ca, P, CPWP) + (1.0 - 4.0 * pa) * ca
    fb = pb * _sum4(cb, P, CPWP) + (1.0 - 4.0 * pb) * cb
    return 4.0 * fa * fb


def _refresh_path(cond_ref, age, lson, rson, father,
                  mut, start, nid, N, S, P, CPWP, dt):
    """Recompute conditionals along the path start -> root inside cond_ref.

    start: [1, TL] int32 (or -1 to skip the lane).  At most S-1 masked
    steps (every root path has <= S-1 internal nodes); the loop exits as
    soon as all lanes are done, so typical cost is the max path length
    in the tile (~log S).  age/lson/rson/father are [N, TL] VALUES
    holding the PROPOSED state.  Writes in place.  Consumes no RNG, so
    the data-dependent trip count does not affect stream positions.
    """

    def step(st):
        cur, it = st
        act = cur >= 0
        ls = _gather_rows(lson, cur, nid).astype(jnp.int32)
        rs = _gather_rows(rson, cur, nid).astype(jnp.int32)
        t_c = _gather_rows(age, cur, nid)
        pa = _edge_p(mut * (t_c - _gather_rows(age, ls, nid)), dt)
        pb = _edge_p(mut * (t_c - _gather_rows(age, rs, nid)), dt)
        ca = _son_block(cond_ref, ls, N, CPWP, dt)
        cb = _son_block(cond_ref, rs, N, CPWP, dt)
        blk = _combine_block(ca, cb, pa, pb, P, CPWP)
        for n in range(S, N):
            m = act & (cur == n)
            cond_ref[n * CPWP:(n + 1) * CPWP, :] = jnp.where(
                m, blk, cond_ref[n * CPWP:(n + 1) * CPWP, :])
        nxt = _gather_rows(father, cur, nid).astype(jnp.int32)
        return jnp.where(act, nxt, cur), it + 1

    lax.while_loop(
        lambda st: (jnp.max(st[0]) >= 0) & (st[1] < S - 1),
        step, (start, jnp.zeros((), jnp.int32)))


def _root_lnld(cond_ref, root, gid_ref, gcount_ref, gnph_ref, pvalid_ref,
               N, P, CPWP, dt):
    """Per-lane data log-likelihood from the root conditional block
    (reference src/LocusDataLikelihood.c:471-479)."""
    TL = cond_ref.shape[1]
    rb = _son_block(cond_ref, root, N, CPWP, dt)           # [CPWP, TL]
    pat = jnp.concatenate(
        [(rb[4 * p_, :] + rb[4 * p_ + 1, :] + rb[4 * p_ + 2, :]
          + rb[4 * p_ + 3, :])[None, :] for p_ in range(P)], axis=0)
    pat = pat * pvalid_ref[:]
    gid = gid_ref[:]
    gcount = gcount_ref[:]
    gnph = gnph_ref[:]
    gsum = jnp.concatenate(
        [jnp.sum(jnp.where(gid == g_, pat, 0.0), axis=0)[None, :]
         for g_ in range(P)], axis=0)
    safe = jnp.where(gcount > 0, gsum, 1.0)
    S_ = (N + 1) // 2
    lnl = jnp.sum(gcount * (jnp.log(safe) - jnp.log(4.0 * gnph)
                            - jnp.asarray((S_ - 1) * math.log(4.0), dt)),
                  axis=0, keepdims=True)
    return lnl


# --------------------------------------------------------------------------
# Kernel 1: full node-age sweep (UpdateGB_InternalNode)
# --------------------------------------------------------------------------

def _node_age_kernel(ctr_ref, ft_ref,
                     age_ref, lson_ref, rson_ref, father_ref, root_ref,
                     mut_ref, etop_ref, fme_ref, mme_ref,
                     mstart_ref, mnext_ref, mbranch_ref,
                     pres_ref, meta_ref,
                     bs_ref, be_ref, brate_ref,
                     gid_ref, gcount_ref, gnph_ref, pvalid_ref,
                     key_ref, real_ref, lnld_ref, lnp_ref,
                     cond_in_ref,
                     # outputs
                     cond_ref, age_out, etop_out, lnld_out, lnp_out,
                     acc_ref,
                     # scratch
                     prop_ref,
                     *, N, S, M, B, P, CPWP, NSEGP, KM, oldage):
    dt = age_ref.dtype
    TL = age_ref.shape[1]
    NI = S - 1
    nid = lax.broadcasted_iota(jnp.int32, (N, TL), 0)
    cond_ref[:] = cond_in_ref[:]
    age_out[:] = age_ref[:]
    etop_out[:] = etop_ref[:]
    lnld_out[:] = lnld_ref[:]
    lnp_out[:] = lnp_ref[:]
    acc_ref[:] = jnp.zeros((1, TL), jnp.int32)

    key = key_ref[:]                       # [1, TL] uint32
    ctr0 = ctr_ref[0, 0]
    ft = ft_ref[0, 0]
    root = root_ref[:]
    mut = mut_ref[:]
    real = real_ref[:] > 0                 # [1, TL] genuine-lane mask

    def node_step(i, _):
        inode = S + i
        ioh = (nid == inode)               # [N, TL] one-hot row mask
        age = age_out[:]
        etop = etop_out[:]
        # per-node-step tables at 8-aligned strides (Mosaic constraint)
        pres_i = pres_ref[pl.ds(i * NSEGP, NSEGP), :]
        meta_i = meta_ref[pl.ds(i * KM, KM), :]
        t = jnp.sum(jnp.where(ioh, age, 0.0), axis=0, keepdims=True)
        ls = _gather_rows(lson_ref[:], jnp.full((1, TL), inode, jnp.int32),
                          nid).astype(jnp.int32)
        rs = _gather_rows(rson_ref[:], jnp.full((1, TL), inode, jnp.int32),
                          nid).astype(jnp.int32)
        fa = _gather_rows(father_ref[:],
                          jnp.full((1, TL), inode, jnp.int32),
                          nid).astype(jnp.int32)
        # -- bounds (reference src/GPhoCS.c:2320-2353) --
        age_ls = _gather_rows(age, ls, nid)
        age_rs = _gather_rows(age, rs, nid)
        mm_ls = _gather_rows(mme_ref[:], ls, nid)
        mm_rs = _gather_rows(mme_ref[:], rs, nid)
        tb0 = jnp.maximum(meta_i[1:2, :],
                          jnp.maximum(jnp.maximum(mm_ls, age_ls),
                                      jnp.maximum(mm_rs, age_rs)))
        fm = jnp.sum(jnp.where(ioh, fme_ref[:], 0.0), axis=0, keepdims=True)
        is_root = root == inode
        fa_age = _gather_rows(age, jnp.maximum(fa, 0), nid)
        upper2 = jnp.where(fm < _BIG * 0.5, fm,
                           jnp.where(is_root, jnp.asarray(_BIG, dt), fa_age))
        tb1 = jnp.minimum(meta_i[2:3, :], upper2)

        # -- proposal --
        off = (4 * i) * jnp.ones((1, TL), jnp.int32)
        z = _rnd2normal8(key, ctr0, off, dt)
        tnew = _reflect(t + ft * z, tb0, tb1)
        tiny = jnp.abs(tnew - t) < 1e-15

        # -- closed-form genealogy-prior delta (src/patch.c:1434-1530) --
        w0 = jnp.minimum(t, tnew)
        w1 = jnp.maximum(t, tnew)
        raising = tnew > t
        seg_end_e = jnp.minimum(etop, fme_ref[:])           # [N, TL]
        pres_e = pres_i[0:N, :]
        integ = jnp.sum(
            pres_e * jnp.maximum(
                jnp.minimum(seg_end_e, w1) - jnp.maximum(age, w0), 0.0),
            axis=0, keepdims=True)
        if M > 0:
            mb = mbranch_ref[:].astype(jnp.int32)           # [M, TL]
            # edge_top of each event's branch: one [N, TL] pass per slot row
            bt = jnp.zeros((M, TL), dt)
            for n in range(N):
                bt = jnp.where(mb == n, jnp.broadcast_to(
                    etop[n:n + 1, :], (M, TL)), bt)
            mseg_end = jnp.minimum(mnext_ref[:], bt)
            pres_m = pres_i[N:N + M, :]
            integ = integ + jnp.sum(
                pres_m * jnp.maximum(
                    jnp.minimum(mseg_end, w1)
                    - jnp.maximum(mstart_ref[:], w0), 0.0),
                axis=0, keepdims=True)
        wlen = w1 - w0
        dcoal = jnp.where(raising, 2.0 * integ, -2.0 * (integ - wlen))
        dlnp = -dcoal / meta_i[0:1, :]
        if B > 0:
            ov = jnp.maximum(
                jnp.minimum(w1, be_ref[:]) - jnp.maximum(w0, bs_ref[:]), 0.0)
            sgn = jnp.where(raising, jnp.ones((), dt), -jnp.ones((), dt))
            dlnp = dlnp - sgn * jnp.sum(
                meta_i[3:3 + B, :] * brate_ref[:] * ov,
                axis=0, keepdims=True)

        # -- data delta: dirty-path refresh on a scratch copy --
        prop_ref[:] = cond_ref[:]
        age_out[:] = jnp.where(ioh, jnp.broadcast_to(tnew, (N, TL)), age)
        _refresh_path(prop_ref, age_out[:], lson_ref[:], rson_ref[:],
                      father_ref[:],
                      mut, jnp.full((1, TL), inode, jnp.int32), nid,
                      N, S, P, CPWP, dt)
        lnld_new = _root_lnld(prop_ref, root, gid_ref, gcount_ref,
                              gnph_ref, pvalid_ref, N, P, CPWP, dt)
        lnld_old = lnld_out[:]
        lnacc = dlnp + (lnld_new - lnld_old)

        # -- MH select (fast-RNG consumption: u always drawn) --
        u = _uniform(key, ctr0, off + 4, dt)
        accept = real & ~tiny & (
            (lnacc >= 0.0) | (u < jnp.exp(jnp.minimum(lnacc, 0.0))))

        age_out[:] = jnp.where(
            ioh, jnp.broadcast_to(jnp.where(accept, tnew, t), (N, TL)),
            age_out[:])
        cond_ref[:] = jnp.where(
            jnp.broadcast_to(accept, cond_ref.shape), prop_ref[:],
            cond_ref[:])
        son_mask = (nid == ls) | (nid == rs)
        etop_out[:] = jnp.where(son_mask & accept,
                                jnp.broadcast_to(tnew, (N, TL)), etop)
        lnld_out[:] = jnp.where(accept, lnld_new, lnld_old)
        lnp_out[:] = jnp.where(accept, lnp_out[:] + dlnp, lnp_out[:])
        acc_ref[:] = acc_ref[:] + jnp.where(
            real & (accept | tiny), 1, 0).astype(jnp.int32)
        return 0

    lax.fori_loop(0, NI, node_step, 0)


def _cl_layout(cond):
    """[L, N, P, 4] -> ([N*CPWP, L], CPWP) kernel layout."""
    L, N, P, _ = cond.shape
    CPW = 4 * P
    CPWP = _round_up(CPW, 8)
    c = cond.reshape(L, N, CPW)
    if CPWP != CPW:
        c = jnp.pad(c, ((0, 0), (0, 0), (0, CPWP - CPW)))
    return c.reshape(L, N * CPWP).T, CPWP


def _cl_unlayout(c_cl, L, N, P, CPWP):
    c = c_cl.T.reshape(L, N, CPWP)[:, :, :4 * P]
    return c.reshape(L, N, P, 4)


def _next_mig_above(gen: GenState, dt):
    """[L, M] age of the next active migration above each event on the same
    branch (ties broken by slot id), else _BIG (cf. ops/coalstats.segments)."""
    M = gen.max_migs
    act = gen.mig_branch >= 0
    big = jnp.asarray(_BIG, dt)
    ma = jnp.where(act, gen.mig_age, big)
    same = (act[:, :, None] & act[:, None, :]
            & (gen.mig_branch[:, :, None] == gen.mig_branch[:, None, :]))
    idx = jnp.arange(M)
    later = same & ((ma[:, None, :] > ma[:, :, None])
                    | ((ma[:, None, :] == ma[:, :, None])
                       & (idx[None, None, :] > idx[None, :, None])))
    return jnp.min(jnp.where(later, ma[:, None, :], big), axis=2)


def _sweep_prep(gen: GenState, params: Params, ctx: Context):
    """Shared XLA-side precomputation for the sweep kernels (static during a
    node-age sweep): per-edge migration tables, edge tops, per-internal-node
    population scalars and segment-presence masks."""
    L, N = gen.father.shape
    S = (N + 1) // 2
    M = gen.max_migs
    P = ctx.num_pops
    dt = gen.age.dtype

    fa_safe = jnp.where(gen.father < 0, 0, gen.father)
    edge_top = jnp.where(gen.father < 0, jnp.asarray(ctx.oldage, dt),
                         jnp.take_along_axis(gen.age, fa_safe, axis=1))
    act = gen.mig_branch >= 0
    big = jnp.asarray(_BIG, dt)
    onb = (gen.mig_branch[:, None, :]
           == jnp.arange(N, dtype=jnp.int32)[None, :, None]) & act[:, None, :]
    first_mig_edge = jnp.min(
        jnp.where(onb, gen.mig_age[:, None, :], big), axis=2)   # [L, N]
    max_mig_edge = jnp.max(
        jnp.where(onb, gen.mig_age[:, None, :], -big), axis=2)  # [L, N]
    mig_start = jnp.where(act, gen.mig_age, big)
    mig_next = _next_mig_above(gen, dt)
    mig_branch = jnp.where(act, gen.mig_branch, -1)

    pop_i = gen.node_pop[:, S:]                                # [L, NI]
    anc = jnp.asarray(ctx.is_ancestral)
    anc_rows = anc[pop_i]                                      # [L, NI, P]
    # presence of each segment (N edges, M mig segs) in pop(node i)'s set
    pres_e = jnp.take_along_axis(
        anc_rows, gen.node_pop[:, None, :].astype(jnp.int32).repeat(
            pop_i.shape[1], 1), axis=2)                        # [L, NI, N]
    if M > 0 and ctx.num_bands > 0:
        base_mig = ctx.band_source[jnp.where(act, gen.mig_band, 0)]
        pres_m = jnp.take_along_axis(
            anc_rows, base_mig[:, None, :].astype(jnp.int32).repeat(
                pop_i.shape[1], 1), axis=2) & act[:, None, :]
    else:
        pres_m = jnp.zeros((L, pop_i.shape[1], M), bool)
    pres = jnp.concatenate([pres_e, pres_m], axis=2).astype(dt)

    theta_i = params.theta[pop_i]
    tau0 = params.tau[pop_i]
    fpop = ctx.father_pop[pop_i]
    tau1 = jnp.where(fpop < 0, jnp.asarray(ctx.oldage, dt),
                     params.tau[jnp.where(fpop < 0, 0, fpop)])
    return dict(edge_top=edge_top, first_mig_edge=first_mig_edge,
                max_mig_edge=max_mig_edge, mig_start=mig_start,
                mig_next=mig_next, mig_branch=mig_branch, pres=pres,
                theta_i=theta_i, tau0=tau0, tau1=tau1, pop_i=pop_i)


def _pick_tile(N: int, CPWP: int, itemsize: int = 4,
               budget: int = 8 * 1024 * 1024) -> int:
    """Lane-tile size bounded by VMEM: two conditional buffers (working +
    proposal scratch) must fit the budget.  Deeper tiles amortize the
    sweep's sequential per-node steps over more loci per launch
    (GPHOCS_TILE overrides the starting width)."""
    import os

    tl = int(os.environ.get("GPHOCS_TILE", "256"))
    while tl > 128 and 2 * N * CPWP * tl * itemsize > budget:
        tl //= 2
    return tl


def node_age_sweep_pallas(gen: GenState, params: Params, seq: SeqData,
                          rng: FastRngState, ctx: Context, finetune,
                          lnld, lnp, cond, *, tile: int = 0,
                          interpret: bool = False):
    """Drop-in fused twin of kernels/node_age.update_internal_node_ages for
    fast-RNG mode.  Returns (gen, rng, lnld, lnp, cond, acc)."""
    L, N, P_pat, _ = cond.shape
    S = (N + 1) // 2
    NI = S - 1
    M = gen.max_migs
    B = ctx.num_bands
    NSEG = N + M
    dt = gen.age.dtype

    prep = _sweep_prep(gen, params, ctx)
    cond_cl, CPWP = _cl_layout(cond)

    TL = tile or _pick_tile(N, CPWP)
    Lp = _round_up(L, TL)
    padL = Lp - L

    def padr(x, fill=0):
        """Pad the lane (last) axis of a [R, L] array."""
        if padL == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, padL)), constant_values=fill)

    def row(x, cast=None):
        """[L] -> [1, Lp]."""
        v = x[None, :]
        return padr(v if cast is None else v.astype(cast))

    def mat(x, cast=None):
        """[L, R] -> [R, Lp]."""
        v = x.T
        return padr(v if cast is None else v.astype(cast))

    bs, be = band_windows(ctx, params.tau)
    if B > 0:
        bs_a = jnp.broadcast_to(bs[:, None], (B, Lp)).astype(dt)
        be_a = jnp.broadcast_to(be[:, None], (B, Lp)).astype(dt)
        br_a = jnp.broadcast_to(params.mig_rate[:, None], (B, Lp)).astype(dt)
        binto = (ctx.band_target[None, None, :]
                 == prep["pop_i"][:, :, None]).astype(dt)      # [L, NI, B]
    else:
        bs_a = jnp.zeros((1, Lp), dt)
        be_a = jnp.zeros((1, Lp), dt)
        br_a = jnp.zeros((1, Lp), dt)
        binto = jnp.zeros((L, NI, 0), dt)

    if M > 0:
        mstart = mat(prep["mig_start"])
        mnext = mat(prep["mig_next"])
        mbranch = mat(prep["mig_branch"], jnp.int32)
    else:
        mstart = jnp.full((1, Lp), _BIG, dt)
        mnext = jnp.full((1, Lp), _BIG, dt)
        mbranch = jnp.full((1, Lp), -1, jnp.int32)

    # per-node-step tables at 8-aligned strides: Mosaic only allows
    # dynamic sublane offsets that are provably multiples of 8
    NSEGP = _round_up(NSEG, 8)
    pres3 = jnp.pad(prep["pres"], ((0, 0), (0, 0), (0, NSEGP - NSEG)))
    pres = padr(pres3.reshape(L, NI * NSEGP).T)
    KM = _round_up(3 + B, 8)
    meta3 = jnp.concatenate(
        [prep["theta_i"][:, :, None], prep["tau0"][:, :, None],
         prep["tau1"][:, :, None], binto], axis=2)             # [L, NI, 3+B]
    meta3 = jnp.pad(meta3, ((0, 0), (0, 0), (0, KM - 3 - B)))
    meta = padr(meta3.reshape(L, NI * KM).T.astype(dt))

    args = (
        mat(gen.age), mat(gen.lson, jnp.int32), mat(gen.rson, jnp.int32),
        mat(gen.father, jnp.int32), row(gen.root, jnp.int32),
        row(gen.mut_rate), mat(prep["edge_top"]),
        mat(prep["first_mig_edge"]), mat(prep["max_mig_edge"]),
        mstart, mnext, mbranch,
        pres, meta,
        bs_a, be_a, br_a,
        mat(seq.group_id, jnp.int32), mat(seq.group_count.astype(dt)),
        mat(seq.group_nphases.astype(dt)),
        mat(seq.pattern_valid.astype(dt)),
        row(rng.key[:L], jnp.uint32),
        row(gen.valid, jnp.int32),
        row(lnld), row(lnp),
        padr(cond_cl),
    )
    ctr = jnp.asarray(rng.ctr, jnp.uint32).reshape(1, 1)
    ft = jnp.asarray(finetune, dt).reshape(1, 1)

    grid = (Lp // TL,)

    def vspec(r):
        return pl.BlockSpec((r, TL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
    in_specs = [sspec, sspec] + [vspec(a.shape[0]) for a in args]
    out_shape = (
        jax.ShapeDtypeStruct((N * CPWP, Lp), dt),   # cond
        jax.ShapeDtypeStruct((N, Lp), dt),          # age
        jax.ShapeDtypeStruct((N, Lp), dt),          # edge_top (unused out)
        jax.ShapeDtypeStruct((1, Lp), dt),          # lnld
        jax.ShapeDtypeStruct((1, Lp), dt),          # lnp
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # acc
    )
    out_specs = tuple(vspec(s.shape[0]) for s in out_shape)

    kernel = functools.partial(
        _node_age_kernel, N=N, S=S, M=M, B=B, P=P_pat, CPWP=CPWP,
        NSEGP=NSEGP, KM=KM, oldage=ctx.oldage)
    cond_o, age_o, _etop_o, lnld_o, lnp_o, acc_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N * CPWP, TL), dt)],
        interpret=interpret,
    )(ctr, ft, *args)

    gen = gen._replace(age=age_o[:, :L].T)
    cond_new = _cl_unlayout(cond_o[:, :L], L, N, P_pat, CPWP)
    lnld_new = lnld_o[0, :L]
    lnp_new = lnp_o[0, :L]
    acc = jnp.sum(acc_o[0, :L], dtype=jnp.int32)
    rng = rng._replace(ctr=rng.ctr + jnp.uint32(4 * NI))
    return gen, rng, lnld_new, lnp_new, cond_new, acc


# --------------------------------------------------------------------------
# Kernel 3: full migration-age sweep (UpdateGB_MigrationNode)
# --------------------------------------------------------------------------

def _mig_age_kernel(ctr_ref, ft_ref,
                    mag_in, mbr_ref, mbd_ref,
                    age_ref, father_ref, pop_ref,
                    theta_ref, tau_ref, pend_ref, anc_ref,
                    bs_ref, be_ref, brate_ref, bsrc_ref, btgt_ref,
                    key_ref, real_ref, lnp_ref,
                    # outputs
                    mag_out, lnp_out, acc_ref,
                    *, N, M, B, PP, oldage):
    """One loci tile, full migration-age sweep (prior-only arithmetic).

    Sequential over the M slots (the reference sweeps its living_mignodes
    list, src/GPhoCS.c:2439-2590); per-slot genealogy-prior delta is the
    in-VMEM twin of ops/coalstats.mig_age_move_delta (itself the tensor
    twin of the paired considerEventMove walks, src/patch.c:1434-1530).
    RNG consumption: 4 draws per slot (3 proposal + 1 accept), identical
    to the XLA fast-RNG path.
    """
    dt = mag_in.dtype
    TL = mag_in.shape[1]
    nid = lax.broadcasted_iota(jnp.int32, (N, TL), 0)
    oa = jnp.asarray(oldage, dt)
    big = jnp.asarray(_BIG, dt)

    mag_out[:] = mag_in[:]
    lnp_out[:] = lnp_ref[:]
    acc_ref[:] = jnp.zeros((1, TL), jnp.int32)

    key = key_ref[:]
    ctr0 = ctr_ref[0, 0]
    ft = ft_ref[0, 0]
    real = real_ref[:] > 0
    mbr = mbr_ref[:].astype(jnp.int32)          # [M, TL] static this sweep
    mbd = mbd_ref[:].astype(jnp.int32)
    act = mbr >= 0
    npop = pop_ref[:].astype(jnp.int32)
    father = father_ref[:].astype(jnp.int32)
    age = age_ref[:]

    # static-per-sweep per-edge tops (ages/topology unchanged here)
    top_rows = []
    for n in range(N):
        fa_n = father[n:n + 1, :]
        t_fa = _gather_rows(age, jnp.maximum(fa_n, 0), nid)
        top_rows.append(jnp.where(fa_n < 0, oa, t_fa))
    top = jnp.concatenate(top_rows, axis=0)     # [N, TL]

    def band_sel(band, tbl):
        """tbl[band[l], l] for a [B, TL] table and [1, TL] band index."""
        out = jnp.zeros((1, TL), tbl.dtype)
        for b_ in range(B):
            out = jnp.where(band == b_, tbl[b_:b_ + 1, :], out)
        return out

    # base pop of each migration segment (bands are static)
    src_pop_m = jnp.zeros((M, TL), jnp.int32)
    for b_ in range(B):
        src_pop_m = jnp.where(
            mbd == b_,
            jnp.broadcast_to(bsrc_ref[b_:b_ + 1, :].astype(jnp.int32),
                             (M, TL)), src_pop_m)

    for m in range(M):
        mag = mag_out[:]
        act_m = act[m:m + 1, :] & real
        band = jnp.where(act_m, mbd[m:m + 1, :], 0)
        t = mag[m:m + 1, :]
        branch = jnp.where(act_m, mbr[m:m + 1, :], 0)

        tb0 = band_sel(band, bs_ref[:])
        tb1 = band_sel(band, be_ref[:])
        # neighbouring migration events on the same branch
        others = act & (mbr == branch)
        others = others & (lax.broadcasted_iota(jnp.int32, (M, TL), 0) != m)
        below = others & (mag < t)
        above = others & (mag > t)
        lm = jnp.max(jnp.where(below, mag, -big), axis=0, keepdims=True)
        fm = jnp.min(jnp.where(above, mag, big), axis=0, keepdims=True)
        child_age = _gather_rows(age, branch, nid)
        fa_b = _gather_rows(father, branch, nid).astype(jnp.int32)
        fa_age = jnp.where(fa_b < 0, oa,
                           _gather_rows(age, jnp.maximum(fa_b, 0), nid))
        tb0 = jnp.maximum(tb0, jnp.where(lm > -big * 0.5, lm, child_age))
        tb1 = jnp.minimum(tb1, jnp.where(fm < big * 0.5, fm, fa_age))

        off = (4 * m) * jnp.ones((1, TL), jnp.int32)
        z = _rnd2normal8(key, ctr0, off, dt)
        tnew = _reflect(t + ft * z, tb0, tb1)
        tiny = jnp.abs(tnew - t) < 1e-15

        # -- closed-form prior delta (mig_age_move_delta twin) --
        s_pop = band_sel(band, bsrc_ref[:]).astype(jnp.int32)
        p_pop = band_sel(band, btgt_ref[:]).astype(jnp.int32)
        up = tnew > t
        A = jnp.where(up, p_pop, s_pop)    # pop gaining the lineage in W
        Rm = jnp.where(up, s_pop, p_pop)   # pop losing it
        w0 = jnp.minimum(t, tnew)
        w1 = jnp.maximum(t, tnew)

        # per-slot segment tables (mig ages move as slots are accepted)
        fme = jnp.full((N, TL), _BIG, dt)      # first mig above each edge
        for m2 in range(M):
            a2 = jnp.where(act[m2:m2 + 1, :], mag[m2:m2 + 1, :], big)
            fme = jnp.where(mbr[m2:m2 + 1, :] == nid,
                            jnp.minimum(fme, jnp.broadcast_to(a2, (N, TL))),
                            fme)
        seg_start = [age[n:n + 1, :] for n in range(N)]
        seg_end = [jnp.minimum(top[n:n + 1, :], fme[n:n + 1, :])
                   for n in range(N)]
        seg_base = [npop[n:n + 1, :] for n in range(N)]
        seg_valid = [jnp.ones((1, TL), dt) for _ in range(N)]
        for m2 in range(M):
            a2 = mag[m2:m2 + 1, :]
            nxt = jnp.full((1, TL), _BIG, dt)
            for m3 in range(M):
                if m3 == m2:
                    continue
                same = (act[m2:m2 + 1, :] & act[m3:m3 + 1, :]
                        & (mbr[m2:m2 + 1, :] == mbr[m3:m3 + 1, :]))
                a3 = jnp.where(act[m3:m3 + 1, :], mag[m3:m3 + 1, :], big)
                later = same & ((a3 > a2) | ((a3 == a2) & (m3 > m2)))
                nxt = jnp.where(later, jnp.minimum(nxt, a3), nxt)
            btop = _gather_rows(top, jnp.maximum(mbr[m2:m2 + 1, :], 0), nid)
            seg_start.append(a2)
            seg_end.append(jnp.minimum(nxt, btop))
            seg_base.append(src_pop_m[m2:m2 + 1, :])
            seg_valid.append(jnp.where(act[m2:m2 + 1, :],
                                       jnp.ones((), dt), 0.0))

        # stacked [NSEG, TL] tables so the per-pop reductions run as
        # block ops (full 8-sublane VPU utilization, not [1, TL] rows)
        seg_start_b = jnp.concatenate(seg_start, axis=0)
        seg_end_b = jnp.concatenate(seg_end, axis=0)
        seg_base_b = jnp.concatenate(seg_base, axis=0)
        seg_valid_b = jnp.concatenate(seg_valid, axis=0)
        NSEG = N + M

        dlnp = jnp.zeros((1, TL), dt)
        for r in range(PP):
            # anc[r, q] rows of the flattened [PP*PP, TL] table
            in_A = jnp.zeros((1, TL), dt)
            in_R = jnp.zeros((1, TL), dt)
            pres = jnp.zeros((NSEG, TL), dt)
            for q in range(PP):
                arq = anc_ref[r * PP + q:r * PP + q + 1, :]
                in_A = in_A + jnp.where(A == q, arq, 0.0)
                in_R = in_R + jnp.where(Rm == q, arq, 0.0)
                pres = pres + jnp.where(
                    seg_base_b == q, jnp.broadcast_to(arq, (NSEG, TL)), 0.0)
            addm = (in_A > 0.5) & (in_R <= 0.5)
            remm = (in_R > 0.5) & (in_A <= 0.5)
            tau_r = tau_ref[r:r + 1, :]
            pend_r = pend_ref[r:r + 1, :]
            lo = jnp.maximum(jnp.maximum(seg_start_b, tau_r), w0)
            hi = jnp.minimum(jnp.minimum(seg_end_b, pend_r), w1)
            integ = jnp.sum(
                jnp.where((seg_valid_b > 0.5) & (pres > 0.5),
                          jnp.maximum(hi - lo, 0.0), 0.0),
                axis=0, keepdims=True)
            wlen_r = jnp.maximum(
                jnp.minimum(w1, pend_r) - jnp.maximum(w0, tau_r), 0.0)
            dcoal = jnp.where(addm, 2.0 * integ,
                              jnp.where(remm, -2.0 * (integ - wlen_r), 0.0))
            dlnp = dlnp - dcoal / theta_ref[r:r + 1, :]
            # migration-stat deltas for bands targeting r
            for b_ in range(B):
                ov = jnp.maximum(
                    jnp.minimum(w1, be_ref[b_:b_ + 1, :])
                    - jnp.maximum(w0, bs_ref[b_:b_ + 1, :]), 0.0)
                tgt_is_r = btgt_ref[b_:b_ + 1, :].astype(jnp.int32) == r
                dmig = jnp.where(
                    tgt_is_r & addm, ov,
                    jnp.where(tgt_is_r & remm, -ov, 0.0))
                dlnp = dlnp - dmig * brate_ref[b_:b_ + 1, :]

        u = _uniform(key, ctr0, off + 4, dt)
        accept = act_m & ~tiny & (
            (dlnp >= 0.0) | (u < jnp.exp(jnp.minimum(dlnp, 0.0))))
        mag_out[m:m + 1, :] = jnp.where(accept, tnew, t)
        lnp_out[:] = jnp.where(accept, lnp_out[:] + dlnp, lnp_out[:])
        acc_ref[:] = acc_ref[:] + jnp.where(
            act_m & (accept | tiny), 1, 0).astype(jnp.int32)


def mig_age_sweep_pallas(gen: GenState, params: Params, rng: FastRngState,
                         ctx: Context, finetune, lnp, *, tile: int = 512,
                         interpret: bool = False):
    """Drop-in fused twin of kernels/mig_age.update_mig_ages for fast-RNG
    mode.  Returns (gen, rng, lnp, acc).  Prior-only arithmetic on
    [M, TL]/[N, TL] tiles — no conditionals, so VMEM cost is tiny and the
    lane tile defaults wide."""
    if ctx.num_bands == 0:
        return gen, rng, lnp, jnp.zeros((), jnp.int32)
    L, N = gen.father.shape
    M = gen.max_migs
    B = ctx.num_bands
    PP = ctx.num_pops
    dt = gen.age.dtype

    TL = tile
    Lp = _round_up(L, TL)
    padL = Lp - L

    def padr(x, fill=0):
        if padL == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, padL)), constant_values=fill)

    def row(x, cast=None):
        v = x[None, :]
        return padr(v if cast is None else v.astype(cast))

    def mat(x, cast=None):
        v = x.T
        return padr(v if cast is None else v.astype(cast))

    def bcast(x, cast=None):
        v = jnp.broadcast_to(x[:, None], (x.shape[0], Lp))
        return v if cast is None else v.astype(cast)

    pend = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage, dt),
                     params.tau[jnp.where(ctx.father_pop < 0, 0,
                                          ctx.father_pop)])
    anc = ctx.is_ancestral.astype(dt).reshape(PP * PP)
    bs, be = band_windows(ctx, params.tau)

    args = (
        mat(jnp.where(gen.mig_branch >= 0, gen.mig_age, 0.0)),
        mat(gen.mig_branch, jnp.int32), mat(gen.mig_band, jnp.int32),
        mat(gen.age), mat(gen.father, jnp.int32),
        mat(gen.node_pop, jnp.int32),
        bcast(params.theta.astype(dt)), bcast(params.tau.astype(dt)),
        bcast(pend), bcast(anc),
        bcast(bs.astype(dt)), bcast(be.astype(dt)),
        bcast(params.mig_rate.astype(dt)),
        bcast(ctx.band_source, jnp.int32), bcast(ctx.band_target, jnp.int32),
        row(rng.key[:L], jnp.uint32),
        row(gen.valid, jnp.int32),
        row(lnp),
    )
    ctr = jnp.asarray(rng.ctr, jnp.uint32).reshape(1, 1)
    ft = jnp.asarray(finetune, dt).reshape(1, 1)
    grid = (Lp // TL,)

    def vspec(r):
        return pl.BlockSpec((r, TL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [sspec, sspec] + [vspec(a.shape[0]) for a in args]
    out_shape = (
        jax.ShapeDtypeStruct((M, Lp), dt),          # mig_age
        jax.ShapeDtypeStruct((1, Lp), dt),          # lnp
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # acc
    )
    out_specs = tuple(vspec(s.shape[0]) for s in out_shape)

    kernel = functools.partial(
        _mig_age_kernel, N=N, M=M, B=B, PP=PP, oldage=ctx.oldage)
    mag_o, lnp_o, acc_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(ctr, ft, *args)

    act = gen.mig_branch >= 0
    gen = gen._replace(mig_age=jnp.where(act, mag_o[:, :L].T, gen.mig_age))
    lnp_new = lnp_o[0, :L]
    acc = jnp.sum(acc_o[0, :L], dtype=jnp.int32)
    rng = rng._replace(ctr=rng.ctr + jnp.uint32(4 * M))
    return gen, rng, lnp_new, acc


# --------------------------------------------------------------------------
# Kernel 4: rubber-band proposal evaluation (UpdateTau / UpdateSampleAge)
# --------------------------------------------------------------------------

def _full_rebuild(prop_ref, age, lson, rson, mut, nid, N, S, P, CPWP, dt):
    """Bottom-up Jacobi rebuild of ALL internal conditionals in VMEM:
    trip k finalizes nodes of subtree height <= k (twin of
    ops/likelihood_cache.full_build).  Trips run as a fori_loop (the body
    is trip-invariant) to keep the Mosaic program size linear in S, not
    quadratic — the fully unrolled form compiled pathologically slowly."""

    def trip(_t, carry):
        for n in range(S, N):
            ls = lson[n:n + 1, :]
            rs = rson[n:n + 1, :]
            t_c = age[n:n + 1, :]
            pa = _edge_p(mut * (t_c - _gather_rows(age, ls, nid)), dt)
            pb = _edge_p(mut * (t_c - _gather_rows(age, rs, nid)), dt)
            ca = _son_block(prop_ref, ls, N, CPWP, dt)
            cb = _son_block(prop_ref, rs, N, CPWP, dt)
            prop_ref[n * CPWP:(n + 1) * CPWP, :] = _combine_block(
                ca, cb, pa, pb, P, CPWP)
        return carry

    lax.fori_loop(0, S - 1, trip, 0)


def _rubber_kernel(scal_ref,
                   age_ref, lson_ref, rson_ref, father_ref, root_ref,
                   pop_ref, mut_ref, real_ref,
                   mbr_ref, mbd_ref, mag_ref,
                   theta_ref, taunew_ref, pendnew_ref, anc_ref,
                   bsn_ref, ben_ref, brate_ref, bsrc_ref, btgt_ref,
                   gid_ref, gcount_ref, gnph_ref, pvalid_ref,
                   cond_in_ref,
                   # outputs
                   cond_ref, age_out, mag_out, lnld_out, lnp_out,
                   ntj0_out, ntj1_out, conf_out,
                   *, N, S, M, B, P, PP, CPWP, is_sample_age, is_root,
                   oldage):
    """One loci tile: evaluate a rubber-band proposal for one population.

    scal_ref (SMEM, [8]): pop, son0, son1, taub0, taub1, tauold, taunew
    encoded as [pop, s0, s1] ints at rows 0-2 and the four floats after.
    Affine remap of node/migration ages + conflict scan + full in-VMEM
    conditional rebuild + from-scratch genealogy prior on the proposed
    state.  Twin of kernels/tau._rubber_band_proposal (reference
    rubberBand, src/patch.c:596-801; UpdateTau src/GPhoCS.c:3224-3994;
    UpdateSampleAge :4006-4590).  The scalar MH decision (general RNG
    stream, Gamma prior ratio, Jacobian ntj*log f) stays in XLA — the
    cross-locus reductions of this kernel's outputs are the psum points
    of the loci mesh.
    """
    dt = age_ref.dtype
    TL = age_ref.shape[1]
    nid = lax.broadcasted_iota(jnp.int32, (N, TL), 0)
    oa = jnp.asarray(oldage, dt)
    big = jnp.asarray(_BIG, dt)

    pop = scal_ref[0, 0].astype(jnp.int32)
    s0 = scal_ref[1, 0].astype(jnp.int32)
    s1 = scal_ref[2, 0].astype(jnp.int32)
    taub0 = scal_ref[3, 0].astype(dt)
    taub1 = scal_ref[4, 0].astype(dt)
    tauold = scal_ref[5, 0].astype(dt)
    taunew = scal_ref[6, 0].astype(dt)

    f0 = (taunew - taub0) / (tauold - taub0)
    f1 = f0 if is_root else (taunew - taub1) / (tauold - taub1)

    age = age_ref[:]
    npop = pop_ref[:].astype(jnp.int32)
    lson = lson_ref[:].astype(jnp.int32)
    rson = rson_ref[:].astype(jnp.int32)
    father = father_ref[:].astype(jnp.int32)
    real = real_ref[:] > 0
    mut = mut_ref[:]
    internal = nid >= S

    # ---- node-age remap ----
    if is_sample_age:
        in_sons = npop == pop
        lower = in_sons & (age > taub0) & (age < tauold)
        upper = in_sons & (age >= tauold) & (age < taub1)
        new_age = jnp.where(lower & internal, taub0 + f0 * (age - taub0),
                            age)
        new_age = jnp.where(upper & internal, taub1 + f1 * (age - taub1),
                            new_age)
        is_pop_leaf = (nid < S) & (npop == pop)
        new_age = jnp.where(is_pop_leaf, taunew, new_age)
        ntj0_n = jnp.sum(jnp.where(lower & internal, 1, 0), axis=0,
                         keepdims=True)
        ntj1_n = jnp.sum(jnp.where(upper & internal, 1, 0), axis=0,
                         keepdims=True)
    else:
        in_anc = npop == pop
        in_sons = (npop == s0) | (npop == s1)
        if is_root:
            anc_map = taub0 + f0 * (age - taub0)
            moved_anc = in_anc & internal
        else:
            anc_map = taub1 + f1 * (age - taub1)
            moved_anc = in_anc & internal & (age < taub1)
        moved_sons = in_sons & (age > taub0) & (age < tauold) & internal
        new_age = jnp.where(moved_anc, anc_map, age)
        new_age = jnp.where(moved_sons, taub0 + f0 * (age - taub0), new_age)
        ntj0_n = jnp.sum(jnp.where(moved_sons, 1, 0), axis=0,
                         keepdims=True)
        ntj1_n = jnp.sum(jnp.where(moved_anc, 1, 0), axis=0, keepdims=True)

    # ---- migration-age remap + conflicts ----
    mbr = mbr_ref[:].astype(jnp.int32)
    mbd = mbd_ref[:].astype(jnp.int32)
    mag = mag_ref[:]
    act = mbr >= 0
    if B > 0:
        band = jnp.where(act, mbd, 0)
        msrc = jnp.zeros((M, TL), jnp.int32)
        mtgt = jnp.zeros((M, TL), jnp.int32)
        bs_of = jnp.zeros((M, TL), dt)
        be_of = jnp.zeros((M, TL), dt)
        for b_ in range(B):
            hit = band == b_
            msrc = jnp.where(hit, jnp.broadcast_to(
                bsrc_ref[b_:b_ + 1, :].astype(jnp.int32), (M, TL)), msrc)
            mtgt = jnp.where(hit, jnp.broadcast_to(
                btgt_ref[b_:b_ + 1, :].astype(jnp.int32), (M, TL)), mtgt)
            bs_of = jnp.where(hit, jnp.broadcast_to(
                bsn_ref[b_:b_ + 1, :], (M, TL)), bs_of)
            be_of = jnp.where(hit, jnp.broadcast_to(
                ben_ref[b_:b_ + 1, :], (M, TL)), be_of)
        in_window = act & (mag >= taub0) & (mag <= taub1)
        if is_sample_age:
            src_is = msrc == pop
            tgt_is = mtgt == pop
            side1 = in_window & (src_is | tgt_is) & (mag > tauold)
            side0 = in_window & (src_is | tgt_is) & (mag <= tauold)
            new_mage = jnp.where(side1, taub1 + f1 * (mag - taub1), mag)
            new_mage = jnp.where(side0, taub0 + f0 * (mag - taub0),
                                 new_mage)
            cnt0 = side0
            cnt1 = side1
            checked = side0 | side1
            kind_out = src_is
            trio_src = src_is
            trio_tgt = tgt_is
        else:
            both_sons = in_window & (((msrc == s0) & (mtgt == s1))
                                     | ((msrc == s1) & (mtgt == s0)))
            src_anc = in_window & ~both_sons & (msrc == pop)
            tgt_anc = in_window & ~both_sons & ~src_anc & (mtgt == pop)
            src_son = (in_window & ~both_sons & ~src_anc & ~tgt_anc
                       & ((msrc == s0) | (msrc == s1)) & (mag > taub0))
            tgt_son = (in_window & ~both_sons & ~src_anc & ~tgt_anc
                       & ~src_son & ((mtgt == s0) | (mtgt == s1))
                       & (mag > taub0))
            f1_sel = src_anc | tgt_anc
            f0_sel = both_sons | src_son | tgt_son
            new_mage = jnp.where(f1_sel, taub1 + f1 * (mag - taub1), mag)
            new_mage = jnp.where(f0_sel, taub0 + f0 * (mag - taub0),
                                 new_mage)
            cnt0 = f0_sel
            cnt1 = f1_sel
            checked = src_anc | tgt_anc | src_son | tgt_son
            kind_out = src_anc | src_son
            in_trio = lambda p: (p == pop) | (p == s0) | (p == s1)  # noqa
            trio_src = in_trio(msrc)
            trio_tgt = in_trio(mtgt)

        ntj0_out[:] = ntj0_n + jnp.sum(jnp.where(cnt0, 1, 0), axis=0,
                                       keepdims=True)
        ntj1_out[:] = ntj1_n + jnp.sum(jnp.where(cnt1, 1, 0), axis=0,
                                       keepdims=True)

        # neighbour mig ages (ties by slot id), per slot
        mag_act = jnp.where(act, mag, big)
        window_conf = checked & ((new_mage >= be_of) | (new_mage <= bs_of))
        conf_cnt = jnp.zeros((1, TL), jnp.int32)
        child_age_m = jnp.zeros((M, TL), dt)
        fa_m = jnp.zeros((M, TL), jnp.int32)
        branch_safe = jnp.where(act, mbr, 0)
        for n in range(N):
            hit = branch_safe == n
            child_age_m = jnp.where(hit, jnp.broadcast_to(
                age[n:n + 1, :], (M, TL)), child_age_m)
            fa_m = jnp.where(hit, jnp.broadcast_to(
                father[n:n + 1, :], (M, TL)), fa_m)
        fa_age_m = jnp.zeros((M, TL), dt)
        for n in range(N):
            fa_age_m = jnp.where(jnp.maximum(fa_m, 0) == n,
                                 jnp.broadcast_to(age[n:n + 1, :], (M, TL)),
                                 fa_age_m)
        for m in range(M):
            up_age = jnp.full((1, TL), _BIG, dt)
            up_src = jnp.zeros((1, TL), jnp.int32)
            dn_age = jnp.full((1, TL), -_BIG, dt)
            dn_tgt = jnp.zeros((1, TL), jnp.int32)
            a_m = mag_act[m:m + 1, :]
            for m2 in range(M):
                if m2 == m:
                    continue
                same = (act[m:m + 1, :] & act[m2:m2 + 1, :]
                        & (mbr[m:m + 1, :] == mbr[m2:m2 + 1, :]))
                a2 = mag_act[m2:m2 + 1, :]
                abv = same & ((a2 > a_m) | ((a2 == a_m) & (m2 > m)))
                blw = same & ((a2 < a_m) | ((a2 == a_m) & (m2 < m)))
                pick_up = abv & (a2 < up_age)
                up_age = jnp.where(pick_up, a2, up_age)
                up_src = jnp.where(pick_up, msrc[m2:m2 + 1, :], up_src)
                pick_dn = blw & (a2 > dn_age)
                dn_age = jnp.where(pick_dn, a2, dn_age)
                dn_tgt = jnp.where(pick_dn, mtgt[m2:m2 + 1, :], dn_tgt)
            mv_up = (checked[m:m + 1, :] & ~kind_out[m:m + 1, :]
                     & (new_mage[m:m + 1, :] > mag[m:m + 1, :]))
            mv_dn = (checked[m:m + 1, :] & kind_out[m:m + 1, :]
                     & (new_mage[m:m + 1, :] < mag[m:m + 1, :]))
            up_exists = up_age < big * 0.5
            dn_exists = dn_age > -big * 0.5
            if is_sample_age:
                up_exempt = up_src == pop
                dn_exempt = dn_tgt == pop
            else:
                up_exempt = ((up_src == pop) | (up_src == s0)
                             | (up_src == s1))
                dn_exempt = ((dn_tgt == pop) | (dn_tgt == s0)
                             | (dn_tgt == s1))
            c_m = (mv_up & up_exists & ~up_exempt
                   & (new_mage[m:m + 1, :] >= up_age))
            c_m = c_m | (mv_up & (fa_m[m:m + 1, :] >= 0)
                         & (new_mage[m:m + 1, :] >= fa_age_m[m:m + 1, :]))
            c_m = c_m | (mv_dn & dn_exists & ~dn_exempt
                         & (new_mage[m:m + 1, :] <= dn_age))
            c_m = c_m | (mv_dn
                         & (new_mage[m:m + 1, :] <= child_age_m[m:m + 1, :]))
            row_conf = window_conf[m:m + 1, :] | c_m
            conf_cnt = conf_cnt + jnp.where(row_conf & real, 1, 0)
        conf_out[:] = conf_cnt
        new_mag = jnp.where(act, new_mage, mag)
        _ = (trio_src, trio_tgt)  # parity markers (unused, as in XLA twin)
    else:
        ntj0_out[:] = ntj0_n
        ntj1_out[:] = ntj1_n
        conf_out[:] = jnp.zeros((1, TL), jnp.int32)
        new_mag = mag

    age_out[:] = new_age
    mag_out[:] = new_mag

    # ---- full conditional rebuild on the proposed ages ----
    cond_ref[:] = cond_in_ref[:]
    _full_rebuild(cond_ref, new_age, lson, rson, mut, nid, N, S, P, CPWP,
                  dt)
    lnld_out[:] = _root_lnld(cond_ref, root_ref[:], gid_ref, gcount_ref,
                             gnph_ref, pvalid_ref, N, P, CPWP, dt)

    # ---- genealogy prior from scratch on the proposed state ----
    # segment tables (proposed ages); the root's virtual edge is capped
    # at max(ages, band ends, taus) — exact, and avoids differencing
    # OLDAGE-magnitude values in f32 (ulp(999) = 6e-5; see
    # ops/coalstats.segments root_cap)
    cap = jnp.max(new_age, axis=0, keepdims=True)
    cap = jnp.maximum(cap, jnp.max(taunew_ref[:], axis=0, keepdims=True))
    if B > 0:
        cap = jnp.maximum(cap, jnp.max(ben_ref[:], axis=0, keepdims=True))
    top_rows = []
    for n in range(N):
        fa_n = father[n:n + 1, :]
        t_fa = _gather_rows(new_age, jnp.maximum(fa_n, 0), nid)
        top_rows.append(jnp.where(fa_n < 0, cap, t_fa))
    top = jnp.concatenate(top_rows, axis=0)
    fme = jnp.full((N, TL), _BIG, dt)
    for m2 in range(M):
        a2 = jnp.where(act[m2:m2 + 1, :], new_mag[m2:m2 + 1, :], big)
        fme = jnp.where(mbr[m2:m2 + 1, :] == nid,
                        jnp.minimum(fme, jnp.broadcast_to(a2, (N, TL))),
                        fme)
    seg_start = [new_age[n:n + 1, :] for n in range(N)]
    seg_end = [jnp.minimum(top[n:n + 1, :], fme[n:n + 1, :])
               for n in range(N)]
    seg_base = [npop[n:n + 1, :] for n in range(N)]
    seg_valid = [jnp.ones((1, TL), dt) for _ in range(N)]
    for m2 in range(M):
        a2 = jnp.where(act[m2:m2 + 1, :], new_mag[m2:m2 + 1, :], big)
        nxt = jnp.full((1, TL), _BIG, dt)
        for m3 in range(M):
            if m3 == m2:
                continue
            same = (act[m2:m2 + 1, :] & act[m3:m3 + 1, :]
                    & (mbr[m2:m2 + 1, :] == mbr[m3:m3 + 1, :]))
            a3 = jnp.where(act[m3:m3 + 1, :], new_mag[m3:m3 + 1, :], big)
            later = same & ((a3 > a2) | ((a3 == a2) & (m3 > m2)))
            nxt = jnp.where(later, jnp.minimum(nxt, a3), nxt)
        btop = _gather_rows(top, jnp.maximum(mbr[m2:m2 + 1, :], 0), nid)
        seg_start.append(jnp.where(act[m2:m2 + 1, :],
                                   new_mag[m2:m2 + 1, :], 0.0))
        seg_end.append(jnp.where(act[m2:m2 + 1, :],
                                 jnp.minimum(nxt, btop), 0.0))
        if B > 0:
            seg_base.append(msrc[m2:m2 + 1, :])
        else:
            seg_base.append(jnp.zeros((1, TL), jnp.int32))
        seg_valid.append(jnp.where(act[m2:m2 + 1, :],
                                   jnp.ones((), dt), 0.0))
    NSEG = N + M
    seg_start_b = jnp.concatenate(seg_start, axis=0)
    seg_end_b = jnp.concatenate(seg_end, axis=0)
    seg_base_b = jnp.concatenate(seg_base, axis=0)
    seg_valid_b = jnp.concatenate(seg_valid, axis=0)

    lnp = jnp.zeros((1, TL), dt)
    for r in range(PP):
        pres = jnp.zeros((NSEG, TL), dt)
        for q in range(PP):
            arq = anc_ref[r * PP + q:r * PP + q + 1, :]
            pres = pres + jnp.where(
                seg_base_b == q, jnp.broadcast_to(arq, (NSEG, TL)), 0.0)
        tau_r = taunew_ref[r:r + 1, :]
        pend_r = pendnew_ref[r:r + 1, :]
        lo = jnp.maximum(seg_start_b, tau_r)
        hi = jnp.minimum(seg_end_b, pend_r)
        present = (seg_valid_b > 0.5) & (pres > 0.5) & (hi > lo)
        lo_m = jnp.where(present, lo, 0.0)
        hi_m = jnp.where(present, jnp.maximum(hi, lo), 0.0)
        # pairwise-overlap coal stat: sum_{s != s'} |I_s ^ I_s'|
        coal = jnp.zeros((1, TL), dt)
        for s_ in range(NSEG):
            lo_s = lo_m[s_:s_ + 1, :]
            hi_s = hi_m[s_:s_ + 1, :]
            ov = jnp.maximum(jnp.minimum(hi_m, hi_s)
                             - jnp.maximum(lo_m, lo_s), 0.0)
            coal = coal + jnp.sum(ov, axis=0, keepdims=True)
        coal = coal - jnp.sum(hi_m - lo_m, axis=0, keepdims=True)
        ncoal = jnp.sum(jnp.where((npop == r) & internal,
                                  jnp.ones((), dt), 0.0), axis=0,
                        keepdims=True)
        th_r = theta_ref[r:r + 1, :]
        lnp = lnp + ncoal * jnp.log(2.0 / th_r) - coal / th_r
        # migration stats for bands targeting r
        for b_ in range(B):
            tgt_is_r = btgt_ref[b_:b_ + 1, :].astype(jnp.int32) == r
            lo_t = jnp.maximum(lo, bsn_ref[b_:b_ + 1, :])
            hi_t = jnp.minimum(hi, ben_ref[b_:b_ + 1, :])
            mig = jnp.sum(
                jnp.where(present & (hi_t > lo_t),
                          jnp.maximum(hi_t - lo_t, 0.0), 0.0),
                axis=0, keepdims=True)
            nmig = jnp.sum(jnp.where(act & (mbd == b_),
                                     jnp.ones((), dt), 0.0), axis=0,
                           keepdims=True)
            m_b = brate_ref[b_:b_ + 1, :]
            safe_m = jnp.where(m_b > 0.0, m_b, 1.0)
            lnp = lnp + jnp.where(
                (m_b > 0.0) & tgt_is_r,
                nmig * jnp.log(safe_m) - mig * m_b, 0.0)
    lnp_out[:] = jnp.where(real, lnp, 0.0)


def rubber_band_eval_pallas(gen: GenState, params: Params, seq: SeqData,
                            ctx: Context, pop: int, is_sample_age: bool,
                            taub0, taub1, tauold, taunew, cond,
                            *, tile: int = 0, interpret: bool = False):
    """Evaluate one rubber-band proposal with the fused kernel.

    Returns (age_prop [L,N], mag_prop [L,M], cond_prop, lnld_prop [L],
    lnp_prop [L], ntj0 [], ntj1 [], any_conflict []) — the same
    quantities kernels/tau._rubber_band_proposal derives, with the
    reductions done XLA-side (mesh psum points)."""
    L, N, P_pat, _ = cond.shape
    S = (N + 1) // 2
    M = gen.max_migs
    B = ctx.num_bands
    PP = ctx.num_pops
    dt = gen.age.dtype
    is_root = bool(pop == ctx.root_pop) and not is_sample_age

    cond_cl, CPWP = _cl_layout(cond)
    TL = tile or _pick_tile(N, CPWP)
    Lp = _round_up(L, TL)
    padL = Lp - L

    def padr(x, fill=0):
        if padL == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, padL)), constant_values=fill)

    def row(x, cast=None):
        v = x[None, :]
        return padr(v if cast is None else v.astype(cast))

    def mat(x, cast=None):
        v = x.T
        return padr(v if cast is None else v.astype(cast))

    def bcast(x, cast=None):
        v = jnp.broadcast_to(x[:, None], (x.shape[0], Lp))
        return v if cast is None else v.astype(cast)

    if is_sample_age:
        new_tau = params.tau
        sons = jnp.asarray([-9, -9], jnp.int32)
    else:
        new_tau = params.tau.at[pop].set(taunew)
        sons = ctx.pop_sons[pop]
    bs_new, be_new = band_windows(ctx, new_tau)
    pend_new = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage, dt),
                         new_tau[jnp.where(ctx.father_pop < 0, 0,
                                           ctx.father_pop)])
    anc = ctx.is_ancestral.astype(dt).reshape(PP * PP)

    scal = jnp.stack([
        jnp.asarray(pop, dt), sons[0].astype(dt), sons[1].astype(dt),
        jnp.asarray(taub0, dt), jnp.asarray(taub1, dt),
        jnp.asarray(tauold, dt), jnp.asarray(taunew, dt),
        jnp.zeros((), dt)]).reshape(8, 1)

    if B > 0:
        bsn_a, ben_a = bcast(bs_new.astype(dt)), bcast(be_new.astype(dt))
        br_a = bcast(params.mig_rate.astype(dt))
        bsrc = bcast(ctx.band_source, jnp.int32)
        btgt = bcast(ctx.band_target, jnp.int32)
    else:
        bsn_a = jnp.zeros((1, Lp), dt)
        ben_a = jnp.zeros((1, Lp), dt)
        br_a = jnp.zeros((1, Lp), dt)
        bsrc = jnp.full((1, Lp), -1, jnp.int32)
        btgt = jnp.full((1, Lp), -1, jnp.int32)

    args = (
        mat(gen.age), mat(gen.lson, jnp.int32), mat(gen.rson, jnp.int32),
        mat(gen.father, jnp.int32), row(gen.root, jnp.int32),
        mat(gen.node_pop, jnp.int32), row(gen.mut_rate),
        row(gen.valid, jnp.int32),
        mat(gen.mig_branch, jnp.int32), mat(gen.mig_band, jnp.int32),
        mat(gen.mig_age),
        bcast(params.theta.astype(dt)), bcast(new_tau.astype(dt)),
        bcast(pend_new), bcast(anc),
        bsn_a, ben_a, br_a, bsrc, btgt,
        mat(seq.group_id, jnp.int32), mat(seq.group_count.astype(dt)),
        mat(seq.group_nphases.astype(dt)),
        mat(seq.pattern_valid.astype(dt)),
        padr(cond_cl),
    )
    grid = (Lp // TL,)

    def vspec(r):
        return pl.BlockSpec((r, TL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sspec = pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [sspec] + [vspec(a.shape[0]) for a in args]
    out_shape = (
        jax.ShapeDtypeStruct((N * CPWP, Lp), dt),   # cond_prop
        jax.ShapeDtypeStruct((N, Lp), dt),          # age_prop
        jax.ShapeDtypeStruct((M, Lp), dt),          # mag_prop
        jax.ShapeDtypeStruct((1, Lp), dt),          # lnld_prop
        jax.ShapeDtypeStruct((1, Lp), dt),          # lnp_prop
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # ntj0
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # ntj1
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # conflict
    )
    out_specs = tuple(vspec(s.shape[0]) for s in out_shape)

    kernel = functools.partial(
        _rubber_kernel, N=N, S=S, M=M, B=B, P=P_pat, PP=PP, CPWP=CPWP,
        is_sample_age=bool(is_sample_age), is_root=is_root,
        oldage=ctx.oldage)
    (cond_o, age_o, mag_o, lnld_o, lnp_o, ntj0_o, ntj1_o, conf_o) = \
        pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(scal, *args)

    age_prop = age_o[:, :L].T
    mag_prop = jnp.where(gen.mig_branch >= 0, mag_o[:, :L].T, gen.mig_age)
    cond_prop = _cl_unlayout(cond_o[:, :L], L, N, P_pat, CPWP)
    lnld_prop = lnld_o[0, :L]
    lnp_prop = lnp_o[0, :L]
    valid = gen.valid
    ntj0 = jnp.sum(jnp.where(valid, ntj0_o[0, :L], 0), dtype=jnp.int32)
    ntj1 = jnp.sum(jnp.where(valid, ntj1_o[0, :L], 0), dtype=jnp.int32)
    any_conflict = jnp.sum(conf_o[0, :L], dtype=jnp.int32) > 0
    return (age_prop, mag_prop, cond_prop, lnld_prop, lnp_prop,
            ntj0.astype(dt), ntj1.astype(dt), any_conflict)


# --------------------------------------------------------------------------
# Kernel 2: full SPR-with-migration sweep (UpdateGB_MigSPR)
# --------------------------------------------------------------------------

def _shift_rows_down(x, s, fill):
    """Rows shifted down by s (row k reads row k-s); top s rows = fill."""
    if s == 0:
        return x
    K = x.shape[0]
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([pad, x[:K - s]], axis=0)


def _shift_rows_up(x, s, fill):
    if s == 0:
        return x
    K = x.shape[0]
    pad = jnp.full((s, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([x[s:], pad], axis=0)


def _bitonic_sort_rows(x):
    """Ascending bitonic sort along axis 0 of [KP, TL] (KP a power of 2).

    O(log^2 KP) whole-array stages — the Mosaic program size no longer
    grows with the row count (the round-3 odd-even transposition network
    unrolled K^2/2 per-row compare-exchanges, the main term of the fused
    SPR kernel's ~O(N^2) compile blowup; docs/DESIGN.md sample-axis
    ledger).  Partner rows (index XOR j) are fetched with static-shift
    concatenates: for (i & j) == 0 the partner is i + j (shift up),
    else i - j (shift down).  Sorted VALUES are what flows downstream,
    so any correct network is bitwise-equivalent."""
    KP, TL = x.shape
    kio = lax.broadcasted_iota(jnp.int32, (KP, TL), 0)
    k = 2
    while k <= KP:
        j = k // 2
        while j >= 1:
            low = (kio & j) == 0
            pv = jnp.where(low, _shift_rows_up(x, j, _BIG),
                           _shift_rows_down(x, j, -_BIG))
            up = (kio & k) == 0
            take_min = low == up
            x = jnp.where(take_min, jnp.minimum(x, pv), jnp.maximum(x, pv))
            j //= 2
        k *= 2
    return x


def _prefix_rows_incl_int(x):
    """Inclusive prefix sum along axis 0 (integer: exact under any
    association, so the log-depth tree is bitwise-safe)."""
    K = x.shape[0]
    s = 1
    while s < K:
        x = x + _shift_rows_down(x, s, 0)
        s *= 2
    return x


def _spr_kernel(ctr_ref,
                age_ref, lson_ref, rson_ref, father_ref, root_ref,
                pop_ref, mbr_ref, mbd_ref, mag_ref,
                mut_ref, anc_ref, theta_ref, tau_ref, pend_ref,
                bs_ref, be_ref, brate_ref, bsrc_ref, btgt_ref,
                gid_ref, gcount_ref, gnph_ref, pvalid_ref,
                key_ref, real_ref, lnld_ref, cond_in_ref,
                # outputs
                cond_ref, age_out, lson_out, rson_out, father_out,
                root_out, pop_out, mbr_out, mbd_out, mag_out,
                lnld_out, acc_ref, used_ref,
                # scratch
                prop_ref,
                *, N, S, M, B, P, PP, CPWP, oldage):
    """One loci tile, full SPR sweep.  PP = number of populations.

    Hazard-inversion re-coalescence walk (twin of kernels/spr.py
    _simulate_reconnect, itself the tensor twin of reference traceLineage
    src/patch.c:886-1331), one-hot commit (_apply_spr twin of
    src/GPhoCS.c:2716-2830 / replaceMigNodes patch.c:1343), two-path
    conditional refresh (f's new position, then the old grandfather — the
    LCA argument makes two sequential root paths exact), and the
    data-likelihood-only MH select (src/GPhoCS.c:2702-2714).
    """
    dt = age_ref.dtype
    TL = age_ref.shape[1]
    nid = lax.broadcasted_iota(jnp.int32, (N, TL), 0)
    mid_i = lax.broadcasted_iota(jnp.int32, (M, TL), 0)
    K = N + M + PP + 2 * B + 1

    cond_ref[:] = cond_in_ref[:]
    age_out[:] = age_ref[:]
    lson_out[:] = lson_ref[:]
    rson_out[:] = rson_ref[:]
    father_out[:] = father_ref[:]
    root_out[:] = root_ref[:]
    pop_out[:] = pop_ref[:]
    mbr_out[:] = mbr_ref[:]
    mbd_out[:] = mbd_ref[:]
    mag_out[:] = mag_ref[:]
    lnld_out[:] = lnld_ref[:]
    acc_ref[:] = jnp.zeros((1, TL), jnp.int32)

    key = key_ref[:]
    ctr0 = ctr_ref[0, 0]
    mut = mut_ref[:]
    real = real_ref[:] > 0
    theta = theta_ref[:]                     # [PP, TL]
    tau = tau_ref[:]
    pend = pend_ref[:]
    pid = lax.broadcasted_iota(jnp.int32, (PP, TL), 0)
    oa = jnp.asarray(oldage, dt)
    big = jnp.asarray(_BIG, dt)

    def anc_row_of(p_idx):
        """[PP, TL] bool: anc[p_idx[l], q] for q rows (selected by one-hot)."""
        out = []
        for q in range(PP):
            acc = jnp.zeros((1, TL), dt)
            for p_ in range(PP):
                acc = acc + jnp.where(p_idx == p_,
                                      anc_ref[p_ * PP + q:p_ * PP + q + 1, :],
                                      0.0)
            out.append(acc)
        return jnp.concatenate(out, axis=0)  # [PP, TL] 0/1 float

    def node_step(i, off):
        node = jnp.full((1, TL), i, jnp.int32)
        age = age_out[:]
        lson = lson_out[:].astype(jnp.int32)
        rson = rson_out[:].astype(jnp.int32)
        father = father_out[:].astype(jnp.int32)
        root = root_out[:].astype(jnp.int32)
        npop = pop_out[:].astype(jnp.int32)
        mbr = mbr_out[:].astype(jnp.int32)
        mbd = mbd_out[:].astype(jnp.int32)
        mag = mag_out[:]
        active0 = (root != i) & real

        act = mbr >= 0                                       # [M, TL]
        on_pruned = act & (mbr == i)
        base_migs = jnp.sum(jnp.where(on_pruned, 0,
                                      act.astype(jnp.int32)),
                            axis=0, keepdims=True)           # [1, TL]

        fa_of_node = _gather_rows(father, node, nid).astype(jnp.int32)
        start_pop = _gather_rows(npop, node, nid).astype(jnp.int32)
        start_age = _gather_rows(age, node, nid)

        # edge tops (root edge extends to OLDAGE)
        top_rows = []
        for n in range(N):
            fa_n = father[n:n + 1, :]
            t_fa = _gather_rows(age, jnp.maximum(fa_n, 0), nid)
            top_rows.append(jnp.where(fa_n < 0, oa, t_fa))
        top = jnp.concatenate(top_rows, axis=0)              # [N, TL]

        # per-mig-slot static data
        mag_act = jnp.where(act, mag, big)
        # next mig above on the same branch (age ties by slot id)
        nxt_rows = []
        bt_rows = []
        sp_rows = []
        bp_rows = []
        for m in range(M):
            a_m = mag_act[m:m + 1, :]
            best = jnp.full((1, TL), _BIG, dt)
            for m2 in range(M):
                if m2 == m:
                    continue
                same = (act[m:m + 1, :] & act[m2:m2 + 1, :]
                        & (mbr[m:m + 1, :] == mbr[m2:m2 + 1, :]))
                a2 = mag_act[m2:m2 + 1, :]
                later = same & ((a2 > a_m) | ((a2 == a_m) & (m2 > m)))
                best = jnp.where(later, jnp.minimum(best, a2), best)
            nxt_rows.append(best)
            br_m = jnp.maximum(mbr[m:m + 1, :], 0)
            bt_rows.append(_gather_rows(top, br_m, nid))
            band_m = jnp.maximum(mbd[m:m + 1, :], 0)
            if B > 0:
                sp_rows.append(_gather_rows(
                    bsrc_ref[:], band_m,
                    lax.broadcasted_iota(jnp.int32, (B, TL), 0)
                ).astype(jnp.int32))
            else:
                sp_rows.append(jnp.zeros((1, TL), jnp.int32))
            bp_rows.append(_gather_rows(npop, br_m, nid).astype(jnp.int32))
        if M > 0:
            mnext = jnp.concatenate(nxt_rows, axis=0)        # [M, TL]
            btop = jnp.concatenate(bt_rows, axis=0)
            win_hi = jnp.minimum(mnext, btop)
            src_pop_m = jnp.concatenate(sp_rows, axis=0)
            branch_pop_m = jnp.concatenate(bp_rows, axis=0)

        # ---- segment grid (sorted boundaries + per-segment tables) ----
        bnd_parts = [age, jnp.where(act, mag, jnp.zeros((), dt)),
                     jnp.broadcast_to(tau, (PP, TL))]
        if B > 0:
            bnd_parts.append(jnp.broadcast_to(bs_ref[:], (B, TL)))
            bnd_parts.append(jnp.broadcast_to(be_ref[:], (B, TL)))
        bnd_parts.append(jnp.full((1, TL), oa, dt))
        bnd2 = jnp.concatenate(bnd_parts, axis=0)            # [K, TL]
        KP = 1
        while KP < K:
            KP *= 2
        if KP > K:
            bnd2 = jnp.concatenate(
                [bnd2, jnp.full((KP - K, TL), _BIG, dt)], axis=0)
        b_sorted = _bitonic_sort_rows(bnd2)[:K]              # [K, TL] asc
        lo_base = _shift_rows_down(b_sorted, 1, jnp.zeros((), dt))
        mids = 0.5 * (lo_base + b_sorted)

        # lineage counts per (segment, base pop), excluding the pruned edge
        nbase = [jnp.zeros((K, TL), dt) for _ in range(PP)]
        for n in range(N):
            a_n = ((age[n:n + 1, :] <= mids) & (mids < top[n:n + 1, :])
                   & (i != n))
            for q in range(PP):
                nbase[q] = nbase[q] + jnp.where(
                    a_n & (npop[n:n + 1, :] == q), 1.0, 0.0)
        if M > 0 and B > 0:
            for m in range(M):
                in_w = (act[m:m + 1, :]
                        & (mag[m:m + 1, :] <= mids)
                        & (mids < win_hi[m:m + 1, :]))
                br_m = mbr[m:m + 1, :]
                # branch-alive via two gathers instead of an N-row scan
                brs = jnp.maximum(br_m, 0)
                age_br = _gather_rows(age, brs, nid)
                top_br = _gather_rows(top, brs, nid)
                b_alive = ((age_br <= mids) & (mids < top_br)
                           & (br_m != i) & (br_m >= 0))
                w = in_w & b_alive
                for q in range(PP):
                    nbase[q] = nbase[q] + jnp.where(
                        w & (src_pop_m[m:m + 1, :] == q), 1.0, 0.0) \
                        - jnp.where(w & (branch_pop_m[m:m + 1, :] == q),
                                    1.0, 0.0)
        # n_all[p] = sum_q anc[p, q] nbase[q]
        n_all = []
        migr_all = []
        inwin = []
        for p_ in range(PP):
            acc = jnp.zeros((K, TL), dt)
            for q in range(PP):
                acc = acc + anc_ref[p_ * PP + q:p_ * PP + q + 1, :] * nbase[q]
            n_all.append(acc)
            inwin.append((tau[p_:p_ + 1, :] <= mids)
                         & (mids < pend[p_:p_ + 1, :]))
            mr = jnp.zeros((K, TL), dt)
            for b_ in range(B):
                live = ((bs_ref[b_:b_ + 1, :] <= mids)
                        & (be_ref[b_:b_ + 1, :] > mids))
                mr = mr + jnp.where(
                    live & (btgt_ref[b_:b_ + 1, :] == p_),
                    brate_ref[b_:b_ + 1, :], 0.0)
            migr_all.append(mr)

        # ---- the walk (while any lane is still running) ----
        def trip_cond(st):
            (status, _pop, _age, _nn, _nb, _na, _tg, _ca, _off, trips) = st
            return (jnp.max(jnp.where(status == 0, 1, 0)) > 0) & (
                trips < M + 3)

        def trip_body(st):
            (status, pop_c, age_c, n_new, new_band, new_age, target,
             coal_age, doff, trips) = st
            alive = status == 0
            lo = jnp.maximum(lo_base, age_c)
            hi = jnp.maximum(b_sorted, age_c)
            seg_len = jnp.maximum(hi - lo, 0.0)
            # onpath over pops along the current pop's ancestor chain
            pop_oh = [(pop_c == q) for q in range(PP)]
            onpath = []
            for p_ in range(PP):
                acc = jnp.zeros((1, TL), dt)
                for q in range(PP):
                    acc = acc + jnp.where(
                        pop_oh[q], anc_ref[p_ * PP + q:p_ * PP + q + 1, :],
                        0.0)
                onpath.append(acc > 0.5)
            n_seg = jnp.zeros((K, TL), dt)
            mig_seg = jnp.zeros((K, TL), dt)
            ith_seg = jnp.zeros((K, TL), dt)
            onany = jnp.zeros((K, TL), jnp.bool_)
            for p_ in range(PP):
                hit = onpath[p_] & inwin[p_]
                n_seg = n_seg + jnp.where(hit, n_all[p_], 0.0)
                mig_seg = mig_seg + jnp.where(hit, migr_all[p_], 0.0)
                ith_seg = ith_seg + jnp.where(hit,
                                              1.0 / theta[p_:p_ + 1, :], 0.0)
                onany = onany | hit
            rate = jnp.where(onany, mig_seg + 2.0 * n_seg * ith_seg, 0.0)
            hz = rate * seg_len
            # log-depth EXCLUSIVE prefix over the K segment rows,
            # additions only: deriving the exclusive prefix as
            # cum_k - hz_k cancels catastrophically when hz_k is huge
            # (the [root age, OLDAGE] segment; the round-3 GOLDEN_FUSED
            # f32 bias).  The XLA twin (kernels/spr.py) uses the
            # IDENTICAL shift-add association so the paths stay
            # draw-for-draw bitwise equal.
            ecum = _shift_rows_down(hz, 1, jnp.zeros((), dt))
            s_ = 1
            while s_ < K:
                ecum = ecum + _shift_rows_down(ecum, s_, jnp.zeros((), dt))
                s_ *= 2
            cum = ecum + hz

            u1 = _uniform(key, ctr0, doff + 1, dt)
            E = -jnp.log(jnp.maximum(u1, jnp.asarray(1e-30, dt)))
            reached = cum >= E
            kio = lax.broadcasted_iota(jnp.int32, (K, TL), 0)
            k_idx = jnp.min(jnp.where(reached, kio, K), axis=0,
                            keepdims=True)
            exits = k_idx == K
            ksafe = jnp.minimum(k_idx, K - 1)
            koh = kio == ksafe
            prev_cum = jnp.sum(jnp.where(koh, ecum, 0.0), axis=0,
                               keepdims=True)
            rate_k = jnp.sum(jnp.where(koh, rate, 0.0), axis=0,
                             keepdims=True)
            lo_k = jnp.sum(jnp.where(koh, lo, 0.0), axis=0, keepdims=True)
            hi_k = jnp.sum(jnp.where(koh, hi, 0.0), axis=0, keepdims=True)
            mig_k = jnp.sum(jnp.where(koh, mig_seg, 0.0), axis=0,
                            keepdims=True)
            n_k = jnp.sum(jnp.where(koh, n_seg, 0.0), axis=0, keepdims=True)
            t_event = lo_k + (E - prev_cum) / jnp.maximum(
                rate_k, jnp.asarray(1e-30, dt))
            t_event = jnp.clip(t_event, lo_k, hi_k)
            # pop of the event segment
            pop_k = jnp.zeros((1, TL), jnp.int32)
            theta_k = jnp.zeros((1, TL), dt)
            for p_ in range(PP):
                w_p = jnp.sum(jnp.where(koh & onpath[p_] & inwin[p_],
                                        1.0, 0.0), axis=0, keepdims=True)
                pop_k = jnp.where(w_p > 0.5, p_, pop_k)
                theta_k = jnp.where(w_p > 0.5, theta[p_:p_ + 1, :], theta_k)

            ev_mask = alive & ~exits
            u2 = _uniform(key, ctr0, doff + 2, dt)
            esample = u2 * rate_k
            is_mig = ev_mask & (esample < mig_k) & (B > 0)
            over_cap = is_mig & (base_migs + n_new + 1 > M)

            if B > 0:
                cumb = jnp.zeros((1, TL), dt)
                chosen = jnp.zeros((1, TL), jnp.int32)
                found = jnp.zeros((1, TL), jnp.bool_)
                src_pop = jnp.zeros((1, TL), jnp.int32)
                for b_ in range(B):
                    live = ((btgt_ref[b_:b_ + 1, :] == pop_k)
                            & (bs_ref[b_:b_ + 1, :] <= t_event)
                            & (be_ref[b_:b_ + 1, :] > t_event))
                    cumb = cumb + jnp.where(live, brate_ref[b_:b_ + 1, :],
                                            0.0)
                    pick = live & (cumb > esample) & ~found
                    chosen = jnp.where(pick, b_, chosen)
                    src_pop = jnp.where(
                        pick, bsrc_ref[b_:b_ + 1, :].astype(jnp.int32),
                        src_pop)
                    found = found | pick
            else:
                chosen = jnp.zeros((1, TL), jnp.int32)
                src_pop = pop_c

            do_mig = is_mig & ~over_cap
            slot = jnp.clip(n_new, 0, M - 1)
            put = do_mig & (mid_i == slot)
            new_band = jnp.where(put, jnp.broadcast_to(chosen, (M, TL)),
                                 new_band)
            new_age = jnp.where(put, jnp.broadcast_to(t_event, (M, TL)),
                                new_age)
            n_new = n_new + jnp.where(do_mig, 1, 0)

            # coalescence: i_pick-th covering branch in node-id order
            is_coal = ev_mask & ~is_mig
            i_pick = jnp.floor((esample - mig_k) * theta_k / 2.0
                               ).astype(jnp.int32)
            i_pick = jnp.clip(i_pick, 0,
                              jnp.maximum(n_k.astype(jnp.int32) - 1, 0))
            anc_k = anc_row_of(pop_k)                        # [PP, TL]
            # trajectory pop of every branch at t_event ([N, TL]; O(M)
            # program instead of the round-3 N x M per-row scan)
            traj = npop
            for m in range(M):
                on_m = (act[m:m + 1, :] & (mbr[m:m + 1, :] == nid)
                        & (mag[m:m + 1, :] <= t_event)
                        & (t_event < win_hi[m:m + 1, :]))
                traj = jnp.where(on_m, src_pop_m[m:m + 1, :], traj)
            inp = jnp.zeros((N, TL), jnp.bool_)
            for q in range(PP):
                inp = inp | ((traj == q) & (anc_k[q:q + 1, :] > 0.5))
            a_all = (age <= t_event) & (t_event < top) & (nid != i)
            cov = a_all & inp                                # [N, TL]
            csum = _prefix_rows_incl_int(cov.astype(jnp.int32))
            hit = cov & (csum > i_pick)
            # first covering branch in node-id order (csum nondecreasing)
            tgt = jnp.min(jnp.where(hit, nid, N), axis=0, keepdims=True)
            tgt = jnp.where(tgt == N, 0, tgt)
            coal_ok = is_coal & (n_k > 0.5)

            status = jnp.where(alive & exits, -1, status)
            status = jnp.where(over_cap, -1, status)
            status = jnp.where(coal_ok, 1, status)
            status = jnp.where(is_coal & (n_k <= 0.5), -1, status)
            pop_c = jnp.where(do_mig, src_pop, pop_c)
            pop_c = jnp.where(coal_ok, pop_k, pop_c)
            age_c = jnp.where(do_mig, t_event, age_c)
            target = jnp.where(coal_ok, tgt, target)
            coal_age = jnp.where(coal_ok, t_event, coal_age)
            return (status, pop_c, age_c, n_new, new_band, new_age, target,
                    coal_age, doff + 2, trips + 1)

        st0 = (jnp.where(active0, 0, -2).astype(jnp.int32),
               start_pop, start_age,
               jnp.zeros((1, TL), jnp.int32),
               jnp.zeros((M, TL), jnp.int32),
               jnp.zeros((M, TL), dt),
               jnp.zeros((1, TL), jnp.int32),
               jnp.zeros((1, TL), dt),
               off, jnp.zeros((), jnp.int32))
        (status, sim_pop, _sa, n_new, new_band, new_age, target, coal_age,
         doff, _tr) = lax.while_loop(trip_cond, trip_body, st0)
        ok = status == 1

        # ---- commit (proposed values; _apply_spr twin) ----
        f = fa_of_node
        f_safe = jnp.maximum(f, 0)
        sib = (_gather_rows(lson, f_safe, nid)
               + _gather_rows(rson, f_safe, nid) - i).astype(jnp.int32)
        g = _gather_rows(father, f_safe, nid).astype(jnp.int32)
        t_new = coal_age
        tgt_fa = _gather_rows(father, target, nid).astype(jnp.int32)
        tc = ok & (target != sib) & (target != f)

        is_f = nid == f
        is_sib = nid == sib
        is_g = (nid == g) & (g >= 0)
        is_tgt = nid == target
        is_tf = (nid == tgt_fa) & (tgt_fa >= 0)

        age_p = jnp.where(ok & is_f, jnp.broadcast_to(t_new, (N, TL)), age)
        pop_p = jnp.where(ok & is_f, jnp.broadcast_to(sim_pop, (N, TL)),
                          npop)
        father_p = jnp.where(tc & is_sib, jnp.broadcast_to(g, (N, TL)),
                             father)
        father_p = jnp.where(tc & is_f, jnp.broadcast_to(tgt_fa, (N, TL)),
                             father_p)
        father_p = jnp.where(tc & is_tgt, jnp.broadcast_to(f, (N, TL)),
                             father_p)
        lson_p = jnp.where(tc & is_g & (lson == f),
                           jnp.broadcast_to(sib, (N, TL)), lson)
        lson1 = jnp.where(tc & is_f, jnp.broadcast_to(node, (N, TL)),
                          lson_p)
        lson_p = jnp.where(tc & is_tf & (lson1 == target),
                           jnp.broadcast_to(f, (N, TL)), lson1)
        rson_p = jnp.where(tc & is_g & (rson == f),
                           jnp.broadcast_to(sib, (N, TL)), rson)
        rson1 = jnp.where(tc & is_f, jnp.broadcast_to(target, (N, TL)),
                          rson_p)
        rson_p = jnp.where(tc & is_tf & (rson1 == target),
                           jnp.broadcast_to(f, (N, TL)), rson1)
        root_p = jnp.where(tc & (tgt_fa < 0), f,
                           jnp.where(tc & (g < 0), sib, root))

        keep = act & ~(ok & (mbr == i))
        mb2 = jnp.where(ok & (mbr == f), jnp.broadcast_to(sib, (M, TL)),
                        mbr)
        t_eff = jnp.where(target == f, sib, target)
        mb2 = jnp.where(ok & (mb2 == t_eff) & (mag >= t_new),
                        jnp.broadcast_to(f, (M, TL)), mb2)
        mbr_p = jnp.where(keep, mb2, -1)
        mbd_p = jnp.where(keep, mbd, 0)
        mag_p = jnp.where(keep, mag, 0.0)
        free = mbr_p < 0
        rrows = []
        racc = jnp.zeros((1, TL), jnp.int32)
        for m in range(M):
            racc = racc + jnp.where(free[m:m + 1, :], 1, 0)
            rrows.append(racc)
        rank = jnp.concatenate(rrows, axis=0) - 1
        recv = ok & free & (rank < n_new)
        mbr_p = jnp.where(recv, jnp.broadcast_to(node, (M, TL)), mbr_p)
        nb_sel = jnp.zeros((M, TL), jnp.int32)
        na_sel = jnp.zeros((M, TL), dt)
        for j in range(M):
            rj = rank == j
            nb_sel = jnp.where(rj, jnp.broadcast_to(new_band[j:j + 1, :],
                                                    (M, TL)), nb_sel)
            na_sel = jnp.where(rj, jnp.broadcast_to(new_age[j:j + 1, :],
                                                    (M, TL)), na_sel)
        mbd_p = jnp.where(recv, nb_sel, mbd_p)
        mag_p = jnp.where(recv, na_sel, mag_p)

        # ---- data delta: two-path refresh on the proposed state ----
        prop_ref[:] = cond_ref[:]
        start1 = jnp.where(active0, f, -1)
        _refresh_path(prop_ref, age_p, lson_p, rson_p, father_p, mut,
                      start1, nid, N, S, P, CPWP, dt)
        start2 = jnp.where(active0 & (g >= 0), g, -1)
        _refresh_path(prop_ref, age_p, lson_p, rson_p, father_p, mut,
                      start2, nid, N, S, P, CPWP, dt)
        lnld_new = _root_lnld(prop_ref, root_p, gid_ref, gcount_ref,
                              gnph_ref, pvalid_ref, N, P, CPWP, dt)
        lnld_old = lnld_out[:]
        lnacc = lnld_new - lnld_old

        u = _uniform(key, ctr0, doff + 1, dt)
        accept = ok & ((lnacc >= 0.0)
                       | (u < jnp.exp(jnp.minimum(lnacc, 0.0))))

        accN = jnp.broadcast_to(accept, (N, TL))
        accM = jnp.broadcast_to(accept, (M, TL))
        age_out[:] = jnp.where(accN, age_p, age)
        lson_out[:] = jnp.where(accN, lson_p, lson)
        rson_out[:] = jnp.where(accN, rson_p, rson)
        father_out[:] = jnp.where(accN, father_p, father)
        pop_out[:] = jnp.where(accN, pop_p, npop)
        root_out[:] = jnp.where(accept, root_p, root)
        mbr_out[:] = jnp.where(accM, mbr_p, mbr)
        mbd_out[:] = jnp.where(accM, mbd_p, mbd)
        mag_out[:] = jnp.where(accM, mag_p, mag)
        cond_ref[:] = jnp.where(jnp.broadcast_to(accept, cond_ref.shape),
                                prop_ref[:], cond_ref[:])
        lnld_out[:] = jnp.where(accept, lnld_new, lnld_old)
        acc_ref[:] = acc_ref[:] + jnp.where(accept, 1, 0).astype(jnp.int32)
        return doff + 1

    used = lax.fori_loop(0, N, node_step, jnp.zeros((), jnp.int32))
    used_ref[:] = jnp.broadcast_to(used, (1, TL)).astype(jnp.int32)


def spr_sweep_pallas(gen: GenState, params: Params, seq: SeqData,
                     rng: FastRngState, ctx: Context, lnld, cond,
                     *, tile: int = 0, interpret: bool = False,
                     loci_axis=None):
    """Drop-in fused twin of kernels/spr.update_spr for fast-RNG mode
    (no admixture).  Returns (gen, rng, lnld, cond, acc).

    RNG consumption: 2 draws per walk trip + 1 MH draw per node step,
    where the trip count is the per-tile max (lanes in the same tile stay
    counter-synchronized; the returned state advances the shared counter
    by the max consumption over tiles — skipped counter values are never
    reused, so streams stay fresh).  The XLA twin's consumption differs
    only in that its trip synchronization is global over all loci.
    """
    L, N, P_pat, _ = cond.shape
    S = (N + 1) // 2
    M = gen.max_migs
    B = ctx.num_bands
    PP = ctx.num_pops
    dt = gen.age.dtype

    cond_cl, CPWP = _cl_layout(cond)
    TL = tile or _pick_tile(N, CPWP)
    Lp = _round_up(L, TL)
    padL = Lp - L

    def padr(x, fill=0):
        if padL == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, padL)), constant_values=fill)

    def row(x, cast=None):
        v = x[None, :]
        return padr(v if cast is None else v.astype(cast))

    def mat(x, cast=None):
        v = x.T
        return padr(v if cast is None else v.astype(cast))

    def bcast(x, cast=None):
        v = jnp.broadcast_to(x[:, None], (x.shape[0], Lp))
        return v if cast is None else v.astype(cast)

    pend = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage, dt),
                     params.tau[jnp.where(ctx.father_pop < 0, 0,
                                          ctx.father_pop)])
    anc = ctx.is_ancestral.astype(dt).reshape(PP * PP)
    bs, be = band_windows(ctx, params.tau)
    if B > 0:
        bs_a, be_a = bcast(bs.astype(dt)), bcast(be.astype(dt))
        br_a = bcast(params.mig_rate.astype(dt))
        bsrc = bcast(ctx.band_source, jnp.int32)
        btgt = bcast(ctx.band_target, jnp.int32)
    else:
        bs_a = jnp.zeros((1, Lp), dt)
        be_a = jnp.zeros((1, Lp), dt)
        br_a = jnp.zeros((1, Lp), dt)
        bsrc = jnp.full((1, Lp), -1, jnp.int32)
        btgt = jnp.full((1, Lp), -1, jnp.int32)

    args = (
        mat(gen.age), mat(gen.lson, jnp.int32), mat(gen.rson, jnp.int32),
        mat(gen.father, jnp.int32), row(gen.root, jnp.int32),
        mat(gen.node_pop, jnp.int32),
        mat(gen.mig_branch, jnp.int32), mat(gen.mig_band, jnp.int32),
        mat(gen.mig_age),
        row(gen.mut_rate), bcast(anc), bcast(params.theta.astype(dt)),
        bcast(params.tau.astype(dt)), bcast(pend),
        bs_a, be_a, br_a, bsrc, btgt,
        mat(seq.group_id, jnp.int32), mat(seq.group_count.astype(dt)),
        mat(seq.group_nphases.astype(dt)),
        mat(seq.pattern_valid.astype(dt)),
        row(rng.key[:L], jnp.uint32),
        row(gen.valid, jnp.int32),
        row(lnld),
        padr(cond_cl),
    )
    ctr = jnp.asarray(rng.ctr, jnp.uint32).reshape(1, 1)
    grid = (Lp // TL,)

    def vspec(r):
        return pl.BlockSpec((r, TL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [sspec] + [vspec(a.shape[0]) for a in args]
    out_shape = (
        jax.ShapeDtypeStruct((N * CPWP, Lp), dt),   # cond
        jax.ShapeDtypeStruct((N, Lp), dt),          # age
        jax.ShapeDtypeStruct((N, Lp), jnp.int32),   # lson
        jax.ShapeDtypeStruct((N, Lp), jnp.int32),   # rson
        jax.ShapeDtypeStruct((N, Lp), jnp.int32),   # father
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # root
        jax.ShapeDtypeStruct((N, Lp), jnp.int32),   # node_pop
        jax.ShapeDtypeStruct((M, Lp), jnp.int32),   # mig_branch
        jax.ShapeDtypeStruct((M, Lp), jnp.int32),   # mig_band
        jax.ShapeDtypeStruct((M, Lp), dt),          # mig_age
        jax.ShapeDtypeStruct((1, Lp), dt),          # lnld
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # acc
        jax.ShapeDtypeStruct((1, Lp), jnp.int32),   # used draws
    )
    out_specs = tuple(vspec(s.shape[0]) for s in out_shape)

    kernel = functools.partial(
        _spr_kernel, N=N, S=S, M=M, B=B, P=P_pat, PP=PP, CPWP=CPWP,
        oldage=ctx.oldage)
    (cond_o, age_o, ls_o, rs_o, fa_o, root_o, pop_o, mbr_o, mbd_o, mag_o,
     lnld_o, acc_o, used_o) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N * CPWP, TL), dt)],
        interpret=interpret,
    )(ctr, *args)

    gen = gen._replace(
        age=age_o[:, :L].T, lson=ls_o[:, :L].T, rson=rs_o[:, :L].T,
        father=fa_o[:, :L].T, root=root_o[0, :L], node_pop=pop_o[:, :L].T,
        mig_branch=mbr_o[:, :L].T, mig_band=mbd_o[:, :L].T,
        mig_age=mag_o[:, :L].T)
    cond_new = _cl_unlayout(cond_o[:, :L], L, N, P_pat, CPWP)
    lnld_new = lnld_o[0, :L]
    acc = jnp.sum(acc_o[0, :L], dtype=jnp.int32)
    used = jnp.max(used_o[0, :]).astype(jnp.uint32)
    if loci_axis is not None:
        # shards advance the shared counter identically (draw positions
        # already consumed by any shard are never reused)
        used = lax.pmax(used, loci_axis)
    rng = rng._replace(ctr=rng.ctr + used)
    return gen, rng, lnld_new, cond_new, acc
