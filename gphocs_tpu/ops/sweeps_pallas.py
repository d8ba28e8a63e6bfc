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
    """JC pruning combine for one node from its two son blocks."""
    fa = pa * _sum4(ca, P, CPWP) + (1.0 - 4.0 * pa) * ca
    fb = pb * _sum4(cb, P, CPWP) + (1.0 - 4.0 * pb) * cb
    return fa * fb


def _refresh_path(cond_ref, age_ref, lson_ref, rson_ref, father_ref,
                  mut, start, nid, N, S, P, CPWP, dt):
    """Recompute conditionals along the path start -> root inside cond_ref.

    start: [1, TL] int32 (or -1 to skip the lane).  Exactly S-1 masked
    steps: every root path has <= S-1 internal nodes.  age_ref holds the
    PROPOSED ages.  Writes in place.
    """
    TL = cond_ref.shape[1]

    def step(cur):
        act = cur >= 0
        ls = _gather_rows(lson_ref[:], cur, nid).astype(jnp.int32)
        rs = _gather_rows(rson_ref[:], cur, nid).astype(jnp.int32)
        t_c = _gather_rows(age_ref[:], cur, nid)
        pa = _edge_p(mut * (t_c - _gather_rows(age_ref[:], ls, nid)), dt)
        pb = _edge_p(mut * (t_c - _gather_rows(age_ref[:], rs, nid)), dt)
        ca = _son_block(cond_ref, ls, N, CPWP, dt)
        cb = _son_block(cond_ref, rs, N, CPWP, dt)
        blk = _combine_block(ca, cb, pa, pb, P, CPWP)
        for n in range(S, N):
            m = act & (cur == n)
            cond_ref[n * CPWP:(n + 1) * CPWP, :] = jnp.where(
                m, blk, cond_ref[n * CPWP:(n + 1) * CPWP, :])
        nxt = _gather_rows(father_ref[:], cur, nid).astype(jnp.int32)
        return jnp.where(act, nxt, cur)

    cur = start
    for _ in range(S - 1):
        cur = step(cur)


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
    lnl = jnp.sum(gcount * (jnp.log(safe) - jnp.log(4.0 * gnph)),
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
        _refresh_path(prop_ref, age_out, lson_ref, rson_ref, father_ref,
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


def node_age_sweep_pallas(gen: GenState, params: Params, seq: SeqData,
                          rng: FastRngState, ctx: Context, finetune,
                          lnld, lnp, cond, *, tile: int = 256,
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

    TL = tile
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
        binto = (ctx.band_target[None, :, None]
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
        row(jnp.ones((L,), jnp.int32), jnp.int32),
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
