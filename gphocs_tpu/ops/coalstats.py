"""Coalescent/migration sufficient statistics, batched over loci.

The reference maintains these incrementally via per-population event chains
(src/patch.c:2330-2460: recalcStats walks a linked list accumulating
n(n-1)*dt per population and n*dt per live migration band).  Here they are
recomputed from scratch as closed-form tensor reductions — no sorting, no
linked lists:

Every genealogy edge is split into "segments" that each live in one base
population: the part of edge v below its first migration event (base pop =
node_pop[v]), plus one segment per migration event (base pop = the band's
source).  A lineage with base pop q is present in population r at time t
iff r is ancestral-or-equal to q and t lies in r's window [tau_r, tau_fa(r)]
— so per-population presence is just interval clipping, and

    coal_stats[r] = sum_{s != s'} |clip_r(s) ^ clip_r(s')|
                  = (sum of pairwise overlaps) - (sum of lengths)
    mig_stats[b]  = sum_s |clip_tgt(b)(s) ^ band_window(b)|

which reproduces integral n(n-1) dt and integral n dt exactly.

The root node carries a virtual edge up to OLDAGE so that lineage counts
above the MRCA (n=1) contribute to migration stats, mirroring the
reference's root-chain padding (src/patch.c adjustRootEvents).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gphocs_tpu.constants import OLDAGE
from gphocs_tpu.state import GenState, Params


class Segments(NamedTuple):
    start: jnp.ndarray     # [L, NSEG]
    end: jnp.ndarray       # [L, NSEG]
    base_pop: jnp.ndarray  # [L, NSEG] int32
    valid: jnp.ndarray     # [L, NSEG] bool


# Sufficient-statistics algorithm forms (all exact):
#   * pairwise: one [L, P, NSEG, NSEG] broadcast — fastest at small L but
#     tens of GB at 10K+ loci (crashed the chip in the round-2 sweep);
#   * sweep: argsorted endpoint sweep — linear memory but TPU bitonic
#     sorts cost ~25x the pairwise time at 4K loci;
#   * scan: NSEG sequential steps, each overlapping ONE segment against
#     all others in [L, P, NSEG] — sort-free AND linear memory; default.
SWEEP_STATS = False
PAIRWISE_MAX_LOCI = 2048


def _coal_scan_overlaps(lo, hi, present):
    """sum_{s != s'} |I_s ^ I_s'| via a fori over segments.

    lo/hi/present: [L, P, NSEG] clipped per-pop intervals.  Masked
    segments collapse to [0, 0], whose overlap with anything is <= 0.
    """
    lo_m = jnp.where(present, lo, 0.0)
    hi_m = jnp.where(present, jnp.maximum(hi, lo), 0.0)
    nseg = lo.shape[-1]

    def body(s_, acc):
        los = lax.dynamic_slice_in_dim(lo_m, s_, 1, axis=2)   # [L, P, 1]
        his = lax.dynamic_slice_in_dim(hi_m, s_, 1, axis=2)
        ov = jnp.maximum(
            jnp.minimum(hi_m, his) - jnp.maximum(lo_m, los), 0.0)
        return acc + jnp.sum(ov, axis=-1)

    total = lax.fori_loop(0, nseg, body, jnp.zeros(lo.shape[:-1], lo.dtype))
    # the diagonal (s == s') contributed each segment's own length
    return total - jnp.sum(hi_m - lo_m, axis=-1)


class CoalStats(NamedTuple):
    coal_stats: jnp.ndarray  # [L, P] sum n(n-1) dt per pop
    mig_stats: jnp.ndarray   # [L, B] sum n dt per band window
    num_coals: jnp.ndarray   # [L, P] int32
    num_migs: jnp.ndarray    # [L, B] int32


def segments(gen: GenState, band_source: jnp.ndarray,
             oldage: float = OLDAGE, root_cap: jnp.ndarray = None
             ) -> Segments:
    """Build the segment set.  band_source: [B] int32 source pop per band.

    root_cap: optional [L] ceiling for the root's virtual edge instead of
    OLDAGE.  Any cap >= max(all other segment ends, band-window ends) is
    EXACT: no pairwise overlap or band window exists above it.  Callers
    that difference intervals (sufficient statistics) must pass a tight
    cap — at f32, ulp(OLDAGE=999) is 6e-5, LARGER than typical stats, so
    root-pop statistics computed against the raw OLDAGE cap quantize to
    garbage (the round-4 f32 root-theta bias).
    """
    L, N = gen.father.shape
    M = gen.max_migs

    # top of each full edge: father age, or the (capped) root ceiling
    fa = gen.father
    fa_safe = jnp.where(fa < 0, 0, fa)
    top_root = (jnp.asarray(oldage, gen.age.dtype) if root_cap is None
                else root_cap[:, None].astype(gen.age.dtype))
    edge_top = jnp.where(
        fa < 0, top_root,
        jnp.take_along_axis(gen.age, fa_safe, axis=1),
    )  # [L, N]

    mig_active = gen.mig_branch >= 0                     # [L, M]
    big = jnp.asarray(jnp.inf, gen.age.dtype)
    mig_age = jnp.where(mig_active, gen.mig_age, big)    # inactive -> +inf

    # first mig above each edge's child node: min age among migs on the edge
    # (migs on an edge always lie above the child node age)
    on_edge = mig_active[:, None, :] & (gen.mig_branch[:, None, :] ==
                                        jnp.arange(N, dtype=jnp.int32)[None, :, None])
    first_mig = jnp.min(jnp.where(on_edge, mig_age[:, None, :], big), axis=2)  # [L, N]
    edge_seg_end = jnp.minimum(edge_top, first_mig)

    # next mig above each mig on the same branch (strictly larger age; ties
    # broken by slot index for determinism)
    same_branch = (mig_active[:, :, None] & mig_active[:, None, :] &
                   (gen.mig_branch[:, :, None] == gen.mig_branch[:, None, :]))
    age_i = mig_age[:, :, None]
    age_j = mig_age[:, None, :]
    idx = jnp.arange(M)
    later = same_branch & ((age_j > age_i) |
                           ((age_j == age_i) & (idx[None, None, :] > idx[None, :, None])))
    next_mig = jnp.min(jnp.where(later, age_j, big), axis=2)  # [L, M]
    branch_safe = jnp.where(mig_active, gen.mig_branch, 0)
    branch_top = jnp.take_along_axis(edge_top, branch_safe, axis=1)  # [L, M]
    mig_seg_end = jnp.minimum(next_mig, branch_top)

    start = jnp.concatenate([gen.age, jnp.where(mig_active, gen.mig_age, 0.0)], axis=1)
    end = jnp.concatenate([edge_seg_end,
                           jnp.where(mig_active, mig_seg_end, 0.0)], axis=1)
    band_safe = jnp.where(mig_active, gen.mig_band, 0)
    if band_source.shape[0] > 0:
        mig_pop = band_source[band_safe]
    else:  # no bands: no active migration events can exist
        mig_pop = jnp.zeros_like(band_safe)
    base_pop = jnp.concatenate([gen.node_pop, mig_pop.astype(jnp.int32)], axis=1)
    valid = jnp.concatenate(
        [jnp.ones((L, N), bool), mig_active], axis=1)
    return Segments(start=start, end=end, base_pop=base_pop, valid=valid)


def _sweep_integrals(lo, hi, present):
    """Sort-based computation of sum n(n-1) dt and sum n dt.

    lo/hi/present: [..., NSEG] clipped intervals.  Returns
    (coal [...], lineage_time [...]).  An argsorted endpoint sweep with
    cumulative lineage counts — O(NSEG log NSEG) instead of the O(NSEG^2)
    pairwise-overlap form.
    """
    ns = lo.shape[-1]
    lo = jnp.where(present, lo, 0.0)
    hi = jnp.where(present, jnp.maximum(hi, lo), 0.0)
    times = jnp.concatenate([lo, hi], axis=-1)
    delta = jnp.concatenate(
        [present.astype(lo.dtype), -present.astype(lo.dtype)], axis=-1)
    order = jnp.argsort(times, axis=-1)
    t = jnp.take_along_axis(times, order, axis=-1)
    d = jnp.take_along_axis(delta, order, axis=-1)
    n = jnp.cumsum(d, axis=-1)
    dt = t[..., 1:] - t[..., :-1]
    n = n[..., :-1]
    return (jnp.sum(n * (n - 1.0) * dt, axis=-1),
            jnp.sum(n * dt, axis=-1))


def sufficient_stats(gen: GenState, params: Params,
                     father_pop: jnp.ndarray, is_ancestral: jnp.ndarray,
                     band_source: jnp.ndarray, band_target: jnp.ndarray,
                     band_start: jnp.ndarray, band_end: jnp.ndarray,
                     oldage: float = OLDAGE) -> CoalStats:
    """Full recomputation of all sufficient statistics (sort-based sweep).

    father_pop: [P] int32 (-1 root); is_ancestral: [P, P] bool;
    band_*: [B] band endpoint pops and window times.
    """
    P = params.theta.shape[0]
    S = gen.num_samples
    # tight root-edge cap: above max(node ages, band ends, taus) there is
    # no overlap partner and no band window, so the statistics are exact
    # while interval arithmetic stays at f32-friendly magnitudes
    cap = jnp.maximum(jnp.max(gen.age, axis=1),
                      jnp.max(params.tau) if params.tau.shape[0] else 0.0)
    if band_end.shape[0] > 0:
        cap = jnp.maximum(cap, jnp.max(band_end))
    segs = segments(gen, band_source, oldage, root_cap=cap)

    pop_end = jnp.where(father_pop < 0, jnp.asarray(oldage, params.tau.dtype),
                        params.tau[jnp.where(father_pop < 0, 0, father_pop)])

    anc = jnp.asarray(is_ancestral)
    # presence of segment s in pop r: [L, P, NSEG].  anc[r, base[l,s]] is
    # materialized by a P-way masked union (no per-locus gathers)
    lo = jnp.maximum(segs.start[:, None, :], params.tau[None, :, None])
    hi = jnp.minimum(segs.end[:, None, :], pop_end[None, :, None])
    anc_of_base = jnp.zeros((gen.num_loci, P) + segs.base_pop.shape[1:],
                            bool)
    for q in range(P):
        anc_of_base = anc_of_base | (
            (segs.base_pop == q)[:, None, :] & anc[None, :, q:q + 1])
    present = (segs.valid[:, None, :] & anc_of_base & (hi > lo))
    if SWEEP_STATS:
        coal, _ = _sweep_integrals(lo, hi, present)
    elif gen.num_loci <= PAIRWISE_MAX_LOCI:
        # pairwise-overlap form: O(NSEG^2) flops but sort-free — on TPU the
        # elementwise/reduce pipeline beats the bitonic sort convincingly
        lo_m = jnp.where(present, lo, 0.0)
        hi_m = jnp.where(present, hi, 0.0)
        pair = jnp.maximum(
            jnp.minimum(hi_m[:, :, :, None], hi_m[:, :, None, :])
            - jnp.maximum(lo_m[:, :, :, None], lo_m[:, :, None, :]), 0.0)
        pair = pair * (present[:, :, :, None] & present[:, :, None, :])
        length = jnp.maximum(hi_m - lo_m, 0.0)
        coal = jnp.sum(pair, axis=(2, 3)) - jnp.sum(length, axis=2)
    else:
        coal = _coal_scan_overlaps(lo, hi, present)

    # migration stats: lineage-time of the band's target pop inside the window
    B = band_source.shape[0]
    if B > 0:
        lo_t = jnp.maximum(lo[:, band_target, :],
                           band_start[None, :, None])   # [L, B, NSEG]
        hi_t = jnp.minimum(hi[:, band_target, :],
                           band_end[None, :, None])
        pres_t = present[:, band_target, :] & (hi_t > lo_t)
        mig = jnp.sum(
            jnp.where(pres_t, jnp.maximum(hi_t - lo_t, 0.0), 0.0), axis=2)
        nmig = jnp.sum(
            ((gen.mig_branch >= 0)[:, None, :]
             & (gen.mig_band[:, None, :] == jnp.arange(B)[None, :, None])),
            axis=2).astype(jnp.int32)
    else:
        mig = jnp.zeros((gen.num_loci, 0), gen.age.dtype)
        nmig = jnp.zeros((gen.num_loci, 0), jnp.int32)

    ncoal = jnp.sum(
        (gen.node_pop[:, S:, None] == jnp.arange(P)[None, None, :]),
        axis=1).astype(jnp.int32)

    # padding loci (sharding) contribute nothing
    v = gen.valid[:, None]
    return CoalStats(coal_stats=jnp.where(v, coal, 0.0),
                     mig_stats=jnp.where(v, mig, 0.0),
                     num_coals=jnp.where(v, ncoal, 0),
                     num_migs=jnp.where(v, nmig, 0))


def genealogy_log_prior(stats: CoalStats, params: Params) -> jnp.ndarray:
    """Per-locus log prior of the genealogy given parameters
    (reference gtreeLnLikelihood, src/patch.c:2702-2738):

        sum_pop  [ num_coals * log(2/theta) - coal_stats / theta ]
      + sum_band [ num_migs * log(m) - mig_stats * m ]   (only where m > 0)
    """
    th = params.theta
    lnl = jnp.sum(
        stats.num_coals * jnp.log(2.0 / th)[None, :]
        - stats.coal_stats / th[None, :],
        axis=1)
    if params.mig_rate.shape[0] > 0:
        m = params.mig_rate
        safe_m = jnp.where(m > 0.0, m, 1.0)
        lnl = lnl + jnp.sum(
            jnp.where(m[None, :] > 0.0,
                      stats.num_migs * jnp.log(safe_m)[None, :]
                      - stats.mig_stats * m[None, :],
                      0.0),
            axis=1)
    return lnl


def lineage_presence_integral(gen: GenState, band_source: jnp.ndarray,
                              pop: jnp.ndarray, w0: jnp.ndarray,
                              w1: jnp.ndarray, tau: jnp.ndarray,
                              pop_end: jnp.ndarray, is_ancestral: jnp.ndarray,
                              exclude_edge: jnp.ndarray = None,
                              oldage: float = OLDAGE) -> jnp.ndarray:
    """integral over [w0, w1] of n_pop(t) dt, per locus.

    pop/w0/w1: [L] per-locus query.  Optionally excludes one edge (and its
    migration segments).  Used by incremental-delta kernels and bounds.
    """
    segs = segments(gen, band_source, oldage)
    anc = jnp.asarray(is_ancestral)
    P_ = anc.shape[0]
    pop_oh = pop[:, None] == jnp.arange(P_, dtype=pop.dtype)[None, :]
    anc_row = jnp.any(pop_oh[:, :, None] & anc[None], axis=1)  # [L, P]
    in_pop = jnp.zeros(segs.base_pop.shape, bool)
    for q in range(P_):
        in_pop = in_pop | ((segs.base_pop == q) & anc_row[:, q:q + 1])
    present = segs.valid & in_pop
    if exclude_edge is not None:
        N = gen.num_nodes
        seg_edge = jnp.concatenate(
            [jnp.arange(N, dtype=jnp.int32)[None, :].repeat(gen.num_loci, 0),
             jnp.where(gen.mig_branch >= 0, gen.mig_branch, -2)], axis=1)
        present = present & (seg_edge != exclude_edge[:, None])
    lo = jnp.maximum(jnp.maximum(segs.start, w0[:, None]), tau[pop][:, None])
    hi = jnp.minimum(jnp.minimum(segs.end, w1[:, None]), pop_end[pop][:, None])
    return jnp.sum(jnp.where(present, jnp.maximum(hi - lo, 0.0), 0.0), axis=1)


def mig_age_move_delta(gen: GenState, params: Params, ctx,
                       slot: int, tnew: jnp.ndarray,
                       band_start, band_end) -> jnp.ndarray:
    """Genealogy-log-prior delta for moving migration event `slot` from its
    current age to tnew (one per locus; inactive slots return 0).

    Closed form (tensor twin of the reference's paired considerEventMove on
    the source and target chains, src/GPhoCS.c:2490-2530 /
    src/patch.c:1434-1530): within the move window W the branch's
    trajectory base pop switches between the band's target p (below the
    event) and source s (above), so one lineage moves between the pop sets
    anc(p) and anc(s) during W:

        moving up   (t' > t): lineage added to anc(p)\\anc(s),
                              removed from anc(s)\\anc(p)
        added to r:    dcoal_r = +2 * int_{W ^ win_r} n_r dt
        removed from r: dcoal_r = -2 * (int_{W ^ win_r} n_r dt - |W ^ win_r|)
        dmig_b = +-|W ^ band-window_b|  for bands targeting changed pops
        dlnP   = -sum_r dcoal_r / theta_r - sum_b m_b dmig_b

    (event counts are unchanged).  n_r is the current-state lineage count.
    """
    L = gen.num_loci
    P = params.theta.shape[0]
    dt = gen.age.dtype
    active = gen.mig_branch[:, slot] >= 0
    band = jnp.where(active, gen.mig_band[:, slot], 0)
    t = gen.mig_age[:, slot]
    s_pop = ctx.band_source[band]
    p_pop = ctx.band_target[band]
    up = tnew > t
    A = jnp.where(up, p_pop, s_pop)   # pop gaining the lineage in W
    Rm = jnp.where(up, s_pop, p_pop)  # pop losing it
    w0 = jnp.minimum(t, tnew)
    w1 = jnp.maximum(t, tnew)

    anc = ctx.is_ancestral                                   # [P, P] bool
    ohA = A[:, None] == jnp.arange(P)[None, :]
    ohR = Rm[:, None] == jnp.arange(P)[None, :]
    in_A = jnp.any(ohA[:, None, :] & anc[None, :, :], axis=2)  # [L, P]
    in_R = jnp.any(ohR[:, None, :] & anc[None, :, :], axis=2)
    addm = in_A & ~in_R
    remm = in_R & ~in_A

    # I_r = current-state lineage time in pop r over W (all segments)
    segs = segments(gen, ctx.band_source, ctx.oldage)
    pend = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage, dt),
                     params.tau[jnp.where(ctx.father_pop < 0, 0,
                                          ctx.father_pop)])
    lo = jnp.maximum(jnp.maximum(segs.start[:, None, :],
                                 params.tau[None, :, None]),
                     w0[:, None, None])
    hi = jnp.minimum(jnp.minimum(segs.end[:, None, :],
                                 pend[None, :, None]),
                     w1[:, None, None])
    anc_of_base = jnp.zeros((L, P) + segs.base_pop.shape[1:], bool)
    for q in range(P):
        anc_of_base = anc_of_base | (
            (segs.base_pop == q)[:, None, :] & anc[None, :, q:q + 1])
    present = segs.valid[:, None, :] & anc_of_base
    integ = jnp.sum(
        jnp.where(present, jnp.maximum(hi - lo, 0.0), 0.0), axis=2)  # [L, P]
    wlen_r = jnp.maximum(
        jnp.minimum(w1[:, None], pend[None, :])
        - jnp.maximum(w0[:, None], params.tau[None, :]), 0.0)        # [L, P]

    dcoal = jnp.where(addm, 2.0 * integ,
                      jnp.where(remm, -2.0 * (integ - wlen_r), 0.0))
    dlnp = -jnp.sum(dcoal / params.theta[None, :], axis=1)

    B = ctx.band_source.shape[0]
    if B > 0:
        tb = ctx.band_target                                 # [B]
        ov = jnp.maximum(
            jnp.minimum(w1[:, None], band_end[None, :])
            - jnp.maximum(w0[:, None], band_start[None, :]), 0.0)    # [L, B]
        ohTb = tb[None, :] == jnp.arange(P)[:, None]         # [P, B]
        add_b = jnp.any(addm[:, :, None] & ohTb[None], axis=1)
        rem_b = jnp.any(remm[:, :, None] & ohTb[None], axis=1)
        dmig = jnp.where(add_b, ov, jnp.where(rem_b, -ov, 0.0))
        dlnp = dlnp - jnp.sum(dmig * params.mig_rate[None, :], axis=1)
    return jnp.where(active, dlnp, 0.0)


def node_age_move_delta(gen: GenState, params: Params, ctx,
                        inode: jnp.ndarray, tnew: jnp.ndarray,
                        band_start, band_end) -> jnp.ndarray:
    """Genealogy-log-prior delta for moving coal node `inode` (one per
    locus, same index) from its current age to tnew within its population.

    Closed form (the tensor twin of the reference's event-chain delta walk,
    computeCoalStatsDelta / computeMigStatsDelta / computeDeltaLnLd,
    src/patch.c:1838-1530):

      raising t -> t' adds one lineage on W = (t, t'):
          dcoal = 2 * int_W n dt,        dmig_b = |W ^ band_b|
      lowering removes one:
          dcoal = -2 * int_W (n - 1) dt, dmig_b = -|W ^ band_b|
      dlnP = -dcoal / theta_p - sum_b m_b dmig_b     (counts unchanged)

    where n is the lineage count of the *current* state in pop p and all
    affected bands target p.
    """
    L = gen.num_loci
    ar = jnp.arange(L)
    t = gen.age[ar, inode]
    pop = gen.node_pop[ar, inode]
    w0 = jnp.minimum(t, tnew)
    w1 = jnp.maximum(t, tnew)
    raising = tnew > t

    segs = segments(gen, ctx.band_source, ctx.oldage)
    # is_ancestral[pop[l], base[l,s]] without advanced-indexing gathers
    # (per-locus gathers are the slow class on TPU): select the pop's
    # ancestry row by a P-way masked sum, then test base pops against it
    P = ctx.is_ancestral.shape[0]
    pop_oh = pop[:, None] == jnp.arange(P, dtype=pop.dtype)[None, :]
    anc_row = jnp.sum(jnp.where(pop_oh[:, :, None], ctx.is_ancestral[None],
                                False), axis=1)                 # [L, P] bool
    in_pop = jnp.zeros(segs.base_pop.shape, bool)
    for q in range(P):
        in_pop = in_pop | ((segs.base_pop == q) & anc_row[:, q:q + 1])
    present = segs.valid & in_pop
    lo = jnp.maximum(segs.start, w0[:, None])
    hi = jnp.minimum(segs.end, w1[:, None])
    integral = jnp.sum(
        jnp.where(present, jnp.maximum(hi - lo, 0.0), 0.0), axis=1)
    wlen = w1 - w0
    dcoal = jnp.where(raising, 2.0 * integral,
                      -2.0 * (integral - wlen))
    dlnp = -dcoal / params.theta[pop]
    if ctx.band_source.shape[0] > 0:
        ov = jnp.maximum(
            jnp.minimum(w1[:, None], band_end[None, :])
            - jnp.maximum(w0[:, None], band_start[None, :]), 0.0)
        into_p = ctx.band_target[None, :] == pop[:, None]
        dmig = jnp.where(into_p, jnp.where(raising[:, None], ov, -ov), 0.0)
        dlnp = dlnp - jnp.sum(dmig * params.mig_rate[None, :], axis=1)
    return dlnp
