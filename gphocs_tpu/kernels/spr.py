"""UpdateGB_MigSPR: subtree-prune-regraft with migration, all loci batched.

Mirrors reference src/GPhoCS.c:2598-2947 + traceLineage (src/patch.c:886-1331).

For each non-root node (sequential sweep, loci parallel):
  1. Detach the edge above `node` (father f, sibling s, grandfather g).
     Functionally nothing is mutated; "detached coverage" just excludes
     branch `node` from lineage counts.
  2. Re-coalesce by simulation: walk up through chain intervals.  Interval
     boundaries are every event time in the current pop (coal nodes,
     migration in/out events, band window edges, sample starts, pop top).
     In each interval draw dt ~ Exp(mig_rate + 2 n / theta); on an event,
     choose migration (jump to the band's source pop, creating an event
     pair) or coalescence (pick a uniform target lineage, regraft there).
     Reject the lane when migration capacity is exhausted
     (reference patch.c:1143-1146) or the walk exits the root population
     top (OLDAGE ceiling, patch.c:994-1000).
  3. lnacceptance = data-likelihood delta only — the re-coalescence proposal
     density exactly cancels the genealogy-prior ratio
     (reference src/GPhoCS.c:2702-2714).
  4. On accept, rewire: f takes the coalescence point (f.age = t*,
     f.sons = {node, target}); migration events on f's edge move to s, and
     events on the target edge above t* move to f; old events on `node`'s
     edge are dropped, new simulated ones added (replaceMigNodes,
     src/patch.c:1343-1430).

RNG discipline matches the C consumption order per locus stream: one
uniform per interval with positive rate, a second on an event, and the MH
uniform only when the simulation succeeded and lnacc < 0.

TPU notes: the data-likelihood delta is computed by an incremental refresh
of the carried conditionals (only f, g, the target's father and their
ancestors are dirty — the tensor twin of the reference's dirty-flag reuse,
src/LocusDataLikelihood.c:931-1020); every per-locus table lookup in the
walk body is a one-hot reduction, never gather/scatter (dispatch-bound
regime: one-hot forms measured 3-7x faster on TPU v5e at these shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import Context, band_windows, mh_accept
from gphocs_tpu.ops.likelihood_cache import refresh_and_lnld
from gphocs_tpu.state import GenState, Params, SeqData


def _take1(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """x[l, k[l]] as a one-hot reduction.  x: [L, K], k: [L] -> [L]."""
    K = x.shape[1]
    oh = (jnp.arange(K, dtype=k.dtype)[None, :] == k[:, None])
    return jnp.sum(jnp.where(oh, x, 0), axis=1)


def _onehot(k: jnp.ndarray, K: int, dtype) -> jnp.ndarray:
    return (jnp.arange(K, dtype=k.dtype)[None, :] == k[:, None]).astype(dtype)


def _branch_pop_at(gen: GenState, ctx: Context, t: jnp.ndarray):
    """Base population of every branch's trajectory at per-locus time t.

    [L, N]: source pop of the last migration event below t on the branch,
    or node_pop if none (reference getEdgesForTimePop, src/patch.c:526-571).
    """
    L, N = gen.father.shape
    if ctx.num_bands == 0:
        return gen.node_pop
    active = gen.mig_branch >= 0
    below = active & (gen.mig_age < t[:, None])                    # [L, M]
    # for each branch: the mig below t with max age
    age_key = jnp.where(below, gen.mig_age, -jnp.inf)              # [L, M]
    onb = (gen.mig_branch[:, None, :] ==
           jnp.arange(N, dtype=jnp.int32)[None, :, None])          # [L, N, M]
    keyed = jnp.where(onb, age_key[:, None, :], -jnp.inf)
    best = jnp.argmax(keyed, axis=2)                               # [L, N]
    has = jnp.any(keyed > -jnp.inf, axis=2)
    M = gen.max_migs
    boh = (jnp.arange(M, dtype=best.dtype)[None, None, :]
           == best[:, :, None])                                    # [L, N, M]
    band = jnp.sum(jnp.where(boh, gen.mig_band[:, None, :], 0), axis=2)
    return jnp.where(has, ctx.band_source[band], gen.node_pop)


def _edge_top(gen: GenState, ctx: Context):
    fa = gen.father
    top = jnp.where(fa < 0, jnp.asarray(ctx.oldage, gen.age.dtype),
                    jnp.take_along_axis(gen.age, jnp.where(fa < 0, 0, fa),
                                        axis=1))
    return top


def _covering_mask(gen: GenState, ctx: Context, t: jnp.ndarray,
                   pop: jnp.ndarray, exclude: jnp.ndarray):
    """[L, N] bool: branches alive in `pop` at time t (detached coverage:
    branch `exclude` is out)."""
    N = gen.num_nodes
    P = ctx.num_pops
    top = _edge_top(gen, ctx)
    alive = (gen.age <= t[:, None]) & (t[:, None] < top)
    alive = alive & (jnp.arange(N)[None, :] != exclude[:, None])
    traj = _branch_pop_at(gen, ctx, t)
    # is_ancestral[pop[l], traj[l, n]]: row-select then per-pop mask-reduce
    anc_rows = jnp.sum(
        jnp.where(_onehot(pop, P, bool)[:, :, None], ctx.is_ancestral[None],
                  False), axis=1)                                  # [L, P]
    inpop = jnp.zeros(traj.shape, bool)
    for q in range(P):
        inpop = inpop | ((traj == q) & anc_rows[:, q:q + 1])
    return alive & inpop


class _SimState(NamedTuple):
    pop: jnp.ndarray        # [L] current population
    age: jnp.ndarray        # [L] current time
    status: jnp.ndarray     # [L] 0 running, 1 coalesced, -1 rejected
    rng: object             # RngState over L+1 lanes
    n_new: jnp.ndarray      # [L] number of new migration events
    new_band: jnp.ndarray   # [L, M] band of new events
    new_age: jnp.ndarray    # [L, M] age of new events
    target: jnp.ndarray     # [L] coalescence target branch
    coal_age: jnp.ndarray   # [L]
    iters: jnp.ndarray      # [] safety counter


def _simulate_reconnect(gen: GenState, params: Params, ctx: Context,
                        node: jnp.ndarray, rng_state, active0: jnp.ndarray):
    """Batched traceLineage(reconnect=1) by cumulative-hazard inversion.

    Instead of walking chain intervals one boundary at a time (the
    reference's loop, src/patch.c:1117-1261), each walk step inverts the
    full piecewise-constant hazard of the coalescence-with-migration
    process from the current age up to OLDAGE along the ancestral
    population path:

        Lambda(t) = integral (mig_rate(s) + 2 n(s) / theta(s)) ds,
        t* = Lambda^{-1}(E),  E ~ Exp(1)

    which yields the *exact* same law as interval-by-interval exponential
    draws but needs only one sequential step per migration jump (expected
    ~1) instead of one per chain event.  RNG consumption therefore differs
    from the reference (documented deviation: statistical, not bitwise,
    equivalence).

    node: [L] pruned branch.  Returns a completed _SimState.
    """
    L = gen.num_loci
    N = gen.num_nodes
    M = gen.max_migs
    Bn = ctx.num_bands
    dt = gen.age.dtype
    P = ctx.num_pops
    ar = jnp.arange(L)

    bs, be = band_windows(ctx, params.tau)
    pe = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage, dt),
                   params.tau[jnp.where(ctx.father_pop < 0, 0,
                                        ctx.father_pop)])

    act = gen.mig_branch >= 0
    on_pruned = act & (gen.mig_branch == node[:, None])
    base_migs = jnp.sum(act, axis=1) - jnp.sum(on_pruned, axis=1)

    node_oh = _onehot(node, N, dt)                                 # [L, N]
    start_pop = jnp.sum(jnp.where(node_oh > 0, gen.node_pop, 0),
                        axis=1).astype(jnp.int32)
    start_age = jnp.sum(node_oh * gen.age, axis=1)

    # static candidate boundary times [L, K]: node ages, migration events,
    # band window edges, population bottoms, plus the OLDAGE ceiling
    cand = [gen.age,
            jnp.where(act, gen.mig_age, 0.0),
            jnp.broadcast_to(params.tau[None, :], (L, P))]
    if Bn > 0:
        cand += [jnp.broadcast_to(bs[None, :], (L, Bn)),
                 jnp.broadcast_to(be[None, :], (L, Bn))]
    bounds_all = jnp.concatenate(cand, axis=1)           # [L, K0]

    # precomputed per-branch data for coverage counting
    top_all = _edge_top(gen, ctx)                        # [L, N]

    max_steps = M + 3

    # per-slot static data for the einsum-based count tables:
    # prev_pop[m] = trajectory pop just below migration slot m (the source
    # of the closest lower migration on the same branch, or the branch's
    # node pop); win[m](t) = age_m <= t < next-event-above on the branch
    if Bn > 0:
        # window of slot m: [age_m, next-mig-above-on-branch or branch top);
        # windows are disjoint per branch, so at any time exactly one slot's
        # source pop replaces the branch's node pop
        big = jnp.asarray(jnp.inf, dt)
        mig_age_act = jnp.where(act, gen.mig_age, big)
        same = (act[:, :, None] & act[:, None, :]
                & (gen.mig_branch[:, :, None] == gen.mig_branch[:, None, :]))
        idxm = jnp.arange(M)
        above_rel = same & (
            (mig_age_act[:, None, :] > mig_age_act[:, :, None])
            | ((mig_age_act[:, None, :] == mig_age_act[:, :, None])
               & (idxm[None, None, :] > idxm[None, :, None])))
        next_age = jnp.min(jnp.where(above_rel, mig_age_act[:, None, :],
                                     big), axis=2)
        branch_oh = ((gen.mig_branch[:, :, None]
                      == jnp.arange(N)[None, None, :]) & act[:, :, None]
                     )                                             # [L, M, N]
        # batched per-locus contractions are expressed as masked reduces:
        # batched tiny dots serialize on the MXU and scale linearly with L
        branch_top_m = jnp.sum(
            jnp.where(branch_oh, top_all[:, None, :],
                      jnp.zeros((), dt)), axis=2)
        win_hi = jnp.minimum(next_age, branch_top_m)             # [L, M]
        src_pop_m = ctx.band_source[jnp.where(act, gen.mig_band, 0)]
        branch_pop_m = jnp.sum(
            jnp.where(branch_oh, gen.node_pop[:, None, :], 0), axis=2)

    # ---- static per-node-step tables over the segment grid ----
    # The candidate boundary set is state-independent during the walk, so
    # segment tables for ALL populations are computed once; each walk step
    # then only gathers per-(locus, segment) scalars.
    b_sorted = jnp.sort(jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(ctx.oldage, dt), (L, 1)), bounds_all],
        axis=1), axis=1)                                         # [L, K]
    mids0 = 0.5 * (jnp.concatenate(
        [jnp.zeros((L, 1), dt), b_sorted[:, :-1]], axis=1) + b_sorted)
    alive0 = ((gen.age[:, None, :] <= mids0[:, :, None])
              & (mids0[:, :, None] < top_all[:, None, :]))       # [L, K, N]
    alive0 = alive0 & (jnp.arange(N)[None, None, :] != node[:, None, None])
    # n_by_base[l,k,q] = remaining branches whose trajectory pop is q at
    # segment k.  Base term: node pops (one-hot matmul, MXU); correction:
    # each active migration slot m retargets its branch's contribution from
    # prev_pop[m] to the band source while mid is in [age_m, win_hi_m).
    K0 = mids0.shape[1]
    # n_by_base[l,k,q]: per-locus counts — loop the small pop axis instead
    # of a batched matmul (see note above)
    n_by_base = jnp.stack(
        [jnp.sum(alive0 & (gen.node_pop == q)[:, None, :], axis=2)
         for q in range(P)], axis=2).astype(dt)                  # [L,K,P]
    if Bn > 0:
        in_win = (act[:, None, :]
                  & (gen.mig_age[:, None, :] <= mids0[:, :, None])
                  & (mids0[:, :, None] < win_hi[:, None, :]))    # [L,K,M]
        # branch_alive[l,k,m] = alive0[l,k,branch(m)]
        branch_alive = jnp.stack(
            [jnp.sum(jnp.where(branch_oh[:, m][:, None, :], alive0, False),
                     axis=2) > 0
             for m in range(M)], axis=2)                          # [L,K,M]
        w = in_win & branch_alive                                 # [L,K,M]
        corr = jnp.stack(
            [jnp.sum((w & (src_pop_m == q)[:, None, :]).astype(dt)
                     - (w & (branch_pop_m == q)[:, None, :]).astype(dt),
                     axis=2)
             for q in range(P)], axis=2)
        n_by_base = n_by_base + corr
    n_all = jnp.einsum("lkq,pq->lkp", n_by_base,
                       ctx.is_ancestral.astype(dt))              # [L,K,P]
    inwin0 = ((params.tau[None, None, :] <= mids0[:, :, None])
              & (mids0[:, :, None] < pe[None, None, :]))         # [L,K,P]
    if Bn > 0:
        live0 = ((bs[None, None, :] <= mids0[:, :, None])
                 & (be[None, None, :] > mids0[:, :, None]))      # [L,K,B]
        # migration rate into pop p at segment k
        tgt_onehot = (ctx.band_target[None, :] ==
                      jnp.arange(P)[:, None]).astype(dt)         # [P,B]
        migr_all = jnp.einsum(
            "lkb,pb->lkp",
            jnp.where(live0, params.mig_rate[None, None, :], 0.0), tgt_onehot)
    else:
        live0 = jnp.zeros((L, b_sorted.shape[1], 0), bool)
        migr_all = jnp.zeros_like(n_all)

    anc_f = ctx.is_ancestral.astype(dt)
    lo_base = jnp.concatenate([jnp.zeros((L, 1), dt), b_sorted[:, :-1]],
                              axis=1)

    def body(st: _SimState):
        alive = st.status == 0
        # per-lane segment view above the current age along the current
        # pop's ancestor path, from the precomputed tables
        lo = jnp.maximum(lo_base, st.age[:, None])
        hi = jnp.maximum(b_sorted, st.age[:, None])
        seg_len = jnp.maximum(hi - lo, 0.0)                      # [L, K]
        onpath = jnp.einsum("lq,pq->lp", _onehot(st.pop, P, dt),
                            anc_f) > 0.5                         # [L, P]
        hit = onpath[:, None, :] & inwin0                        # [L,K,P]
        hit_f = hit.astype(dt)
        # exactly one pop window contains each segment midpoint along the
        # path, so one-hot contractions read the per-segment tables
        n = jnp.einsum("lkp,lkp->lk", hit_f, n_all)              # [L, K]
        mig_rate = jnp.einsum("lkp,lkp->lk", hit_f, migr_all)
        inv_theta = jnp.einsum("lkp,p->lk", hit_f, 1.0 / params.theta)
        onany = jnp.any(hit, axis=2)                             # [L, K]
        rate = jnp.where(onany, mig_rate + 2.0 * n * inv_theta, 0.0)
        hz = rate * seg_len
        # log-depth EXCLUSIVE prefix, additions only: computing the
        # exclusive prefix as cum_k - hz_k suffers catastrophic
        # cancellation when hz_k is huge (the [root age, OLDAGE] segment
        # has hazard ~ rate * 1e3; its f32 quantum is O(1), so
        # E - prev_cum went negative by O(1) and t_event landed BELOW
        # the segment — the round-3 GOLDEN_FUSED f32 bias).  The fused
        # Pallas kernel uses the IDENTICAL shift-add association so the
        # two paths stay draw-for-draw bitwise equal.
        K_ = hz.shape[1]
        ecum = jnp.concatenate([jnp.zeros((L, 1), dt), hz[:, :-1]], axis=1)
        s_ = 1
        while s_ < K_:
            ecum = ecum + jnp.concatenate(
                [jnp.zeros((L, s_), dt), ecum[:, :-s_]], axis=1)
            s_ *= 2
        cum = ecum + hz
        u1, rng = R.rndu(st.rng, alive)
        E = -jnp.log(jnp.maximum(u1, 1e-300)).astype(dt)
        reached = cum >= E[:, None]
        k = jnp.argmax(reached, axis=1)
        exits = ~jnp.any(reached, axis=1)                        # past OLDAGE
        koh = (jnp.arange(cum.shape[1])[None, :] == k[:, None])  # [L, K]
        prev_cum = jnp.sum(jnp.where(koh, ecum, 0), axis=1)
        rate_k = jnp.sum(jnp.where(koh, rate, 0), axis=1)
        lo_k = jnp.sum(jnp.where(koh, lo, 0), axis=1)
        hi_k = jnp.sum(jnp.where(koh, hi, 0), axis=1)
        t_event = lo_k + (E - prev_cum) / jnp.maximum(rate_k, 1e-300)
        # belt-and-braces: the event must lie inside its own segment
        t_event = jnp.clip(t_event, lo_k, hi_k)
        pop_k = jnp.einsum("lk,lkp->lp", koh.astype(dt), hit_f)  # [L, P] oh
        migr_k = jnp.sum(jnp.where(koh, mig_rate, 0), axis=1)

        ev_mask = alive & ~exits
        u2, rng = R.rndu(rng, ev_mask)
        esample = (u2 * rate_k).astype(dt)
        is_mig = ev_mask & (esample < migr_k) & (Bn > 0)

        over_cap = is_mig & (base_migs + st.n_new + 1 > M)
        pop_k_id = jnp.argmax(pop_k, axis=1).astype(jnp.int32)
        if Bn > 0:
            live_k = ((ctx.band_target[None, :] == pop_k_id[:, None])
                      & (bs[None, :] <= t_event[:, None])
                      & (be[None, :] > t_event[:, None]))        # [L, B]
            rates_live = jnp.where(live_k, params.mig_rate[None, :], 0.0)
            cumb = jnp.cumsum(rates_live, axis=1)
            chosen = jnp.argmax((cumb > esample[:, None]) & live_k,
                                axis=1).astype(jnp.int32)
            src_pop = ctx.band_source[chosen]
        else:
            chosen = jnp.zeros((L,), jnp.int32)
            src_pop = st.pop
        do_mig = is_mig & ~over_cap
        slot = jnp.clip(st.n_new, 0, M - 1)
        put = do_mig[:, None] & (jnp.arange(M)[None, :] == slot[:, None])
        new_band = jnp.where(put, chosen[:, None], st.new_band)
        new_age_arr = jnp.where(put, t_event[:, None], st.new_age)
        n_new = st.n_new + do_mig.astype(jnp.int32)

        # coalescence: i-th covering branch (node-id order) at t_event
        is_coal = ev_mask & ~is_mig
        n_k = jnp.sum(jnp.where(koh, n, 0), axis=1)
        theta_k = jnp.einsum("lp,p->l", pop_k, params.theta)
        i_pick = jnp.floor((esample - migr_k) * theta_k / 2.0
                           ).astype(jnp.int32)
        i_pick = jnp.clip(i_pick, 0,
                          jnp.maximum(n_k.astype(jnp.int32) - 1, 0))
        cov = _covering_mask(gen, ctx, t_event, pop_k_id, node)  # [L, N]
        csum = jnp.cumsum(cov.astype(jnp.int32), axis=1)
        tgt = jnp.argmax(csum > i_pick[:, None], axis=1).astype(jnp.int32)
        coal_ok = is_coal & (n_k > 0)

        status = st.status
        status = jnp.where(alive & exits, -1, status)
        status = jnp.where(over_cap, -1, status)
        status = jnp.where(coal_ok, 1, status)
        status = jnp.where(is_coal & (n_k <= 0), -1, status)

        pop = jnp.where(do_mig, src_pop, st.pop)
        # record the coalescence population (father_pop_new)
        pop = jnp.where(coal_ok, pop_k_id, pop)
        age = jnp.where(do_mig, t_event, st.age)
        target = jnp.where(coal_ok, tgt, st.target)
        coal_age = jnp.where(coal_ok, t_event, st.coal_age)

        return _SimState(pop=pop, age=age, status=status, rng=rng,
                         n_new=n_new, new_band=new_band,
                         new_age=new_age_arr, target=target,
                         coal_age=coal_age, iters=st.iters + 1)

    def cond(st: _SimState):
        return jnp.any(st.status == 0) & (st.iters < max_steps)

    st0 = _SimState(
        pop=start_pop, age=start_age,
        status=jnp.where(active0, 0, -2),
        rng=rng_state,
        n_new=jnp.zeros((L,), jnp.int32),
        new_band=jnp.zeros((L, M), jnp.int32),
        new_age=jnp.zeros((L, M), dt),
        target=jnp.zeros((L,), jnp.int32),
        coal_age=jnp.zeros((L,), dt),
        iters=jnp.zeros((), jnp.int32),
    )
    st = lax.while_loop(cond, body, st0)
    return st._replace(status=jnp.where(st.status == 0, -1, st.status))


def _apply_spr(gen: GenState, ctx: Context, node, accept, sim: _SimState):
    """Rewire topology + migration events for accepted lanes.

    All index-targeted writes are expressed as fused one-hot `where` chains
    over the full [L, N] rows (no per-locus scatters — the dominant cost of
    the round-1 version on TPU).  The chains replay the sequential update
    order of the reference's SPR commit (src/GPhoCS.c:2716-2830): a later
    rule overriding an earlier one appears further out in the where-nest.
    """
    L = gen.num_loci
    N = gen.num_nodes
    M = gen.max_migs
    ar = jnp.arange(L)

    f = gen.father[ar, node]
    f_safe = jnp.where(f < 0, 0, f)
    sib = (gen.lson[ar, f_safe] + gen.rson[ar, f_safe] - node)
    g = gen.father[ar, f_safe]
    target = sim.target
    t_new = sim.coal_age
    tgt_fa = gen.father[ar, target]

    topo_change = accept & (target != sib) & (target != f)

    nid = jnp.arange(N, dtype=jnp.int32)[None, :]
    is_f = nid == f[:, None]
    is_sib = nid == sib[:, None]
    is_g = (nid == g[:, None]) & (g >= 0)[:, None]
    is_tgt = nid == target[:, None]
    is_tf = (nid == tgt_fa[:, None]) & (tgt_fa >= 0)[:, None]
    tc = topo_change[:, None]
    acc2 = accept[:, None]

    # --- ages and father-pop of f ---
    age = jnp.where(acc2 & is_f, t_new[:, None], gen.age)
    node_pop = jnp.where(acc2 & is_f, sim.pop[:, None], gen.node_pop)

    # --- topology rewires (only when topo_change); sequential rules
    #     sib->g, g.son f->sib, f->tgt edge, tf.son target->f as one chain
    father = gen.father
    father = jnp.where(tc & is_sib, g[:, None], father)
    father = jnp.where(tc & is_f, tgt_fa[:, None], father)
    father = jnp.where(tc & is_tgt, f[:, None], father)

    lson = jnp.where(tc & is_g & (gen.lson == f[:, None]), sib[:, None],
                     gen.lson)
    lson1 = jnp.where(tc & is_f, node[:, None], lson)
    # if tgt_fa == g the g-rule may already have replaced f with sib there,
    # so the target-slot test runs against the post-g-rule values
    lson = jnp.where(tc & is_tf & (lson1 == target[:, None]), f[:, None],
                     lson1)
    rson = jnp.where(tc & is_g & (gen.rson == f[:, None]), sib[:, None],
                     gen.rson)
    rson1 = jnp.where(tc & is_f, target[:, None], rson)
    rson = jnp.where(tc & is_tf & (rson1 == target[:, None]), f[:, None],
                     rson1)
    root = jnp.where(topo_change & (tgt_fa < 0), f,
                     jnp.where(topo_change & (g < 0), sib, gen.root))

    # --- migration event rewiring ---
    act = gen.mig_branch >= 0
    mb = gen.mig_branch
    # drop events of the pruned edge
    keep = act & ~(accept[:, None] & (mb == node[:, None]))
    # f's edge events belong to the sibling now
    mb2 = jnp.where(accept[:, None] & (mb == f[:, None]), sib[:, None], mb)
    # events on the (effective) target edge above the new coal point -> f
    t_eff = jnp.where(target == f, sib, target)
    mb2 = jnp.where(accept[:, None] & (mb2 == t_eff[:, None])
                    & (gen.mig_age >= t_new[:, None]), f[:, None], mb2)
    mig_branch = jnp.where(keep, mb2, -1)
    mig_band = jnp.where(keep, gen.mig_band, 0)
    mig_age = jnp.where(keep, gen.mig_age, 0.0)

    # add the new simulated events into free slots (branch = node):
    # the j-th free slot receives the j-th new event — one masked write
    free = mig_branch < 0
    rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1      # [L, M]
    recv = accept[:, None] & free & (rank < sim.n_new[:, None])
    rank_safe = jnp.clip(rank, 0, M - 1)
    mig_branch = jnp.where(recv, node[:, None], mig_branch)
    mig_band = jnp.where(
        recv, jnp.take_along_axis(sim.new_band, rank_safe, axis=1), mig_band)
    mig_age = jnp.where(
        recv, jnp.take_along_axis(sim.new_age, rank_safe, axis=1), mig_age)

    return gen._replace(father=father, lson=lson, rson=rson, age=age,
                        node_pop=node_pop, root=root,
                        mig_branch=mig_branch, mig_band=mig_band,
                        mig_age=mig_age)


def update_spr(gen: GenState, params: Params, seq: SeqData, rng_state,
               ctx: Context, lnld: jnp.ndarray, cond: jnp.ndarray):
    """One full SPR sweep over all nodes.  Returns
    (gen, rng_state, lnld, cond, accepted_count).  The genealogy log-prior
    must be recomputed by the caller afterwards."""
    L = gen.num_loci
    N = gen.num_nodes
    A = ctx.num_admixed
    ar = jnp.arange(L)
    if A > 0:
        is_adm = jnp.zeros((N,), bool).at[ctx.admix_slot].set(True)
        adm_idx = jnp.zeros((N,), jnp.int32).at[ctx.admix_slot].set(
            jnp.arange(A, dtype=jnp.int32))
        pop_a = jnp.zeros((N,), jnp.int32).at[ctx.admix_slot].set(
            ctx.admix_pops[:, 0])
        pop_b = jnp.zeros((N,), jnp.int32).at[ctx.admix_slot].set(
            ctx.admix_pops[:, 1])

    def body(carry, inode):
        gen, rng_state, lnld, cond, acc = carry
        node = jnp.full((L,), inode, jnp.int32)
        not_root = gen.root != inode
        gen_sim = gen
        if A > 0:
            # admixed leaves resample their population assignment w.p. the
            # admixture coefficient before re-coalescing
            # (reference src/GPhoCS.c:2670-2696); rejection falls back to
            # the original `gen` in the final select below
            adm = is_adm[inode]
            u_adm, rng_state = R.rndu(rng_state,
                                      jnp.broadcast_to(adm, (L,)) & not_root)
            coeff = params.admix_coeff[adm_idx[inode]]
            new_pop = jnp.where(u_adm < coeff, pop_b[inode], pop_a[inode])
            resample = jnp.broadcast_to(adm, (L,)) & not_root
            gen_sim = gen._replace(node_pop=gen.node_pop.at[:, inode].set(
                jnp.where(resample, new_pop, gen.node_pop[:, inode])))
        sim = _simulate_reconnect(gen_sim, params, ctx, node, rng_state,
                                  not_root)
        rng_state = sim.rng
        ok = sim.status == 1

        gen_prop = _apply_spr(gen_sim, ctx, node, ok, sim)
        # data-likelihood delta: only f (new age/sons), the old grandfather
        # (lost son f) and the target's old father (gained son f) — plus
        # their ancestors, which the refresh discovers — are dirty
        f = gen.father[ar, node]
        g = gen.father[ar, jnp.where(f < 0, 0, f)]
        tgt_fa = gen.father[ar, sim.target]
        nid = jnp.arange(N, dtype=jnp.int32)[None, :]
        dirty0 = ((nid == f[:, None]) & (f >= 0)[:, None]) \
            | ((nid == g[:, None]) & (g >= 0)[:, None]) \
            | ((nid == tgt_fa[:, None]) & (tgt_fa >= 0)[:, None] & ok[:, None])
        cond_prop, lnld_prop = refresh_and_lnld(
            cond, gen_prop, seq, dirty0)
        lnacc = lnld_prop - lnld
        accept, rng_state = mh_accept(rng_state, lnacc, ok & gen.valid)
        gen = jax.tree_util.tree_map(
            lambda n_, o: jnp.where(
                accept.reshape((L,) + (1,) * (o.ndim - 1)), n_, o)
            if o.ndim >= 1 and o.shape[0] == L else jnp.where(accept, n_, o),
            gen_prop, gen)
        cond = jnp.where(accept[:, None, None, None], cond_prop, cond)
        lnld = jnp.where(accept, lnld_prop, lnld)
        acc = acc + jnp.sum(accept.astype(jnp.int32), dtype=jnp.int32)
        return (gen, rng_state, lnld, cond, acc), None

    init = (gen, rng_state, lnld, cond, jnp.zeros((), jnp.int32))
    (gen, rng_state, lnld, cond, acc), _ = lax.scan(
        body, init, jnp.arange(N, dtype=jnp.int32))
    return gen, rng_state, lnld, cond, acc
