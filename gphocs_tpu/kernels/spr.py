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
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import Context, band_windows, mh_accept
from gphocs_tpu.ops.pruning import data_log_likelihood
from gphocs_tpu.state import GenState, Params, SeqData


def _branch_pop_at(gen: GenState, ctx: Context, t: jnp.ndarray):
    """Base population of every branch's trajectory at per-locus time t.

    [L, N]: source pop of the last migration event below t on the branch,
    or node_pop if none (reference getEdgesForTimePop, src/patch.c:526-571).
    """
    L, N = gen.father.shape
    active = gen.mig_branch >= 0
    below = active & (gen.mig_age < t[:, None])                    # [L, M]
    # for each branch: the mig below t with max age
    age_key = jnp.where(below, gen.mig_age, -jnp.inf)              # [L, M]
    onb = (gen.mig_branch[:, None, :] ==
           jnp.arange(N, dtype=jnp.int32)[None, :, None])          # [L, N, M]
    keyed = jnp.where(onb, age_key[:, None, :], -jnp.inf)
    if ctx.num_bands == 0:
        return gen.node_pop
    best = jnp.argmax(keyed, axis=2)                               # [L, N]
    has = jnp.any(jnp.isfinite(keyed) & (keyed > -jnp.inf), axis=2)
    band = jnp.take_along_axis(gen.mig_band, best, axis=1)
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
    top = _edge_top(gen, ctx)
    alive = (gen.age <= t[:, None]) & (t[:, None] < top)
    alive = alive & (jnp.arange(N)[None, :] != exclude[:, None])
    traj = _branch_pop_at(gen, ctx, t)
    inpop = ctx.is_ancestral[pop[:, None], traj]
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
    """Batched traceLineage(reconnect=1).  node: [L] pruned branch.

    Returns _SimState after completion for every locus (status != 0).
    Lanes with active0=False never run (status pre-set to -2 = skip)."""
    L = gen.num_loci
    N = gen.num_nodes
    M = gen.max_migs
    Bn = ctx.num_bands
    dt = gen.age.dtype
    S = gen.num_samples

    bs, be = band_windows(ctx, params.tau)
    pe = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage, dt),
                   params.tau[jnp.where(ctx.father_pop < 0, 0,
                                        ctx.father_pop)])

    # existing migration capacity: active events minus those on the pruned
    # edge (they will be removed if the proposal is accepted)
    act = gen.mig_branch >= 0
    on_pruned = act & (gen.mig_branch == node[:, None])
    base_migs = jnp.sum(act, axis=1) - jnp.sum(on_pruned, axis=1)

    start_pop = gen.node_pop[jnp.arange(L), node]
    start_age = gen.age[jnp.arange(L), node]

    top_all = _edge_top(gen, ctx)   # [L, N] static during simulation

    max_iters = 4 * (N + 2 * M + 2 * Bn + ctx.num_pops) + 64

    def boundary(pop, age, exclude):
        """Next event time strictly above `age` in `pop`, capped at pop top."""
        big = jnp.asarray(jnp.inf, dt)
        # coal node times of nodes whose chain-pop is pop:
        # a coal event sits in the chain of its own node_pop
        cand = jnp.where((gen.node_pop == pop[:, None])
                         & (gen.age > age[:, None])
                         & (jnp.arange(N)[None, :] != exclude[:, None]),
                         gen.age, big)
        t = jnp.min(cand, axis=1)
        # migration events: IN_MIG in the band's target pop, OUT_MIG in source
        if Bn > 0:
            mb = jnp.where(act, gen.mig_band, 0)
            non_pruned = act & (gen.mig_branch != exclude[:, None])
            m_in = non_pruned & (ctx.band_target[mb] == pop[:, None])
            m_out = non_pruned & (ctx.band_source[mb] == pop[:, None])
            cand_m = jnp.where((m_in | m_out) & (gen.mig_age > age[:, None]),
                               gen.mig_age, big)
            t = jnp.minimum(t, jnp.min(cand_m, axis=1))
            # band window edges for bands targeting pop
            tgt_here = ctx.band_target[None, :] == pop[:, None]
            for arr in (bs, be):
                cand_b = jnp.where(tgt_here & (arr[None, :] > age[:, None]),
                                   arr[None, :], big)
                t = jnp.minimum(t, jnp.min(cand_b, axis=1))
        # sample-start events of current pops
        samp = (ctx.sample_pop[None, :] * 0
                + params.sample_age[ctx.sample_pop][None, :])
        samp_pop = ctx.sample_pop[None, :] == pop[:, None]
        cand_s = jnp.where(samp_pop & (samp > age[:, None]), samp, big)
        t = jnp.minimum(t, jnp.min(cand_s, axis=1))
        return jnp.minimum(t, pe[pop])

    def live_rate(pop, age):
        """(total mig rate, [L, B] live mask) of bands into pop at time age."""
        if Bn == 0:
            return jnp.zeros((L,), dt), jnp.zeros((L, 0), bool)
        live = ((ctx.band_target[None, :] == pop[:, None])
                & (bs[None, :] <= age[:, None])
                & (be[None, :] > age[:, None]))
        rate = jnp.sum(jnp.where(live, params.mig_rate[None, :], 0.0), axis=1)
        return rate, live

    def cond(st: _SimState):
        return jnp.any(st.status == 0) & (st.iters < max_iters)

    def body(st: _SimState):
        alive = st.status == 0
        nb = boundary(st.pop, st.age, node)
        elapsed = nb - st.age
        mig_rate, live = live_rate(st.pop, st.age)
        tmid = (st.age + nb) * 0.5
        cover = _covering_mask(gen, ctx, tmid, st.pop, node)
        n = jnp.sum(cover, axis=1).astype(dt)
        theta = params.theta[st.pop]
        rate = mig_rate + 2.0 * n / theta

        draw_mask = alive & (rate > 0.0)
        u1, rng = R.rndu(st.rng, draw_mask)
        tdraw = jnp.where(rate > 0.0,
                          -jnp.log(jnp.maximum(u1, 1e-300)) / rate,
                          elapsed)
        no_event = tdraw >= elapsed

        # --- no event: advance to boundary; if at pop top, ascend ---
        at_top = no_event & (nb >= pe[st.pop] - 0.0)
        exits_root = at_top & (st.pop == ctx.root_pop)
        new_pop_a = jnp.where(at_top & ~exits_root,
                              ctx.father_pop[st.pop], st.pop)
        new_age_a = nb

        # --- event: draw type ---
        ev_mask = alive & ~no_event
        u2, rng = R.rndu(rng, ev_mask)
        esample = u2 * rate
        is_mig = ev_mask & (esample < mig_rate) & (Bn > 0)
        t_event = st.age + tdraw

        # migration: capacity check + band choice (cumulative in band order)
        over_cap = is_mig & (base_migs + st.n_new + 1 > M)
        if Bn > 0:
            rates_live = jnp.where(live, params.mig_rate[None, :], 0.0)
            cum = jnp.cumsum(rates_live, axis=1)
            chosen = jnp.argmax(
                (cum > esample[:, None]) & live, axis=1).astype(jnp.int32)
            src_pop = ctx.band_source[chosen]
        else:
            chosen = jnp.zeros((L,), jnp.int32)
            src_pop = st.pop
        do_mig = is_mig & ~over_cap
        slot = jnp.clip(st.n_new, 0, M - 1)
        new_band = jnp.where(
            do_mig[:, None]
            & (jnp.arange(M)[None, :] == slot[:, None]),
            chosen[:, None], st.new_band)
        new_age_arr = jnp.where(
            do_mig[:, None]
            & (jnp.arange(M)[None, :] == slot[:, None]),
            t_event[:, None], st.new_age)
        n_new = st.n_new + do_mig.astype(jnp.int32)

        # coalescence: pick the i-th covering branch in node-id order
        is_coal = ev_mask & ~is_mig
        i_pick = jnp.floor((esample - mig_rate) * theta / 2.0).astype(jnp.int32)
        i_pick = jnp.clip(i_pick, 0, jnp.maximum(
            jnp.sum(cover, axis=1) - 1, 0))
        csum = jnp.cumsum(cover.astype(jnp.int32), axis=1)
        tgt = jnp.argmax(csum > i_pick[:, None], axis=1).astype(jnp.int32)
        coal_ok = is_coal & (n > 0)

        # --- merge transitions ---
        status = st.status
        status = jnp.where(alive & exits_root, -1, status)
        status = jnp.where(over_cap, -1, status)
        status = jnp.where(coal_ok, 1, status)
        # degenerate: coalescence drawn with n == 0 cannot happen since then
        # rate == mig_rate and esample < mig_rate; keep as safety reject
        status = jnp.where(is_coal & (n <= 0), -1, status)

        pop = jnp.where(alive & no_event, new_pop_a, st.pop)
        pop = jnp.where(do_mig, src_pop, pop)
        age = jnp.where(alive & no_event, new_age_a, st.age)
        age = jnp.where(ev_mask, t_event, age)

        target = jnp.where(coal_ok, tgt, st.target)
        coal_age = jnp.where(coal_ok, t_event, st.coal_age)

        return _SimState(pop=pop, age=age, status=status, rng=rng,
                         n_new=n_new, new_band=new_band, new_age=new_age_arr,
                         target=target, coal_age=coal_age,
                         iters=st.iters + 1)

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
    # safety: lanes still running after max_iters are rejected
    return st._replace(status=jnp.where(st.status == 0, -1, st.status))


def _apply_spr(gen: GenState, ctx: Context, node, accept, sim: _SimState):
    """Rewire topology + migration events for accepted lanes."""
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

    # --- ages and father-pop of f ---
    age = gen.age.at[ar, f_safe].set(
        jnp.where(accept, t_new, gen.age[ar, f_safe]))
    node_pop = gen.node_pop.at[ar, f_safe].set(
        jnp.where(accept, sim.pop, gen.node_pop[ar, f_safe]))

    # --- topology rewires (only when topo_change) ---
    def upd(arr, idx, val, mask):
        idx_safe = jnp.where(idx < 0, 0, idx)
        old = arr[ar, idx_safe]
        return arr.at[ar, idx_safe].set(jnp.where(mask & (idx >= 0), val, old))

    father = gen.father
    lson = gen.lson
    rson = gen.rson
    # sibling -> grandfather
    father = upd(father, sib, g, topo_change)
    # grandfather replaces son f by sibling
    g_has = topo_change & (g >= 0)
    g_safe = jnp.where(g < 0, 0, g)
    lson = lson.at[ar, g_safe].set(
        jnp.where(g_has & (gen.lson[ar, g_safe] == f), sib,
                  lson[ar, g_safe]))
    rson = rson.at[ar, g_safe].set(
        jnp.where(g_has & (gen.rson[ar, g_safe] == f), sib,
                  rson[ar, g_safe]))
    # father f regrafts onto target edge
    father = upd(father, f, tgt_fa, topo_change)
    lson = upd(lson, f, node, topo_change)
    rson = upd(rson, f, target, topo_change)
    father = upd(father, target, f, topo_change)
    tf_has = topo_change & (tgt_fa >= 0)
    tf_safe = jnp.where(tgt_fa < 0, 0, tgt_fa)
    # guard: if tgt_fa == g the son-slot update above may already have
    # replaced f with sib there; compare against current arrays
    lson = lson.at[ar, tf_safe].set(
        jnp.where(tf_has & (lson[ar, tf_safe] == target), f,
                  lson[ar, tf_safe]))
    rson = rson.at[ar, tf_safe].set(
        jnp.where(tf_has & (rson[ar, tf_safe] == target), f,
                  rson[ar, tf_safe]))
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

    # add the new simulated events into free slots (branch = node)
    def add_new(carry, k):
        mig_branch, mig_band, mig_age = carry
        want = accept & (k < sim.n_new)
        free = mig_branch < 0
        # first free slot
        slot = jnp.argmax(free, axis=1)
        has_free = jnp.any(free, axis=1)
        put = want & has_free
        mig_branch = mig_branch.at[ar, slot].set(
            jnp.where(put, node, mig_branch[ar, slot]))
        mig_band = mig_band.at[ar, slot].set(
            jnp.where(put, sim.new_band[ar, k], mig_band[ar, slot]))
        mig_age = mig_age.at[ar, slot].set(
            jnp.where(put, sim.new_age[ar, k], mig_age[ar, slot]))
        return (mig_branch, mig_band, mig_age), None

    (mig_branch, mig_band, mig_age), _ = lax.scan(
        add_new, (mig_branch, mig_band, mig_age),
        jnp.arange(M, dtype=jnp.int32))

    return gen._replace(father=father, lson=lson, rson=rson, age=age,
                        node_pop=node_pop, root=root,
                        mig_branch=mig_branch, mig_band=mig_band,
                        mig_age=mig_age)


def update_spr(gen: GenState, params: Params, seq: SeqData, rng_state,
               ctx: Context, lnld: jnp.ndarray):
    """One full SPR sweep over all nodes.  Returns
    (gen, rng_state, lnld, accepted_count).  The genealogy log-prior must
    be recomputed by the caller afterwards."""
    L = gen.num_loci
    N = gen.num_nodes

    def body(carry, inode):
        gen, rng_state, lnld, acc = carry
        node = jnp.full((L,), inode, jnp.int32)
        not_root = gen.root != inode
        sim = _simulate_reconnect(gen, params, ctx, node, rng_state, not_root)
        rng_state = sim.rng
        ok = sim.status == 1

        gen_prop = _apply_spr(gen, ctx, node, ok, sim)
        lnld_prop = data_log_likelihood(gen_prop, seq)
        lnacc = lnld_prop - lnld
        accept, rng_state = mh_accept(rng_state, lnacc, ok)
        gen = jax.tree_util.tree_map(
            lambda n_, o: jnp.where(
                accept.reshape((L,) + (1,) * (o.ndim - 1)), n_, o)
            if o.ndim >= 1 and o.shape[0] == L else jnp.where(accept, n_, o),
            gen_prop, gen)
        lnld = jnp.where(accept, lnld_prop, lnld)
        acc = acc + jnp.sum(accept.astype(jnp.int32), dtype=jnp.int32)
        return (gen, rng_state, lnld, acc), None

    init = (gen, rng_state, lnld, jnp.zeros((), jnp.int32))
    (gen, rng_state, lnld, acc), _ = lax.scan(
        body, init, jnp.arange(N, dtype=jnp.int32))
    return gen, rng_state, lnld, acc
