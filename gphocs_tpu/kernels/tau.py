"""UpdateTau and UpdateSampleAge: rubber-band updates of population ages.

Mirrors reference src/GPhoCS.c:3224-3994 (UpdateTau) and :4006-4590
(UpdateSampleAge).  The reference's 700-line event-chain implementation
(rubberBand / rubberBandRipple, src/patch.c:596-885) reduces here to an
affine remap of node/migration ages plus a conflict scan, with the
genealogy-prior and data-likelihood deltas obtained by full functional
recomputation on the proposed state.

UpdateTau, per ancestral pop `anc` with sons (s0, s1):
  bounds:  taub0 = max(son ages, son sample ages,
                       start of bands touching a son)
           taub1 = min(father age | OLDAGE, end of bands touching anc)
  factors: f0 = (taunew-taub0)/(tauold-taub0) stretches the region below,
           f1 = (taunew-taub1)/(tauold-taub1) squeezes above (f1 := f0 for
           the root, which scales around taub0 — reference :3308-3315,
           patch.c:612-616)
  remap:   coal nodes in anc -> around taub1 by f1 (root: taub0/f0);
           coal nodes in sons above taub0 -> around taub0 by f0;
           migration events with an endpoint in {anc} -> f1; in {sons}
           (above taub0) or between both sons -> f0
  conflict: a remapped migration event must stay strictly inside its
           band's *new* window and keep its ordering against neighbor
           events on its branch (old ages) — any conflict rejects the
           whole proposal (all loci) without consuming the accept draw
  accept:  lnacc = Gamma-prior ratio + dlnP(G) + dlnld
                 + ntj0*log(f0) + ntj1*log(f1)     (Jacobian)

UpdateSampleAge applies the same machinery to a current pop's sample age
with taub = [0, father age]: everything below tauold scales by f0 around
0 (including the pop's leaves, which sit exactly at the sample age),
everything above by f1 around the father age.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import (
    Context,
    band_windows,
    gen_log_prior,
    maybe_pmax,
    maybe_psum,
    scalar_mh_accept,
)
from gphocs_tpu.ops.likelihood_cache import (
    full_rebuild_and_lnld,
    make_tables,
)
from gphocs_tpu.state import GenState, Params, SeqData
from gphocs_tpu.utils import reflect


def _mig_neighbor_ages(gen: GenState):
    """For every mig slot: age of nearest mig below/above on the same branch
    (+-inf if none), and their band ids."""
    M = gen.max_migs
    active = gen.mig_branch >= 0
    big = jnp.asarray(jnp.inf, gen.mig_age.dtype)
    same = (active[:, :, None] & active[:, None, :] &
            (gen.mig_branch[:, :, None] == gen.mig_branch[:, None, :]))
    ai = gen.mig_age[:, :, None]
    aj = gen.mig_age[:, None, :]
    idx = jnp.arange(M)
    above = same & ((aj > ai) | ((aj == ai) &
                                (idx[None, None, :] > idx[None, :, None])))
    below = same & ((aj < ai) | ((aj == ai) &
                                (idx[None, None, :] < idx[None, :, None])))
    up_age = jnp.min(jnp.where(above, aj, big), axis=2)
    up_slot = jnp.argmin(jnp.where(above, aj, big), axis=2)
    dn_age = jnp.max(jnp.where(below, aj, -big), axis=2)
    dn_slot = jnp.argmax(jnp.where(below, aj, -big), axis=2)
    return up_age, up_slot, dn_age, dn_slot


def _rubber_band_proposal(gen: GenState, params: Params, seq: SeqData,
                          ctx: Context, pop: int, is_sample_age: bool,
                          taub0, taub1, tauold, taunew,
                          lnld, lnp, tables):
    """Shared core: build the remapped state, count Jacobian terms, detect
    conflicts, and compute the likelihood deltas.

    tables: hoisted one-hot topology tables (topology is unchanged by
    rubber-band moves, so one set serves the whole pop sweep).  Returns
    (gen_prop, params_prop, cond_prop, lnld_prop, lnp_prop,
     ntj0, ntj1, conflict, lnf0, lnf1)."""
    L = gen.num_loci
    S = gen.num_samples
    dt = gen.age.dtype
    is_root = bool(pop == ctx.root_pop) and not is_sample_age

    f0 = (taunew - taub0) / (tauold - taub0)
    f1_raw = (taunew - taub1) / (tauold - taub1)
    f1 = f0 if is_root else f1_raw

    if is_sample_age:
        sons = jnp.asarray([-9, -9], jnp.int32)  # unused sentinel
        in_anc = jnp.zeros_like(gen.node_pop, bool)
        in_sons = gen.node_pop == pop
    else:
        sons = ctx.pop_sons[pop]
        in_anc = gen.node_pop == pop
        in_sons = (gen.node_pop == sons[0]) | (gen.node_pop == sons[1])

    age = gen.age
    internal = jnp.zeros((gen.num_nodes,), bool).at[S:].set(True)[None, :]

    if is_sample_age:
        # below tauold (and above taub0=0): f0 around 0; above: f1 around taub1
        lower = in_sons & (age > taub0) & (age < tauold)
        upper = in_sons & (age >= tauold) & (age < taub1)
        new_age = jnp.where(lower & internal, taub0 + f0 * (age - taub0), age)
        new_age = jnp.where(upper & internal, taub1 + f1 * (age - taub1),
                            new_age)
        # the pop's leaves sit at the sample age and move with it
        is_pop_leaf = (jnp.arange(gen.num_nodes) < S)[None, :] & (
            gen.node_pop == pop)
        new_age = jnp.where(is_pop_leaf, taunew, new_age)
        ntj0_nodes = jnp.sum(lower & internal, axis=1)
        ntj1_nodes = jnp.sum(upper & internal, axis=1)
    else:
        # the event-chain walk scales only events strictly inside the
        # window (reference patch.c:632-698: loop breaks at end_time)
        if is_root:
            anc_map = taub0 + f0 * (age - taub0)
            moved_anc = in_anc & internal
        else:
            anc_map = taub1 + f1 * (age - taub1)
            moved_anc = in_anc & internal & (age < taub1)
        moved_sons = in_sons & (age > taub0) & (age < tauold) & internal
        new_age = jnp.where(moved_anc, anc_map, age)
        new_age = jnp.where(moved_sons, taub0 + f0 * (age - taub0), new_age)
        ntj0_nodes = jnp.sum(moved_sons, axis=1)
        ntj1_nodes = jnp.sum(moved_anc, axis=1)

    # ---- migration events ----
    M = gen.max_migs
    active = gen.mig_branch >= 0
    band = jnp.where(active, gen.mig_band, 0)
    if ctx.num_bands == 0:
        ntj0 = jnp.sum(ntj0_nodes).astype(dt)
        ntj1 = jnp.sum(ntj1_nodes).astype(dt)
        if is_sample_age:
            params_prop = params._replace(
                sample_age=params.sample_age.at[pop].set(taunew))
        else:
            params_prop = params._replace(
                tau=params.tau.at[pop].set(taunew))
        gen_prop = gen._replace(age=new_age)
        cond_prop, lnld_prop = full_rebuild_and_lnld(
            gen_prop, seq, tables)
        lnp_prop = gen_log_prior(gen_prop, params_prop, ctx)
        lnf0 = jnp.log(f0)
        lnf1 = jnp.log(f1) if not is_root else jnp.log(f0)
        return (gen_prop, params_prop, cond_prop, lnld_prop, lnp_prop,
                ntj0, ntj1, jnp.asarray(False), lnf0, lnf1)
    msrc = ctx.band_source[band]
    mtgt = ctx.band_target[band]
    mage = gen.mig_age
    in_window = active & (mage >= taub0) & (mage <= taub1)

    if is_sample_age:
        src_is = msrc == pop
        tgt_is = mtgt == pop
        side1 = in_window & (src_is | tgt_is) & (mage > tauold)
        side0 = in_window & (src_is | tgt_is) & (mage <= tauold)
        new_mage = jnp.where(side1, taub1 + f1 * (mage - taub1), mage)
        new_mage = jnp.where(side0, taub0 + f0 * (mage - taub0), new_mage)
        cnt0 = side0
        cnt1 = side1
        checked = side0 | side1
        kind_out = msrc == pop   # out-migration w.r.t. the rubber-banded pop
        trio_src = msrc == pop   # neighbor exempt if its source is the pop
        trio_tgt = mtgt == pop
    else:
        s0, s1 = sons[0], sons[1]
        both_sons = in_window & (((msrc == s0) & (mtgt == s1)) |
                                 ((msrc == s1) & (mtgt == s0)))
        src_anc = in_window & ~both_sons & (msrc == pop)
        tgt_anc = in_window & ~both_sons & ~src_anc & (mtgt == pop)
        src_son = (in_window & ~both_sons & ~src_anc & ~tgt_anc
                   & ((msrc == s0) | (msrc == s1)) & (mage > taub0))
        tgt_son = (in_window & ~both_sons & ~src_anc & ~tgt_anc & ~src_son
                   & ((mtgt == s0) | (mtgt == s1)) & (mage > taub0))
        f1_sel = src_anc | tgt_anc
        f0_sel = both_sons | src_son | tgt_son
        new_mage = jnp.where(f1_sel, taub1 + f1 * (mage - taub1), mage)
        new_mage = jnp.where(f0_sel, taub0 + f0 * (mage - taub0), new_mage)
        cnt0 = f0_sel
        cnt1 = f1_sel
        checked = src_anc | tgt_anc | src_son | tgt_son  # both_sons unchecked
        kind_out = src_anc | src_son
        in_trio = lambda p: (p == pop) | (p == s0) | (p == s1)  # noqa: E731
        trio_src = in_trio(msrc)
        trio_tgt = in_trio(mtgt)

    ntj0 = jnp.sum(ntj0_nodes) + jnp.sum(cnt0)
    ntj1 = jnp.sum(ntj1_nodes) + jnp.sum(cnt1)

    # ---- conflicts (checked against the NEW band windows, OLD node ages,
    #      OLD neighbor mig ages; reference :3606-3680 / :4246-4311) ----
    if is_sample_age:
        new_tau = params.tau
        params_prop = params._replace(
            sample_age=params.sample_age.at[pop].set(taunew))
    else:
        new_tau = params.tau.at[pop].set(taunew)
        params_prop = params._replace(tau=new_tau)
    bs_new, be_new = band_windows(ctx, new_tau)

    up_age, up_slot, dn_age, dn_slot = _mig_neighbor_ages(gen)
    branch = jnp.where(active, gen.mig_branch, 0)
    fa = jnp.take_along_axis(gen.father, branch, axis=1)         # [L, M]
    fa_age = jnp.take_along_axis(gen.age, jnp.where(fa < 0, 0, fa), axis=1)
    child_age = jnp.take_along_axis(gen.age, branch, axis=1)

    conflict = checked & ((new_mage >= be_new[band]) |
                          (new_mage <= bs_new[band]))
    # in-migration moving up: conflict with the next event above on branch
    moving_up = checked & ~kind_out & (new_mage > mage)
    up_src = ctx.band_source[jnp.take_along_axis(band, up_slot, axis=1)]
    up_exists = jnp.isfinite(up_age)
    if is_sample_age:
        up_exempt = up_src == pop
    else:
        up_exempt = ((up_src == pop) | (up_src == sons[0]) |
                     (up_src == sons[1]))
    conflict = conflict | (moving_up & up_exists & ~up_exempt &
                           (new_mage >= up_age))
    conflict = conflict | (moving_up & (fa >= 0) & (new_mage >= fa_age))
    # out-migration moving down: conflict with the next event below
    moving_dn = checked & kind_out & (new_mage < mage)
    dn_tgt = ctx.band_target[jnp.take_along_axis(band, dn_slot, axis=1)]
    dn_exists = jnp.isfinite(dn_age)
    if is_sample_age:
        dn_exempt = dn_tgt == pop
    else:
        dn_exempt = ((dn_tgt == pop) | (dn_tgt == sons[0]) |
                     (dn_tgt == sons[1]))
    conflict = conflict | (moving_dn & dn_exists & ~dn_exempt &
                           (new_mage <= dn_age))
    conflict = conflict | (moving_dn & (new_mage <= child_age))
    any_conflict = jnp.any(conflict)

    gen_prop = gen._replace(age=new_age,
                            mig_age=jnp.where(active, new_mage, gen.mig_age))
    cond_prop, lnld_prop = full_rebuild_and_lnld(
        gen_prop, seq, tables)
    lnp_prop = gen_log_prior(gen_prop, params_prop, ctx)

    lnf0 = jnp.log(f0)
    lnf1 = jnp.log(f1) if not is_root else jnp.log(f0)
    return (gen_prop, params_prop, cond_prop, lnld_prop, lnp_prop,
            ntj0.astype(dt), ntj1.astype(dt), any_conflict, lnf0, lnf1)


def _select(cond, new, old):
    return jnp.where(cond, new, old)


def _globalize_decision(ntj0, ntj1, conflict, loci_axis):
    """Jacobian counts and the conflict flag are shard-local quantities
    (sums / any over the local loci shard); the MH decision is global.
    Reduce them over the loci mesh axis so every shard computes the same
    lnacc, consumes (or skips) the same accept draw, and commits the same
    replicated params/tau — the twins of the reference's atomic ntj
    accumulation and shared mig_conflict flag (src/GPhoCS.c:3611-3624)."""
    ntj0 = maybe_psum(ntj0, loci_axis)
    ntj1 = maybe_psum(ntj1, loci_axis)
    conflict = maybe_pmax(jnp.asarray(conflict, jnp.int32), loci_axis) > 0
    return ntj0, ntj1, conflict


def update_taus(gen: GenState, params: Params, seq: SeqData, rng_state,
                ctx: Context, finetunes_taus, lnld, lnp, cond,
                num_pops: int, num_cur_pops: int, loci_axis=None):
    """Sweep over ancestral pops (reference UpdateTau).

    finetunes_taus: [P] per-pop step sizes.  Returns
    (gen, params, rng_state, lnld, lnp, cond, accepted[P], conflicts)."""
    accepted = jnp.zeros((num_pops,), jnp.int32)
    conflicts = jnp.zeros((), jnp.int32)
    tables = make_tables(gen)  # rubber-band never changes topology
    for pop in range(num_cur_pops, num_pops):
        is_root = pop == num_pops - 1
        sons = ctx.pop_sons[pop]
        tauold = params.tau[pop]
        taub0 = jnp.maximum(
            jnp.maximum(params.tau[sons[0]], params.tau[sons[1]]),
            jnp.maximum(params.sample_age[sons[0]],
                        params.sample_age[sons[1]]))
        taub1 = (jnp.asarray(ctx.oldage, lnld.dtype) if is_root
                 else params.tau[ctx.father_pop[pop]])
        # band liveness constraints (current windows; reference :3279-3294)
        if ctx.num_bands > 0:
            bs, be = band_windows(ctx, params.tau)
            src, tgt = ctx.band_source, ctx.band_target
            touch_anc = (src == pop) | (tgt == pop)
            touch_son = (~touch_anc & ((src == sons[0]) | (src == sons[1]) |
                                       (tgt == sons[0]) | (tgt == sons[1])))
            taub1 = jnp.minimum(taub1, jnp.min(jnp.where(touch_anc, be,
                                                         jnp.inf)))
            taub0 = jnp.maximum(taub0, jnp.max(jnp.where(touch_son, bs,
                                                         -jnp.inf)))

        z, rng_state = R.general_draw_2normal8(rng_state)
        taunew = reflect(tauold + finetunes_taus[pop] * z,
                         taub0, taub1).astype(lnld.dtype)

        (gen_p, params_p, cond_p, lnld_p, lnp_p, ntj0, ntj1, conflict,
         lnf0, lnf1) = \
            _rubber_band_proposal(gen, params, seq, ctx, pop, False,
                                  taub0, taub1, tauold, taunew, lnld, lnp,
                                  tables)
        ntj0, ntj1, conflict = _globalize_decision(ntj0, ntj1, conflict,
                                                   loci_axis)

        lnacc = (jnp.log(taunew / tauold) * (ctx.tau_alpha[pop] - 1.0)
                 - (taunew - tauold) * ctx.tau_beta[pop]
                 + maybe_psum(jnp.sum(lnld_p - lnld), loci_axis)
                 + maybe_psum(jnp.sum(lnp_p - lnp), loci_axis)
                 + ntj0 * lnf0 + ntj1 * lnf1)
        accept, rng_state = scalar_mh_accept(rng_state, lnacc, conflict)

        gen = jax.tree_util.tree_map(lambda n, o: _select(accept, n, o),
                                     gen_p, gen)
        params = jax.tree_util.tree_map(lambda n, o: _select(accept, n, o),
                                        params_p, params)
        cond = _select(accept, cond_p, cond)
        lnld = _select(accept, lnld_p, lnld)
        lnp = _select(accept, lnp_p, lnp)
        accepted = accepted.at[pop].add(accept.astype(jnp.int32))
        conflicts = conflicts + conflict.astype(jnp.int32)
    return gen, params, rng_state, lnld, lnp, cond, accepted, conflicts


def update_taus_fused(gen: GenState, params: Params, seq: SeqData,
                      rng_state, ctx: Context, finetunes_taus, lnld, lnp,
                      cond, num_pops: int, num_cur_pops: int,
                      interpret: bool = False, loci_axis=None):
    """Fused-production twin of update_taus: identical control flow and
    general-stream RNG consumption, with the per-locus proposal
    evaluation (remap + conflicts + rebuild + prior) in one VMEM-resident
    Pallas call per population (ops/sweeps_pallas.rubber_band_eval_pallas).
    """
    from gphocs_tpu.ops.sweeps_pallas import rubber_band_eval_pallas

    accepted = jnp.zeros((num_pops,), jnp.int32)
    conflicts = jnp.zeros((), jnp.int32)
    for pop in range(num_cur_pops, num_pops):
        is_root = pop == num_pops - 1
        sons = ctx.pop_sons[pop]
        tauold = params.tau[pop]
        taub0 = jnp.maximum(
            jnp.maximum(params.tau[sons[0]], params.tau[sons[1]]),
            jnp.maximum(params.sample_age[sons[0]],
                        params.sample_age[sons[1]]))
        taub1 = (jnp.asarray(ctx.oldage, lnld.dtype) if is_root
                 else params.tau[ctx.father_pop[pop]])
        if ctx.num_bands > 0:
            bs, be = band_windows(ctx, params.tau)
            src, tgt = ctx.band_source, ctx.band_target
            touch_anc = (src == pop) | (tgt == pop)
            touch_son = (~touch_anc & ((src == sons[0]) | (src == sons[1]) |
                                       (tgt == sons[0]) | (tgt == sons[1])))
            taub1 = jnp.minimum(taub1, jnp.min(jnp.where(touch_anc, be,
                                                         jnp.inf)))
            taub0 = jnp.maximum(taub0, jnp.max(jnp.where(touch_son, bs,
                                                         -jnp.inf)))

        z, rng_state = R.general_draw_2normal8(rng_state)
        taunew = reflect(tauold + finetunes_taus[pop] * z,
                         taub0, taub1).astype(lnld.dtype)

        (age_p, mag_p, cond_p, lnld_p, lnp_p, ntj0, ntj1, conflict) = \
            rubber_band_eval_pallas(gen, params, seq, ctx, pop, False,
                                    taub0, taub1, tauold, taunew, cond,
                                    interpret=interpret)
        ntj0, ntj1, conflict = _globalize_decision(ntj0, ntj1, conflict,
                                                   loci_axis)
        params_p = params._replace(tau=params.tau.at[pop].set(taunew))
        lnf0 = jnp.log((taunew - taub0) / (tauold - taub0))
        lnf1 = lnf0 if is_root else jnp.log((taunew - taub1)
                                            / (tauold - taub1))

        lnacc = (jnp.log(taunew / tauold) * (ctx.tau_alpha[pop] - 1.0)
                 - (taunew - tauold) * ctx.tau_beta[pop]
                 + maybe_psum(jnp.sum(lnld_p - lnld), loci_axis)
                 + maybe_psum(jnp.sum(lnp_p - lnp), loci_axis)
                 + ntj0 * lnf0 + ntj1 * lnf1)
        accept, rng_state = scalar_mh_accept(rng_state, lnacc, conflict)

        gen = gen._replace(
            age=_select(accept, age_p, gen.age),
            mig_age=_select(accept, mag_p, gen.mig_age))
        params = jax.tree_util.tree_map(lambda n, o: _select(accept, n, o),
                                        params_p, params)
        cond = _select(accept, cond_p, cond)
        lnld = _select(accept, lnld_p, lnld)
        lnp = _select(accept, lnp_p, lnp)
        accepted = accepted.at[pop].add(accept.astype(jnp.int32))
        conflicts = conflicts + conflict.astype(jnp.int32)
    return gen, params, rng_state, lnld, lnp, cond, accepted, conflicts


def update_sample_ages_fused(gen: GenState, params: Params, seq: SeqData,
                             rng_state, ctx: Context, finetunes_taus, lnld,
                             lnp, cond, num_cur_pops: int, update_mask,
                             interpret: bool = False, loci_axis=None):
    """Fused twin of update_sample_ages (same kernel, sample-age mode)."""
    from gphocs_tpu.ops.sweeps_pallas import rubber_band_eval_pallas

    P = params.tau.shape[0]
    accepted = jnp.zeros((P,), jnp.int32)
    conflicts = jnp.zeros((), jnp.int32)
    for pop in range(num_cur_pops):
        if not update_mask[pop]:
            continue
        tauold = params.sample_age[pop]
        taub0 = jnp.zeros((), lnld.dtype)
        taub1 = params.tau[ctx.father_pop[pop]]
        z, rng_state = R.general_draw_2normal8(rng_state)
        taunew = reflect(tauold + finetunes_taus[pop] * z,
                         taub0, taub1).astype(lnld.dtype)

        (age_p, mag_p, cond_p, lnld_p, lnp_p, ntj0, ntj1, conflict) = \
            rubber_band_eval_pallas(gen, params, seq, ctx, pop, True,
                                    taub0, taub1, tauold, taunew, cond,
                                    interpret=interpret)
        ntj0, ntj1, conflict = _globalize_decision(ntj0, ntj1, conflict,
                                                   loci_axis)
        params_p = params._replace(
            sample_age=params.sample_age.at[pop].set(taunew))
        lnf0 = jnp.log((taunew - taub0) / (tauold - taub0))
        lnf1 = jnp.log((taunew - taub1) / (tauold - taub1))

        lnacc = (jnp.log(taunew / tauold) * (ctx.tau_alpha[pop] - 1.0)
                 - (taunew - tauold) * ctx.tau_beta[pop]
                 + maybe_psum(jnp.sum(lnld_p - lnld), loci_axis)
                 + maybe_psum(jnp.sum(lnp_p - lnp), loci_axis)
                 + ntj0 * lnf0 + ntj1 * lnf1)
        accept, rng_state = scalar_mh_accept(rng_state, lnacc, conflict)

        gen = gen._replace(
            age=_select(accept, age_p, gen.age),
            mig_age=_select(accept, mag_p, gen.mig_age))
        params = jax.tree_util.tree_map(lambda n, o: _select(accept, n, o),
                                        params_p, params)
        cond = _select(accept, cond_p, cond)
        lnld = _select(accept, lnld_p, lnld)
        lnp = _select(accept, lnp_p, lnp)
        accepted = accepted.at[pop].add(accept.astype(jnp.int32))
        conflicts = conflicts + conflict.astype(jnp.int32)
    return gen, params, rng_state, lnld, lnp, cond, accepted, conflicts


def update_sample_ages(gen: GenState, params: Params, seq: SeqData, rng_state,
                       ctx: Context, finetunes_taus, lnld, lnp, cond,
                       num_cur_pops: int, update_mask, loci_axis=None):
    """Sweep over current pops with estimated sample ages
    (reference UpdateSampleAge).  update_mask: python list of bools."""
    P = params.tau.shape[0]
    accepted = jnp.zeros((P,), jnp.int32)
    conflicts = jnp.zeros((), jnp.int32)
    tables = make_tables(gen)
    for pop in range(num_cur_pops):
        if not update_mask[pop]:
            continue
        tauold = params.sample_age[pop]
        taub0 = jnp.zeros((), lnld.dtype)
        taub1 = params.tau[ctx.father_pop[pop]]
        z, rng_state = R.general_draw_2normal8(rng_state)
        taunew = reflect(tauold + finetunes_taus[pop] * z,
                         taub0, taub1).astype(lnld.dtype)

        (gen_p, params_p, cond_p, lnld_p, lnp_p, ntj0, ntj1, conflict,
         lnf0, lnf1) = \
            _rubber_band_proposal(gen, params, seq, ctx, pop, True,
                                  taub0, taub1, tauold, taunew, lnld, lnp,
                                  tables)
        ntj0, ntj1, conflict = _globalize_decision(ntj0, ntj1, conflict,
                                                   loci_axis)

        lnacc = (jnp.log(taunew / tauold) * (ctx.tau_alpha[pop] - 1.0)
                 - (taunew - tauold) * ctx.tau_beta[pop]
                 + maybe_psum(jnp.sum(lnld_p - lnld), loci_axis)
                 + maybe_psum(jnp.sum(lnp_p - lnp), loci_axis)
                 + ntj0 * lnf0 + ntj1 * lnf1)
        accept, rng_state = scalar_mh_accept(rng_state, lnacc, conflict)

        gen = jax.tree_util.tree_map(lambda n, o: _select(accept, n, o),
                                     gen_p, gen)
        params = jax.tree_util.tree_map(lambda n, o: _select(accept, n, o),
                                        params_p, params)
        cond = _select(accept, cond_p, cond)
        lnld = _select(accept, lnld_p, lnld)
        lnp = _select(accept, lnp_p, lnp)
        accepted = accepted.at[pop].add(accept.astype(jnp.int32))
        conflicts = conflicts + conflict.astype(jnp.int32)
    return gen, params, rng_state, lnld, lnp, cond, accepted, conflicts
