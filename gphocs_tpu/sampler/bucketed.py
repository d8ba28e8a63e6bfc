"""Pattern-bucketed iteration: ragged loci without global max-P padding.

The reference stores exact per-locus pattern profiles
(src/AlignmentProcessor.h:25-31); fixed-shape tensors force padding.
Padding every locus to the GLOBAL max pattern count multiplies memory and
compute by the worst locus (round-2 gap, VERDICT #22/#4).  Here loci are
sorted by phased-pattern count and split into a few contiguous buckets;
each bucket's tensors pad only to the bucket max, so memory and sweep
compute scale with sum_k L_k * P_k instead of L * P_max.

Bucket structure (mirrors mesh sharding: buckets are just more shards):
  * per-locus sweeps (node ages, migration ages, SPR, locus rates) run
    independently per bucket — each bucket gets its own compiled kernel
    instance (own pattern capacity);
  * global scalar updates (theta, migration rates) see CONCATENATED
    sufficient statistics — identical math to the single-bucket path
    (the reference's omp-atomic totals, src/GPhoCS.c:2413-2424);
  * rubber-band updates (tau, sample ages) and mixing propose ONCE from
    the general stream, accumulate per-bucket deltas/Jacobian counts and
    conflicts, and apply one joint accept across all buckets — exactly
    the reference's single global decision over all loci.

Fast-RNG mode only (per-bucket counter streams are independent because
every locus keeps its own key).  Admixture is not supported in bucketed
mode (fall back to one bucket).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gphocs_tpu.kernels.common import (Context, band_windows, full_stats,
                                       gen_log_prior, maybe_pmax,
                                       maybe_psum, scalar_mh_accept)
from gphocs_tpu.kernels.locus_rate import update_locus_rates_paired
from gphocs_tpu.kernels.mig_age import update_mig_ages
from gphocs_tpu.kernels.node_age import update_internal_node_ages
from gphocs_tpu.kernels.scalar_params import update_mig_rates, update_thetas
from gphocs_tpu.kernels.spr import update_spr
from gphocs_tpu.kernels.tau import _rubber_band_proposal
from gphocs_tpu.ops.likelihood_cache import make_tables
from gphocs_tpu.ops.coalstats import CoalStats
from gphocs_tpu.sampler.step import Finetunes, StepStats, ChunkTrace
from gphocs_tpu import rng as R
from gphocs_tpu.ops.sweeps_pallas import (node_age_sweep_pallas,
                                          spr_sweep_pallas)
from gphocs_tpu.state import Params
from gphocs_tpu.utils import reflect


def _cat_stats(stats_list) -> CoalStats:
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *stats_list)


def _split(x, sizes):
    out = []
    off = 0
    for n in sizes:
        out.append(x[off:off + n])
        off += n
    return tuple(out)


def _taus_bucketed(gens, params, seqs, grng, ctx, finetunes_taus,
                   lnlds, lnps, conds, num_pops, num_cur_pops,
                   loci_axis=None):
    """Joint-accept UpdateTau over buckets (reference src/GPhoCS.c:3224)."""
    K = len(gens)
    accepted = jnp.zeros((num_pops,), jnp.int32)
    conflicts = jnp.zeros((), jnp.int32)
    tables = [make_tables(g) for g in gens]
    gens, lnlds, lnps, conds = list(gens), list(lnlds), list(lnps), list(conds)
    for pop in range(num_cur_pops, num_pops):
        is_root = pop == num_pops - 1
        sons = ctx.pop_sons[pop]
        dt = lnlds[0].dtype
        tauold = params.tau[pop]
        taub0 = jnp.maximum(
            jnp.maximum(params.tau[sons[0]], params.tau[sons[1]]),
            jnp.maximum(params.sample_age[sons[0]],
                        params.sample_age[sons[1]]))
        taub1 = (jnp.asarray(ctx.oldage, dt) if is_root
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
        z, grng = R.general_draw_2normal8(grng)
        taunew = reflect(tauold + finetunes_taus[pop] * z,
                         taub0, taub1).astype(dt)

        props = []
        lnacc = (jnp.log(taunew / tauold) * (ctx.tau_alpha[pop] - 1.0)
                 - (taunew - tauold) * ctx.tau_beta[pop])
        dsum = jnp.zeros((), dt)
        ntj0 = jnp.zeros((), dt)
        ntj1 = jnp.zeros((), dt)
        conflict = jnp.asarray(False)
        params_p = params
        lnf0 = lnf1 = None
        for k in range(K):
            (gen_p, params_p, cond_p, lnld_p, lnp_p, n0, n1, cf,
             lnf0, lnf1) = _rubber_band_proposal(
                gens[k], params, seqs[k], ctx, pop, False,
                taub0, taub1, tauold, taunew, lnlds[k], lnps[k], tables[k])
            props.append((gen_p, cond_p, lnld_p, lnp_p))
            dsum = dsum + jnp.sum(lnld_p - lnlds[k]) \
                + jnp.sum(lnp_p - lnps[k])
            ntj0 = ntj0 + n0
            ntj1 = ntj1 + n1
            conflict = conflict | cf
        # cross-bucket accumulators are still shard-local under the loci
        # mesh: all-reduce them before the single global decision (the
        # reference's atomic ntj accumulation + shared mig_conflict flag)
        dsum = maybe_psum(dsum, loci_axis)
        ntj0 = maybe_psum(ntj0, loci_axis)
        ntj1 = maybe_psum(ntj1, loci_axis)
        conflict = maybe_pmax(jnp.asarray(conflict, jnp.int32),
                              loci_axis) > 0
        lnacc = lnacc + dsum + ntj0 * lnf0 + ntj1 * lnf1
        accept, grng = scalar_mh_accept(grng, lnacc, conflict)

        sel = lambda n, o: jnp.where(accept, n, o)  # noqa: E731
        params = jax.tree_util.tree_map(sel, params_p, params)
        for k in range(K):
            gen_p, cond_p, lnld_p, lnp_p = props[k]
            gens[k] = jax.tree_util.tree_map(sel, gen_p, gens[k])
            conds[k] = sel(cond_p, conds[k])
            lnlds[k] = sel(lnld_p, lnlds[k])
            lnps[k] = sel(lnp_p, lnps[k])
        accepted = accepted.at[pop].add(accept.astype(jnp.int32))
        conflicts = conflicts + conflict.astype(jnp.int32)
    return (tuple(gens), params, grng, tuple(lnlds), tuple(lnps),
            tuple(conds), accepted, conflicts)


def _sample_ages_bucketed(gens, params, seqs, grng, ctx, finetunes_taus,
                          lnlds, lnps, conds, num_cur_pops, update_mask,
                          loci_axis=None):
    """Joint-accept UpdateSampleAge over buckets (src/GPhoCS.c:4006)."""
    K = len(gens)
    P = params.tau.shape[0]
    accepted = jnp.zeros((P,), jnp.int32)
    conflicts = jnp.zeros((), jnp.int32)
    tables = [make_tables(g) for g in gens]
    gens, lnlds, lnps, conds = list(gens), list(lnlds), list(lnps), list(conds)
    for pop in range(num_cur_pops):
        if not update_mask[pop]:
            continue
        dt = lnlds[0].dtype
        tauold = params.sample_age[pop]
        taub0 = jnp.zeros((), dt)
        taub1 = params.tau[ctx.father_pop[pop]]
        z, grng = R.general_draw_2normal8(grng)
        taunew = reflect(tauold + finetunes_taus[pop] * z,
                         taub0, taub1).astype(dt)

        props = []
        lnacc = (jnp.log(taunew / tauold) * (ctx.tau_alpha[pop] - 1.0)
                 - (taunew - tauold) * ctx.tau_beta[pop])
        dsum = jnp.zeros((), dt)
        ntj0 = jnp.zeros((), dt)
        ntj1 = jnp.zeros((), dt)
        conflict = jnp.asarray(False)
        params_p = params
        lnf0 = lnf1 = None
        for k in range(K):
            (gen_p, params_p, cond_p, lnld_p, lnp_p, n0, n1, cf,
             lnf0, lnf1) = _rubber_band_proposal(
                gens[k], params, seqs[k], ctx, pop, True,
                taub0, taub1, tauold, taunew, lnlds[k], lnps[k], tables[k])
            props.append((gen_p, cond_p, lnld_p, lnp_p))
            dsum = dsum + jnp.sum(lnld_p - lnlds[k]) \
                + jnp.sum(lnp_p - lnps[k])
            ntj0 = ntj0 + n0
            ntj1 = ntj1 + n1
            conflict = conflict | cf
        dsum = maybe_psum(dsum, loci_axis)
        ntj0 = maybe_psum(ntj0, loci_axis)
        ntj1 = maybe_psum(ntj1, loci_axis)
        conflict = maybe_pmax(jnp.asarray(conflict, jnp.int32),
                              loci_axis) > 0
        lnacc = lnacc + dsum + ntj0 * lnf0 + ntj1 * lnf1
        accept, grng = scalar_mh_accept(grng, lnacc, conflict)
        sel = lambda n, o: jnp.where(accept, n, o)  # noqa: E731
        params = jax.tree_util.tree_map(sel, params_p, params)
        for k in range(K):
            gen_p, cond_p, lnld_p, lnp_p = props[k]
            gens[k] = jax.tree_util.tree_map(sel, gen_p, gens[k])
            conds[k] = sel(cond_p, conds[k])
            lnlds[k] = sel(lnld_p, lnlds[k])
            lnps[k] = sel(lnp_p, lnps[k])
        accepted = accepted.at[pop].add(accept.astype(jnp.int32))
        conflicts = conflicts + conflict.astype(jnp.int32)
    return (tuple(gens), params, grng, tuple(lnlds), tuple(lnps),
            tuple(conds), accepted, conflicts)


def _mixing_bucketed(gens, params, seqs, grng, ctx, finetune, lnlds, lnps,
                     conds, stats_list, num_cur_pops, loci_axis=None):
    """Joint-accept mixing over buckets (reference src/GPhoCS.c:4688)."""
    from gphocs_tpu.ops.likelihood_cache import full_rebuild_and_lnld

    K = len(gens)
    dt = lnlds[0].dtype
    z, grng = R.general_draw_2normal8(grng)
    lnc = (finetune * z).astype(dt)
    c = jnp.exp(lnc)
    ncoal_tot = maybe_psum(
        sum(jnp.sum(s.num_coals) for s in stats_list).astype(dt), loci_axis)
    nmig_tot = maybe_psum(
        sum(jnp.sum(s.num_migs) for s in stats_list).astype(dt), loci_axis)
    num_events = ncoal_tot + nmig_tot
    P = ctx.num_pops
    B = ctx.num_bands

    lnacc = lnc * (2.0 * P - num_cur_pops - B + num_events)
    th_old = params.theta
    th_new = th_old * c
    lnacc = lnacc + jnp.sum(lnc * (ctx.theta_alpha - 1.0)
                            - (th_new - th_old) * ctx.theta_beta)
    anc = jnp.arange(P) >= num_cur_pops
    tau_new = params.tau * c
    lnacc = lnacc + jnp.sum(jnp.where(
        anc, lnc * (ctx.tau_alpha - 1.0)
        - (tau_new - params.tau) * ctx.tau_beta, 0.0))
    if B > 0:
        m_new = params.mig_rate / c
        lnacc = lnacc + jnp.sum(-lnc * (ctx.mig_alpha - 1.0)
                                - (m_new - params.mig_rate) * ctx.mig_beta)
    else:
        m_new = params.mig_rate
    lnacc = lnacc - lnc * num_events
    sa_new = jnp.where(params.sample_age > 0.0, params.sample_age * c,
                       params.sample_age)
    params_prop = params._replace(theta=th_new, tau=tau_new,
                                  sample_age=sa_new, mig_rate=m_new)
    props = []
    ddata = jnp.zeros((), dt)
    for k in range(K):
        gen_prop = gens[k]._replace(age=gens[k].age * c,
                                    mig_age=gens[k].mig_age * c)
        cond_p, lnld_p = full_rebuild_and_lnld(gen_prop, seqs[k],
                                               make_tables(gens[k]))
        ddata = ddata + jnp.sum(lnld_p - lnlds[k])
        props.append((gen_prop, cond_p, lnld_p))
    lnacc = lnacc + maybe_psum(ddata, loci_axis)
    accept, grng = scalar_mh_accept(grng, lnacc)

    sel = lambda n, o: jnp.where(accept, n, o)  # noqa: E731
    params = jax.tree_util.tree_map(sel, params_prop, params)
    gens, lnlds, lnps, conds = list(gens), list(lnlds), list(lnps), list(conds)
    for k in range(K):
        gen_prop, cond_p, lnld_p = props[k]
        gens[k] = jax.tree_util.tree_map(sel, gen_prop, gens[k])
        conds[k] = sel(cond_p, conds[k])
        lnlds[k] = sel(lnld_p, lnlds[k])
        per_locus = (jnp.sum(stats_list[k].num_coals, axis=1)
                     + (jnp.sum(stats_list[k].num_migs, axis=1)
                        if B > 0 else 0)).astype(dt)
        lnps[k] = jnp.where(accept, lnps[k] - lnc * per_locus, lnps[k])
    return (tuple(gens), params, grng, tuple(lnlds), tuple(lnps),
            tuple(conds), accept.astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("genetree_samples", "do_migrate", "do_mixing",
                     "num_pops", "num_cur_pops", "sample_age_mask",
                     "var_rates", "var_alpha", "use_fused",
                     "fused_interpret", "loci_axis"))
def mcmc_iteration_buckets(gens: Tuple, params: Params, seqs: Tuple,
                           lrngs: Tuple, grng, lnlds: Tuple, lnps: Tuple,
                           conds: Tuple, ft: Finetunes, *, ctx: Context,
                           genetree_samples: int, do_migrate: bool,
                           do_mixing: bool, num_pops: int,
                           num_cur_pops: int, sample_age_mask: tuple,
                           var_rates: bool = False, var_alpha: float = 1.0,
                           use_fused=False, fused_interpret: bool = False,
                           loci_axis=None):
    """Bucketed twin of step.mcmc_iteration (fast-RNG mode, no admixture).

    use_fused: bool, or a per-bucket tuple of bools — buckets whose
    pattern count fits the VMEM tile budget run the fused Pallas sweeps
    while oversized buckets fall back to the XLA path (the per-bucket
    gate computed in Sampler.__init__)."""
    K = len(gens)
    fused_k = (use_fused if isinstance(use_fused, tuple)
               else (use_fused,) * K)
    gens, lrngs = list(gens), list(lrngs)
    lnlds, lnps, conds = list(lnlds), list(lnps), list(conds)
    acc_ct = jnp.zeros((), jnp.int32)
    acc_mt = jnp.zeros((), jnp.int32)
    acc_spr = jnp.zeros((), jnp.int32)
    acc_lr = jnp.zeros((), jnp.int32)
    dvar = jnp.zeros((), lnlds[0].dtype)

    for _ in range(genetree_samples):
        for k in range(K):
            if fused_k[k]:
                gens[k], lrngs[k], lnlds[k], lnps[k], conds[k], a = \
                    node_age_sweep_pallas(gens[k], params, seqs[k],
                                          lrngs[k], ctx, ft.coal_time,
                                          lnlds[k], lnps[k], conds[k],
                                          interpret=fused_interpret)
            else:
                gens[k], lrngs[k], lnlds[k], lnps[k], conds[k], a = \
                    update_internal_node_ages(gens[k], params, seqs[k],
                                              lrngs[k], ctx, ft.coal_time,
                                              lnlds[k], lnps[k], conds[k])
            acc_ct = acc_ct + a
            if ctx.num_bands > 0:
                gens[k], lrngs[k], lnps[k], a = update_mig_ages(
                    gens[k], params, lrngs[k], ctx, ft.mig_time, lnps[k])
                acc_mt = acc_mt + a
            if fused_k[k]:
                gens[k], lrngs[k], lnlds[k], conds[k], a = spr_sweep_pallas(
                    gens[k], params, seqs[k], lrngs[k], ctx, lnlds[k],
                    conds[k], interpret=fused_interpret,
                    loci_axis=loci_axis)
            else:
                gens[k], lrngs[k], lnlds[k], conds[k], a = update_spr(
                    gens[k], params, seqs[k], lrngs[k], ctx, lnlds[k],
                    conds[k])
            acc_spr = acc_spr + a
            lnps[k] = gen_log_prior(gens[k], params, ctx)
            if var_rates:
                gens[k], lrngs[k], lnlds[k], conds[k], a, dv = \
                    update_locus_rates_paired(gens[k], seqs[k], lrngs[k],
                                              ft.locus_rate, lnlds[k],
                                              var_alpha, conds[k],
                                              loci_axis=loci_axis)
                acc_lr = acc_lr + a
                dvar = dvar + dv

    stats_list = [full_stats(g, params, ctx) for g in gens]
    stats_cat = _cat_stats(stats_list)
    sizes = [g.num_loci for g in gens]
    lnp_cat = jnp.concatenate(lnps, axis=0)
    params, grng, lnp_cat, acc_th = update_thetas(
        gens[0], params, grng, ctx, ft.theta, lnp_cat, stats_cat,
        loci_axis=loci_axis)
    if do_migrate and ctx.num_bands > 0:
        params, grng, lnp_cat, acc_mr = update_mig_rates(
            gens[0], params, grng, ctx, ft.mig_rate, lnp_cat, stats_cat,
            loci_axis=loci_axis)
    else:
        acc_mr = jnp.zeros((), jnp.int32)
    lnps = list(_split(lnp_cat, sizes))

    (gens, params, grng, lnlds, lnps, conds, acc_taus, conflicts) = \
        _taus_bucketed(gens, params, seqs, grng, ctx, ft.taus, lnlds,
                       lnps, conds, num_pops, num_cur_pops,
                       loci_axis=loci_axis)
    if any(sample_age_mask):
        (gens, params, grng, lnlds, lnps, conds, acc_sa, conf_sa) = \
            _sample_ages_bucketed(gens, params, seqs, grng, ctx, ft.taus,
                                  lnlds, lnps, conds, num_cur_pops,
                                  list(sample_age_mask),
                                  loci_axis=loci_axis)
        acc_taus = acc_taus + acc_sa
        conflicts = conflicts + conf_sa

    if do_mixing:
        stats2 = [full_stats(g, params, ctx) for g in gens]
        (gens, params, grng, lnlds, lnps, conds, acc_mix) = \
            _mixing_bucketed(gens, params, seqs, grng, ctx, ft.mixing,
                             lnlds, lnps, conds, stats2, num_cur_pops,
                             loci_axis=loci_axis)
    else:
        acc_mix = jnp.zeros((), jnp.int32)

    nmig_total = sum(jnp.sum((g.mig_branch >= 0).astype(jnp.int32))
                     for g in gens)
    out = StepStats(
        acc_coal_time=maybe_psum(acc_ct, loci_axis),
        acc_mig_time=maybe_psum(acc_mt, loci_axis),
        acc_spr=maybe_psum(acc_spr, loci_axis),
        acc_theta=acc_th, acc_mig_rate=acc_mr, acc_taus=acc_taus,
        acc_mixing=acc_mix, acc_admix=jnp.zeros((), jnp.int32),
        acc_locus_rate=acc_lr, rate_var_delta=dvar,
        tau_conflicts=conflicts,
        num_migs_total=maybe_psum(nmig_total, loci_axis),
        lnld_sum=maybe_psum(sum(jnp.sum(x) for x in lnlds), loci_axis),
        lnp_sum=maybe_psum(sum(jnp.sum(x) for x in lnps), loci_axis))
    return (tuple(gens), params, tuple(lrngs), grng, tuple(lnlds),
            tuple(lnps), tuple(conds), out)


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "genetree_samples", "do_migrate",
                     "do_mixing", "num_pops", "num_cur_pops",
                     "sample_age_mask", "var_rates", "var_alpha",
                     "use_fused", "fused_interpret", "loci_axis"))
def mcmc_chunk_buckets(gens, params, seqs, lrngs, grng, lnlds, lnps, conds,
                       ft, *, ctx, n_iters, genetree_samples, do_migrate,
                       do_mixing, num_pops, num_cur_pops, sample_age_mask,
                       var_rates=False, var_alpha=1.0, use_fused=False,
                       fused_interpret=False, loci_axis=None):
    def body(carry, _):
        gens, params, lrngs, grng, lnlds, lnps, conds = carry
        gens, params, lrngs, grng, lnlds, lnps, conds, st = \
            mcmc_iteration_buckets(
                gens, params, seqs, lrngs, grng, lnlds, lnps, conds, ft,
                ctx=ctx, genetree_samples=genetree_samples,
                do_migrate=do_migrate, do_mixing=do_mixing,
                num_pops=num_pops, num_cur_pops=num_cur_pops,
                sample_age_mask=sample_age_mask, var_rates=var_rates,
                var_alpha=var_alpha, use_fused=use_fused,
                fused_interpret=fused_interpret, loci_axis=loci_axis)
        out = (st, ChunkTrace(theta=params.theta, tau=params.tau,
                              sample_age=params.sample_age,
                              mig_rate=params.mig_rate,
                              admix_coeff=params.admix_coeff,
                              lnld_sum=st.lnld_sum, lnp_sum=st.lnp_sum,
                              admix_in2=jnp.zeros((0, 0), jnp.int8)))
        return (gens, params, lrngs, grng, lnlds, lnps, conds), out

    (gens, params, lrngs, grng, lnlds, lnps, conds), (stats_seq, trace) = \
        jax.lax.scan(body, (gens, params, lrngs, grng, lnlds, lnps, conds),
                     None, length=n_iters)
    totals = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), stats_seq)
    return gens, params, lrngs, grng, lnlds, lnps, conds, totals, trace
