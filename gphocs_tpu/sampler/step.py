"""One MCMC iteration (and chunked multi-iteration scan), jit-compiled.

Update schedule mirrors performMCMC (reference src/GPhoCS.c:1476-1705):

    repeat genetreeSamples times:
        UpdateGB_InternalNode; UpdateGB_MigrationNode; UpdateGB_MigSPR;
        [UpdateLocusRate if VAR rates]
    UpdateTheta; [UpdateMigRates if iteration > start-mig];
    UpdateTau; UpdateSampleAge; [UpdateAdmixCoeffs]; [mixing]

(The reference's synchronizeEvents float-drift repair pass is unnecessary
here: node ages are the single source of truth.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gphocs_tpu.kernels.common import (Context, full_stats, gen_log_prior,
                                       gen_log_prior_from_stats)
from gphocs_tpu.kernels.mig_age import update_mig_ages
from gphocs_tpu.kernels.mixing import update_mixing
from gphocs_tpu.kernels.admix import update_admix_coeffs
from gphocs_tpu.kernels.locus_rate import update_locus_rates
from gphocs_tpu.kernels.node_age import update_internal_node_ages
from gphocs_tpu.kernels.scalar_params import update_mig_rates, update_thetas
from gphocs_tpu.kernels.spr import update_spr
from gphocs_tpu.kernels.tau import update_sample_ages, update_taus
from gphocs_tpu.ops.coalstats import genealogy_log_prior
from gphocs_tpu.ops.likelihood_cache import full_build
from gphocs_tpu.ops.sweeps_pallas import (mig_age_sweep_pallas,
                                          node_age_sweep_pallas,
                                          spr_sweep_pallas)
from gphocs_tpu.state import GenState, Params, SeqData


class Finetunes(NamedTuple):
    """Device-side finetune values (dynamic: the auto-search mutates them)."""

    coal_time: jnp.ndarray
    mig_time: jnp.ndarray
    theta: jnp.ndarray
    mig_rate: jnp.ndarray
    mixing: jnp.ndarray
    locus_rate: jnp.ndarray
    admix: jnp.ndarray
    taus: jnp.ndarray  # [P]


class StepStats(NamedTuple):
    acc_coal_time: jnp.ndarray
    acc_mig_time: jnp.ndarray
    acc_spr: jnp.ndarray
    acc_theta: jnp.ndarray
    acc_mig_rate: jnp.ndarray
    acc_taus: jnp.ndarray       # [P]
    acc_mixing: jnp.ndarray
    acc_admix: jnp.ndarray
    acc_locus_rate: jnp.ndarray
    rate_var_delta: jnp.ndarray
    tau_conflicts: jnp.ndarray
    num_migs_total: jnp.ndarray
    lnld_sum: jnp.ndarray
    lnp_sum: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("genetree_samples", "do_migrate", "do_mixing",
                     "num_pops", "num_cur_pops", "sample_age_mask",
                     "coal_time_on", "mig_time_on", "theta_on",
                     "mig_rate_on", "mixing_on", "var_rates",
                     "locus_rate_on", "var_alpha", "admix_on",
                     "use_fused", "spr_on", "tau_on",
                     "loci_axis", "fused_interpret"))
def mcmc_iteration(gen: GenState, params: Params, seq: SeqData, lrng, grng,
                   lnld, lnp, cond, ft: Finetunes, *, ctx: Context,
                   genetree_samples: int, do_migrate: bool, do_mixing: bool,
                   num_pops: int, num_cur_pops: int,
                   sample_age_mask: tuple,
                   coal_time_on: bool = True, mig_time_on: bool = True,
                   theta_on: bool = True, mig_rate_on: bool = True,
                   mixing_on: bool = True, var_rates: bool = False,
                   locus_rate_on: bool = True, var_alpha: float = 1.0,
                   admix_on: bool = True,
                   use_fused: bool = False, spr_on: bool = True,
                   tau_on: bool = True, loci_axis=None,
                   fused_interpret: bool = False):
    """Returns (gen, params, lrng, grng, lnld, lnp, cond, StepStats).

    loci_axis: mesh axis name when running inside shard_map over loci —
    cross-locus reductions become psums (the reference's `omp atomic`
    twins).  fused_interpret runs the Pallas kernels in interpret mode
    (CPU mesh validation).

    cond: carried pruning conditionals, consistent with (gen, seq) on
    entry and on return (the checkAll-style invariant is that
    lnld == lnld_from_cond(cond) at every step boundary)."""
    acc_ct = jnp.zeros((), jnp.int32)
    acc_mt = jnp.zeros((), jnp.int32)
    acc_spr = jnp.zeros((), jnp.int32)
    acc_lr = jnp.zeros((), jnp.int32)
    dvar = jnp.zeros((), lnld.dtype)

    for gs in range(genetree_samples):
        if coal_time_on:
            if use_fused:
                # whole-sweep VMEM-resident kernel (fast-RNG mode only;
                # draw-for-draw identical to the XLA sweep)
                gen, lrng, lnld, lnp, cond, a = node_age_sweep_pallas(
                    gen, params, seq, lrng, ctx, ft.coal_time, lnld, lnp,
                    cond, interpret=fused_interpret)
            else:
                gen, lrng, lnld, lnp, cond, a = update_internal_node_ages(
                    gen, params, seq, lrng, ctx, ft.coal_time, lnld, lnp,
                    cond)
            acc_ct = acc_ct + a
        if mig_time_on and ctx.num_bands > 0:
            if use_fused:
                gen, lrng, lnp, a = mig_age_sweep_pallas(
                    gen, params, lrng, ctx, ft.mig_time, lnp,
                    interpret=fused_interpret)
            else:
                gen, lrng, lnp, a = update_mig_ages(
                    gen, params, lrng, ctx, ft.mig_time, lnp)
            acc_mt = acc_mt + a
        if spr_on:
            if use_fused and ctx.num_admixed == 0:
                gen, lrng, lnld, cond, a = spr_sweep_pallas(
                    gen, params, seq, lrng, ctx, lnld, cond,
                    interpret=fused_interpret, loci_axis=loci_axis)
            else:
                gen, lrng, lnld, cond, a = update_spr(
                    gen, params, seq, lrng, ctx, lnld, cond)
            acc_spr = acc_spr + a
            # SPR tracks only the data likelihood; the prior refresh for
            # the final genetree sample is merged into the full_stats
            # pass below (one sufficient-stats recomputation, not two)
            if gs < genetree_samples - 1:
                lnp = gen_log_prior(gen, params, ctx)
        if var_rates and locus_rate_on:
            from gphocs_tpu.rng_fast import FastRngState
            if isinstance(lrng, FastRngState):
                # production kernel: disjoint random pairs, one vector
                # step (per-iteration cost independent of L up to one
                # pruning pass); serial reference-coupled scan kept as
                # the conformance path below
                from gphocs_tpu.kernels.locus_rate import (
                    update_locus_rates_paired)

                gen, lrng, lnld, cond, a, dv = update_locus_rates_paired(
                    gen, seq, lrng, ft.locus_rate, lnld, var_alpha, cond,
                    loci_axis=loci_axis)
            else:
                gen, lrng, lnld, a, dv = update_locus_rates(
                    gen, seq, lrng, ft.locus_rate, lnld, var_alpha)
                # rate moves change edge lengths globally: rebuild
                cond = full_build(gen, seq)
            acc_lr = acc_lr + a
            dvar = dvar + dv

    stats = full_stats(gen, params, ctx)
    if spr_on:
        # deferred post-SPR prior refresh (bitwise-identical to
        # gen_log_prior: same stats function, same admixture terms)
        lnp = gen_log_prior_from_stats(stats, gen, params, ctx)
    if theta_on:
        params, grng, lnp, acc_th = update_thetas(
            gen, params, grng, ctx, ft.theta, lnp, stats,
            loci_axis=loci_axis)
    else:
        acc_th = jnp.zeros((), jnp.int32)
    if do_migrate and mig_rate_on and ctx.num_bands > 0:
        params, grng, lnp, acc_mr = update_mig_rates(
            gen, params, grng, ctx, ft.mig_rate, lnp, stats,
            loci_axis=loci_axis)
    else:
        acc_mr = jnp.zeros((), jnp.int32)

    if tau_on:
        if use_fused:
            from gphocs_tpu.kernels.tau import update_taus_fused

            gen, params, grng, lnld, lnp, cond, acc_taus, conflicts = \
                update_taus_fused(gen, params, seq, grng, ctx, ft.taus,
                                  lnld, lnp, cond, num_pops, num_cur_pops,
                                  interpret=fused_interpret,
                                  loci_axis=loci_axis)
        else:
            gen, params, grng, lnld, lnp, cond, acc_taus, conflicts = \
                update_taus(gen, params, seq, grng, ctx, ft.taus, lnld, lnp,
                            cond, num_pops, num_cur_pops,
                            loci_axis=loci_axis)
    else:
        acc_taus = jnp.zeros((num_pops,), jnp.int32)
        conflicts = jnp.zeros((), jnp.int32)
    if any(sample_age_mask):
        if use_fused:
            from gphocs_tpu.kernels.tau import update_sample_ages_fused

            gen, params, grng, lnld, lnp, cond, acc_sa, conf_sa = \
                update_sample_ages_fused(gen, params, seq, grng, ctx,
                                         ft.taus, lnld, lnp, cond,
                                         num_cur_pops,
                                         list(sample_age_mask),
                                         interpret=fused_interpret,
                                         loci_axis=loci_axis)
        else:
            gen, params, grng, lnld, lnp, cond, acc_sa, conf_sa = \
                update_sample_ages(gen, params, seq, grng, ctx, ft.taus,
                                   lnld, lnp, cond, num_cur_pops,
                                   list(sample_age_mask),
                                   loci_axis=loci_axis)
        acc_taus = acc_taus + acc_sa
        conflicts = conflicts + conf_sa

    if ctx.num_admixed > 0 and admix_on:
        params, grng, lnp, acc_adm = update_admix_coeffs(
            gen, params, grng, ctx, ft.admix, lnp, loci_axis=loci_axis)
    else:
        acc_adm = jnp.zeros((), jnp.int32)

    if do_mixing and mixing_on:
        # update_mixing reads only the event COUNTS (num_coals/num_migs);
        # the theta/mig-rate/tau/sample-age/admix stages between `stats`
        # and here never change counts (no topology or migration-event
        # creation), so the earlier stats pass is reusable as-is
        gen, params, grng, lnld, lnp, cond, acc_mix = update_mixing(
            gen, params, seq, grng, ctx, ft.mixing, lnld, lnp, cond, stats,
            num_cur_pops, loci_axis=loci_axis)
    else:
        acc_mix = jnp.zeros((), jnp.int32)

    nmig_total = jnp.sum((gen.mig_branch >= 0).astype(jnp.int32))

    from gphocs_tpu.kernels.common import maybe_psum

    # per-locus accumulators all-reduce over the loci axis; counters of
    # replicated global decisions (theta/tau/mixing/...) are already
    # identical on every shard
    out = StepStats(
        acc_coal_time=maybe_psum(acc_ct, loci_axis),
        acc_mig_time=maybe_psum(acc_mt, loci_axis),
        acc_spr=maybe_psum(acc_spr, loci_axis),
        acc_theta=acc_th, acc_mig_rate=acc_mr, acc_taus=acc_taus,
        acc_mixing=acc_mix, acc_admix=acc_adm,
        # acc_lr / dvar are already all-reduced by update_locus_rates_paired
        # (with the global-L denominator); psumming again would inflate both
        # by the mesh axis size and skew the finetune adaptation
        acc_locus_rate=acc_lr,
        rate_var_delta=dvar,
        tau_conflicts=conflicts,
        num_migs_total=maybe_psum(nmig_total, loci_axis),
        lnld_sum=maybe_psum(jnp.sum(lnld), loci_axis),
        lnp_sum=maybe_psum(jnp.sum(lnp), loci_axis))
    return gen, params, lrng, grng, lnld, lnp, cond, out


class ChunkTrace(NamedTuple):
    """Per-iteration outputs of a chunk (leading axis = iterations)."""

    theta: jnp.ndarray        # [K, P]
    tau: jnp.ndarray          # [K, P]
    sample_age: jnp.ndarray   # [K, P]
    mig_rate: jnp.ndarray     # [K, B]
    admix_coeff: jnp.ndarray  # [K, A]
    lnld_sum: jnp.ndarray     # [K]
    lnp_sum: jnp.ndarray      # [K]
    # per-locus admixture assignment (admixed leaf in its second pop),
    # [K, L, A] int8 — feeds the admixture-trace.out running averages
    # (reference src/GPhoCS.c:775-790, 1781-1805)
    admix_in2: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "genetree_samples", "do_migrate",
                     "do_mixing", "num_pops", "num_cur_pops",
                     "sample_age_mask", "coal_time_on", "mig_time_on",
                     "theta_on", "mig_rate_on", "mixing_on", "var_rates",
                     "locus_rate_on", "var_alpha", "admix_on",
                     "use_fused", "spr_on", "tau_on",
                     "loci_axis", "fused_interpret"))
def mcmc_chunk(gen: GenState, params: Params, seq: SeqData, lrng, grng,
               lnld, lnp, cond, ft: Finetunes, *, ctx: Context, n_iters: int,
               genetree_samples: int, do_migrate: bool, do_mixing: bool,
               num_pops: int, num_cur_pops: int, sample_age_mask: tuple,
               coal_time_on: bool = True, mig_time_on: bool = True,
               theta_on: bool = True, mig_rate_on: bool = True,
               mixing_on: bool = True, var_rates: bool = False,
               locus_rate_on: bool = True, var_alpha: float = 1.0,
               admix_on: bool = True,
               use_fused: bool = False, spr_on: bool = True,
               tau_on: bool = True, loci_axis=None,
               fused_interpret: bool = False):
    """Run n_iters full iterations in one compiled call (amortizes host
    dispatch; essential on TPU where per-call latency dwarfs compute for
    small models).  Returns accumulated StepStats and a ChunkTrace with
    per-iteration parameter values for trace emission."""

    def body(carry, _):
        gen, params, lrng, grng, lnld, lnp, cond = carry
        gen, params, lrng, grng, lnld, lnp, cond, st = mcmc_iteration(
            gen, params, seq, lrng, grng, lnld, lnp, cond, ft, ctx=ctx,
            genetree_samples=genetree_samples, do_migrate=do_migrate,
            do_mixing=do_mixing, num_pops=num_pops,
            num_cur_pops=num_cur_pops, sample_age_mask=sample_age_mask,
            coal_time_on=coal_time_on, mig_time_on=mig_time_on,
            theta_on=theta_on, mig_rate_on=mig_rate_on,
            mixing_on=mixing_on, var_rates=var_rates,
            locus_rate_on=locus_rate_on, var_alpha=var_alpha,
            admix_on=admix_on,
            use_fused=use_fused, spr_on=spr_on, tau_on=tau_on,
            loci_axis=loci_axis, fused_interpret=fused_interpret)
        in2 = ((gen.node_pop[:, ctx.admix_slot]
                == ctx.admix_pops[None, :, 1])
               & gen.valid[:, None]).astype(jnp.int8)
        out = (st, ChunkTrace(theta=params.theta, tau=params.tau,
                              sample_age=params.sample_age,
                              mig_rate=params.mig_rate,
                              admix_coeff=params.admix_coeff,
                              lnld_sum=st.lnld_sum, lnp_sum=st.lnp_sum,
                              admix_in2=in2))
        return (gen, params, lrng, grng, lnld, lnp, cond), out

    (gen, params, lrng, grng, lnld, lnp, cond), (stats_seq, trace) = \
        jax.lax.scan(body, (gen, params, lrng, grng, lnld, lnp, cond),
                     None, length=n_iters)
    totals = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), stats_seq)
    return gen, params, lrng, grng, lnld, lnp, cond, totals, trace


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "genetree_samples", "do_migrate",
                     "do_mixing", "num_pops", "num_cur_pops",
                     "sample_age_mask", "coal_time_on", "mig_time_on",
                     "theta_on", "mig_rate_on", "mixing_on", "var_rates",
                     "locus_rate_on", "var_alpha", "admix_on",
                     "use_fused", "spr_on", "tau_on",
                     "loci_axis", "fused_interpret"))
def mcmc_chunk_chains(gen, params, seq, lrng, grng, lnld, lnp, cond, ft, *,
                      ctx, n_iters, **static):
    """Multi-chain variant: every dynamic state carries a leading chains
    axis (params/rng included); the sequence data and context are shared.
    Chains are vmapped — on TPU they ride the same batched kernels as
    extra batch, giving R-hat-ready parallel chains nearly for free
    (the 'chains mesh axis' of SURVEY §2's parallelism table)."""

    def one_chain(gen, params, lrng, grng, lnld, lnp, cond):
        return mcmc_chunk.__wrapped__(
            gen, params, seq, lrng, grng, lnld, lnp, cond, ft, ctx=ctx,
            n_iters=n_iters, **static)

    return jax.vmap(one_chain)(gen, params, lrng, grng, lnld, lnp, cond)
