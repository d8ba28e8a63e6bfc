"""UpdateTheta and UpdateMigRates: closed-form stats-only parameter updates.

Mirrors reference src/GPhoCS.c:3037-3212.  Both use multiplicative
proposals x' = x * exp(finetune * rnd2normal8) from the general RNG stream,
with Gamma priors, and evaluate the genealogy-likelihood delta in closed
form from the (total) sufficient statistics — no per-locus recomputation:

  theta:   delta = -(lnc * ncoals_tot + (1/x' - 1/x) * coalstats_tot)
  migrate: delta = +(lnc * nmigs_tot  - (x' - x)   * migstats_tot)
           proposals below 1e-5 are skipped outright (:3159)

The per-locus genealogy log-prior `lnp` is updated with the same closed
form per locus.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.constants import MIN_MIG_RATE
from gphocs_tpu.kernels.common import (Context, full_stats, maybe_psum,
                                       scalar_mh_accept)
from gphocs_tpu.ops.coalstats import CoalStats
from gphocs_tpu.state import GenState, Params


def update_thetas(gen: GenState, params: Params, rng_state, ctx: Context,
                  finetune, lnp: jnp.ndarray, stats: CoalStats,
                  loci_axis=None):
    """Sweep over all populations (sequential, general stream).

    stats: current sufficient statistics (unchanged by this update).
    Returns (params, rng_state, lnp, accepted_count).

    The per-pop acceptance ratio depends only on that pop's own statistics
    and theta, and the statistics are unchanged by theta moves — so the
    sweep is exactly parallelizable across pops.  In fast-RNG mode all P
    proposals evaluate in one vector step (identical math, different draw
    order); the legacy path keeps the reference's sequential scan for
    stream conformance (src/GPhoCS.c:3037-3106)."""
    from gphocs_tpu.rng_fast import FastRngState

    P = ctx.num_pops
    ncoal_tot = maybe_psum(
        jnp.sum(stats.num_coals, axis=0).astype(lnp.dtype), loci_axis)  # [P]
    coal_tot = maybe_psum(jnp.sum(stats.coal_stats, axis=0), loci_axis)

    if isinstance(rng_state, FastRngState):
        from gphocs_tpu import rng_fast as RF

        z, rng_state = RF.batch_2normal8(rng_state, P)
        lnc = (finetune * z).astype(lnp.dtype)                       # [P]
        theta_old = params.theta
        theta_new = theta_old * jnp.exp(lnc)
        dinv = 1.0 / theta_new - 1.0 / theta_old
        lnacc = (lnc + lnc * (ctx.theta_alpha - 1.0)
                 - (theta_new - theta_old) * ctx.theta_beta
                 - (lnc * ncoal_tot + dinv * coal_tot))
        u, rng_state = RF.batch_u(rng_state, P)
        accept = (lnacc >= 0.0) | (u < jnp.exp(jnp.minimum(lnacc, 0.0)))
        params = params._replace(
            theta=jnp.where(accept, theta_new, theta_old))
        dlnp = -(lnc[None, :] * stats.num_coals.astype(lnp.dtype)
                 + dinv[None, :] * stats.coal_stats)
        lnp = lnp + jnp.sum(jnp.where(accept[None, :], dlnp, 0.0), axis=1)
        return params, rng_state, lnp, jnp.sum(accept.astype(jnp.int32))

    def body(carry, pop):
        params, rng_state, lnp, acc = carry
        theta_old = params.theta[pop]
        z, rng_state = R.general_draw_2normal8(rng_state)
        lnc = (finetune * z).astype(lnp.dtype)
        theta_new = theta_old * jnp.exp(lnc)
        lnacc = (lnc + lnc * (ctx.theta_alpha[pop] - 1.0)
                 - (theta_new - theta_old) * ctx.theta_beta[pop])
        dinv = 1.0 / theta_new - 1.0 / theta_old
        delta = -(lnc * ncoal_tot[pop] + dinv * coal_tot[pop])
        lnacc = lnacc + delta
        accept, rng_state = scalar_mh_accept(rng_state, lnacc)
        params = params._replace(
            theta=params.theta.at[pop].set(
                jnp.where(accept, theta_new, theta_old)))
        dlnp = -(lnc * stats.num_coals[:, pop].astype(lnp.dtype)
                 + dinv * stats.coal_stats[:, pop])
        lnp = jnp.where(accept, lnp + dlnp, lnp)
        acc = acc + accept.astype(jnp.int32)
        return (params, rng_state, lnp, acc), None

    init = (params, rng_state, lnp, jnp.zeros((), jnp.int32))
    (params, rng_state, lnp, acc), _ = lax.scan(
        body, init, jnp.arange(P, dtype=jnp.int32))
    return params, rng_state, lnp, acc


def update_mig_rates(gen: GenState, params: Params, rng_state, ctx: Context,
                     finetune, lnp: jnp.ndarray, stats: CoalStats,
                     loci_axis=None):
    """Sweep over all migration bands (reference :3115-3212)."""
    from gphocs_tpu.rng_fast import FastRngState

    B = ctx.num_bands
    if B == 0:
        return params, rng_state, lnp, jnp.zeros((), jnp.int32)
    nmig_tot = maybe_psum(
        jnp.sum(stats.num_migs, axis=0).astype(lnp.dtype), loci_axis)  # [B]
    mig_tot = maybe_psum(jnp.sum(stats.mig_stats, axis=0), loci_axis)

    if isinstance(rng_state, FastRngState):
        # exactly parallelizable across bands (per-band stats only; see
        # update_thetas) — one vector step in fast-RNG mode
        from gphocs_tpu import rng_fast as RF

        z, rng_state = RF.batch_2normal8(rng_state, B)
        lnc = (finetune * z).astype(lnp.dtype)                    # [B]
        old = params.mig_rate
        new = old * jnp.exp(lnc)
        skip = new < MIN_MIG_RATE
        lnacc = (lnc + lnc * (ctx.mig_alpha - 1.0)
                 - (new - old) * ctx.mig_beta
                 + lnc * nmig_tot - (new - old) * mig_tot)
        u, rng_state = RF.batch_u(rng_state, B)
        accept = ~skip & ((lnacc >= 0.0)
                          | (u < jnp.exp(jnp.minimum(lnacc, 0.0))))
        params = params._replace(mig_rate=jnp.where(accept, new, old))
        dlnp = (lnc[None, :] * stats.num_migs.astype(lnp.dtype)
                - (new - old)[None, :] * stats.mig_stats)
        lnp = lnp + jnp.sum(jnp.where(accept[None, :], dlnp, 0.0), axis=1)
        return params, rng_state, lnp, jnp.sum(accept.astype(jnp.int32))

    def body(carry, band):
        params, rng_state, lnp, acc = carry
        old = params.mig_rate[band]
        z, rng_state = R.general_draw_2normal8(rng_state)
        lnc = (finetune * z).astype(lnp.dtype)
        new = old * jnp.exp(lnc)
        skip = new < MIN_MIG_RATE  # skipped before prior evaluation (:3159)
        lnacc = (lnc + lnc * (ctx.mig_alpha[band] - 1.0)
                 - (new - old) * ctx.mig_beta[band])
        delta = lnc * nmig_tot[band] - (new - old) * mig_tot[band]
        lnacc = lnacc + delta
        accept, rng_state = scalar_mh_accept(rng_state, lnacc, conflict=skip)
        params = params._replace(
            mig_rate=params.mig_rate.at[band].set(
                jnp.where(accept, new, old)))
        dlnp = (lnc * stats.num_migs[:, band].astype(lnp.dtype)
                - (new - old) * stats.mig_stats[:, band])
        lnp = jnp.where(accept, lnp + dlnp, lnp)
        acc = acc + accept.astype(jnp.int32)
        return (params, rng_state, lnp, acc), None

    init = (params, rng_state, lnp, jnp.zeros((), jnp.int32))
    (params, rng_state, lnp, acc), _ = lax.scan(
        body, init, jnp.arange(B, dtype=jnp.int32))
    return params, rng_state, lnp, acc
