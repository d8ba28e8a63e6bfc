"""mixing: global multiplicative rescale of all time-scaled parameters.

Mirrors reference src/GPhoCS.c:4688-4915.  One factor c = exp(finetune * z)
from the general stream scales thetas, taus, sample ages, band windows,
all node ages, and all migration-event ages; migration *rates* scale by
1/c.  The genealogy-prior delta reduces analytically to
-lnc * (total coals + total migs) because the statistics and rates scale
inversely; the proposal Jacobian is

    lnc * (2 numPops - numCurPops - numMigBands + num_events)

(reference :4722-4724; note the reference does not count estimated sample
ages in the Jacobian — replicated as-is for conformance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import Context, maybe_psum, scalar_mh_accept
from gphocs_tpu.ops.coalstats import CoalStats
from gphocs_tpu.ops.likelihood_cache import (
    full_rebuild_and_lnld,
    make_tables,
)
from gphocs_tpu.state import GenState, Params, SeqData


def update_mixing(gen: GenState, params: Params, seq: SeqData, rng_state,
                  ctx: Context, finetune, lnld, lnp, cond, stats: CoalStats,
                  num_cur_pops: int, loci_axis=None):
    """Returns (gen, params, rng_state, lnld, lnp, cond, accepted)."""
    z, rng_state = R.general_draw_2normal8(rng_state)
    lnc = (finetune * z).astype(lnld.dtype)
    c = jnp.exp(lnc)

    ncoal_tot = maybe_psum(jnp.sum(stats.num_coals).astype(lnld.dtype),
                           loci_axis)
    nmig_tot = maybe_psum(jnp.sum(stats.num_migs).astype(lnld.dtype),
                          loci_axis)
    num_events = ncoal_tot + nmig_tot
    P = ctx.num_pops
    B = ctx.num_bands

    lnacc = lnc * (2.0 * P - num_cur_pops - B + num_events)
    # theta priors (all pops)
    th_old = params.theta
    th_new = th_old * c
    lnacc = lnacc + jnp.sum(lnc * (ctx.theta_alpha - 1.0)
                            - (th_new - th_old) * ctx.theta_beta)
    # tau priors (ancestral pops only)
    anc = jnp.arange(P) >= num_cur_pops
    tau_old = params.tau
    tau_new = tau_old * c
    lnacc = lnacc + jnp.sum(jnp.where(
        anc, lnc * (ctx.tau_alpha - 1.0) - (tau_new - tau_old) * ctx.tau_beta,
        0.0))
    # migration-rate priors (inverse scaling; reference :4758-4778)
    if B > 0:
        m_old = params.mig_rate
        m_new = m_old / c
        lnacc = lnacc + jnp.sum(-lnc * (ctx.mig_alpha - 1.0)
                                - (m_new - m_old) * ctx.mig_beta)
    else:
        m_new = params.mig_rate
    # analytic genealogy delta
    gen_delta = -lnc * num_events
    # data delta: recompute with all ages scaled
    sa_new = jnp.where(params.sample_age > 0.0, params.sample_age * c,
                       params.sample_age)
    gen_prop = gen._replace(age=gen.age * c, mig_age=gen.mig_age * c)
    params_prop = params._replace(theta=th_new, tau=tau_new,
                                  sample_age=sa_new, mig_rate=m_new)
    cond_prop, lnld_prop = full_rebuild_and_lnld(
        gen_prop, seq, make_tables(gen))
    data_delta = maybe_psum(jnp.sum(lnld_prop - lnld), loci_axis)
    lnacc = lnacc + gen_delta + data_delta

    accept, rng_state = scalar_mh_accept(rng_state, lnacc)

    sel = lambda n, o: jnp.where(accept, n, o)  # noqa: E731
    gen = jax.tree_util.tree_map(sel, gen_prop, gen)
    params = jax.tree_util.tree_map(sel, params_prop, params)
    cond = jnp.where(accept, cond_prop, cond)
    lnld = jnp.where(accept, lnld_prop, lnld)
    # per-locus prior adjusts by -lnc * (coals + migs) of that locus
    per_locus = (jnp.sum(stats.num_coals, axis=1)
                 + (jnp.sum(stats.num_migs, axis=1) if B > 0 else 0)
                 ).astype(lnld.dtype)
    lnp = jnp.where(accept, lnp - lnc * per_locus, lnp)
    return gen, params, rng_state, lnld, lnp, cond, accept.astype(jnp.int32)
