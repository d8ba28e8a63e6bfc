"""UpdateGB_MigrationNode: random-walk updates of migration-event ages.

Mirrors reference src/GPhoCS.c:2439-2590.  Sequential sweep over migration
slots (the reference sweeps its living_mignodes list), loci in parallel.
Data likelihood is unchanged by this move; the acceptance ratio is the
genealogy-prior delta only, computed in closed form per slot
(mig_age_move_delta — the tensor twin of the reference's paired
considerEventMove walks, src/patch.c:1434-1530) instead of a full
sufficient-statistics recomputation per slot.

Bounds: the band's time window intersected with the neighbouring events on
the same branch (previous/next migration event, child node age below,
father node age above — OLDAGE when the edge is above the locus root).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import Context, band_windows, mh_accept
from gphocs_tpu.ops.coalstats import mig_age_move_delta
from gphocs_tpu.state import GenState, Params, SeqData
from gphocs_tpu.utils import reflect


def update_mig_ages(gen: GenState, params: Params, rng_state, ctx: Context,
                    finetune, lnp: jnp.ndarray):
    """Returns (gen, rng_state, lnp, accepted_count)."""
    L = gen.num_loci
    M = gen.max_migs
    if ctx.num_bands == 0:
        return gen, rng_state, lnp, jnp.zeros((), jnp.int32)
    ar = jnp.arange(L)
    bs, be = band_windows(ctx, params.tau)

    def body(carry, m):
        gen, rng_state, lnp, acc = carry
        active = (gen.mig_branch[:, m] >= 0) & gen.valid
        band = jnp.where(active, gen.mig_band[:, m], 0)
        t = gen.mig_age[:, m]
        branch = jnp.where(active, gen.mig_branch[:, m], 0)

        tb0 = bs[band]
        tb1 = be[band]
        # neighbouring migration events on the same branch
        others = (gen.mig_branch >= 0) & (gen.mig_branch == branch[:, None])
        others = others & (jnp.arange(M)[None, :] != m)
        below = others & (gen.mig_age < t[:, None])
        above = others & (gen.mig_age > t[:, None])
        lm = jnp.max(jnp.where(below, gen.mig_age, -jnp.inf), axis=1)
        fm = jnp.min(jnp.where(above, gen.mig_age, jnp.inf), axis=1)
        child_age = gen.age[ar, branch]
        fa = gen.father[ar, branch]
        fa_age = jnp.where(fa < 0, jnp.asarray(ctx.oldage, t.dtype),
                           gen.age[ar, jnp.where(fa < 0, 0, fa)])
        tb0 = jnp.maximum(tb0, jnp.where(jnp.isfinite(lm), lm, child_age))
        tb1 = jnp.minimum(tb1, jnp.where(jnp.isfinite(fm), fm, fa_age))

        z, rng_state = R.rnd2normal8(rng_state, active)
        tnew = reflect(t + finetune * z, tb0, tb1).astype(t.dtype)
        tiny = jnp.abs(tnew - t) < 1e-15

        dlnp = mig_age_move_delta(gen, params, ctx, m, tnew, bs, be)
        lnacc = dlnp

        accept, rng_state = mh_accept(rng_state, lnacc, active & ~tiny)
        gen = gen._replace(mig_age=gen.mig_age.at[:, m].set(
            jnp.where(accept, tnew, t)))
        lnp = jnp.where(accept, lnp + dlnp, lnp)
        acc = acc + jnp.sum(((accept | (active & tiny))).astype(jnp.int32), dtype=jnp.int32)
        return (gen, rng_state, lnp, acc), None

    init = (gen, rng_state, lnp, jnp.zeros((), jnp.int32))
    (gen, rng_state, lnp, acc), _ = lax.scan(
        body, init, jnp.arange(M, dtype=jnp.int32))
    return gen, rng_state, lnp, acc
