"""UpdateAdmixCoeffs: admixture-coefficient updates.

Mirrors reference src/GPhoCS.c:2958-3028.  For each admixed sample:
reflect-proposal on (0, 1) from the general stream; the likelihood is
binomial in the per-locus population assignments:

    lnacc = n_second * log(c'/c) + (L_valid - n_second) * log((1-c')/(1-c))
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import Context, maybe_psum, scalar_mh_accept
from gphocs_tpu.state import GenState, Params
from gphocs_tpu.utils import reflect


def update_admix_coeffs(gen: GenState, params: Params, rng_state,
                        ctx: Context, finetune, lnp: jnp.ndarray,
                        loci_axis=None):
    """Returns (params, rng_state, lnp, accepted)."""
    A = ctx.num_admixed
    # assignment counts are global quantities: reduce over the loci mesh
    # axis so every shard makes the same accept decision
    nloci = maybe_psum(jnp.sum(gen.valid.astype(lnp.dtype)), loci_axis)

    def body(carry, a):
        params, rng_state, lnp, acc = carry
        c_old = params.admix_coeff[a]
        z, rng_state = R.general_draw_2normal8(rng_state)
        c_new = reflect(c_old + finetune * z, jnp.zeros((), lnp.dtype),
                        jnp.ones((), lnp.dtype)).astype(lnp.dtype)
        slot = ctx.admix_slot[a]
        in_second = ((gen.node_pop[:, slot] == ctx.admix_pops[a, 1])
                     & gen.valid)
        n2 = maybe_psum(jnp.sum(in_second.astype(lnp.dtype)), loci_axis)
        log_r = jnp.log(c_new / c_old)
        log_cr = jnp.log((1.0 - c_new) / (1.0 - c_old))
        lnacc = n2 * log_r + (nloci - n2) * log_cr
        accept, rng_state = scalar_mh_accept(rng_state, lnacc)
        params = params._replace(admix_coeff=params.admix_coeff.at[a].set(
            jnp.where(accept, c_new, c_old)))
        dlnp = jnp.where(in_second, log_r, log_cr)
        lnp = jnp.where(accept, lnp + dlnp, lnp)
        acc = acc + accept.astype(jnp.int32)
        return (params, rng_state, lnp, acc), None

    init = (params, rng_state, lnp, jnp.zeros((), jnp.int32))
    (params, rng_state, lnp, acc), _ = lax.scan(
        body, init, jnp.arange(A, dtype=jnp.int32))
    return params, rng_state, lnp, acc
