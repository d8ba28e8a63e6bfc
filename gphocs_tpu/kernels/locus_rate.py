"""UpdateLocusRate: per-locus relative mutation-rate updates (VAR mode).

Mirrors reference src/GPhoCS.c:4598-4674.  Each locus `gen` (except the
reference locus, genRateRef=0) is swept sequentially; its rate moves
opposite to the reference locus's rate, preserving the mean:

    rnew    = reflect(rold + finetune * rnd2normal8(gen), 0, rold + rref)
    rrefnew = rref + rold - rnew
    lnacc   = (alpha - 1) * log((rnew * rrefnew) / (rold * rref))
            + dlnld(gen) + dlnld(ref)

Because every step couples to the single reference locus, the sweep is a
`lax.scan` over loci; each step re-prunes only the two affected loci.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.ops.pruning import _pruning_single
from gphocs_tpu.state import GenState, SeqData
from gphocs_tpu.utils import reflect


def _pair_lnld(gen: GenState, seq: SeqData, idx: jnp.ndarray,
               rates: jnp.ndarray):
    """Data log-likelihood of the two loci `idx` with overridden rates."""
    take = lambda a: a[idx]  # noqa: E731
    dtype = gen.age.dtype
    fn = jax.vmap(
        lambda fa, ls, rs, ag, rt, mr, lb, gi, gc, gn, pv: _pruning_single(
            fa, ls, rs, ag, rt, mr, lb, gi, gc, gn, pv, dtype))
    return fn(take(gen.father), take(gen.lson), take(gen.rson),
              take(gen.age), take(gen.root), rates,
              take(seq.leaf_base), take(seq.group_id),
              take(seq.group_count), take(seq.group_nphases),
              take(seq.pattern_valid))


def update_locus_rates(gen: GenState, seq: SeqData, rng_state, finetune,
                       lnld: jnp.ndarray, var_alpha, ref_locus: int = 0):
    """Returns (gen, rng_state, lnld, accepted, rate_var_delta)."""
    L = gen.num_loci

    def body(carry, g):
        gen, rng_state, lnld, acc, dvar = carry
        active = (g != ref_locus) & gen.valid[g]
        rold = gen.mut_rate[g]
        rref = gen.mut_rate[ref_locus]
        onehot = jnp.arange(L) == g
        z, rng_state = R.rnd2normal8(rng_state, onehot & active)
        rnew = reflect(rold + finetune * z[g], jnp.zeros((), lnld.dtype),
                       rold + rref).astype(lnld.dtype)
        rrefnew = rref + rold - rnew

        idx = jnp.stack([g, jnp.asarray(ref_locus, g.dtype)])
        new_pair = _pair_lnld(gen, seq, idx, jnp.stack([rnew, rrefnew]))
        dlnld = (new_pair[0] - lnld[g]) + (new_pair[1] - lnld[ref_locus])
        lnacc = ((var_alpha - 1.0)
                 * jnp.log((rnew * rrefnew) / (rold * rref)) + dlnld)

        need_u = active & (lnacc < 0.0)
        u, rng_state = R.rndu(rng_state, onehot & need_u)
        accept = active & ((lnacc >= 0.0)
                           | (u[g] < jnp.exp(jnp.minimum(lnacc, 0.0))))
        gen = gen._replace(mut_rate=jnp.where(
            accept,
            gen.mut_rate.at[g].set(rnew).at[ref_locus].set(rrefnew),
            gen.mut_rate))
        lnld = jnp.where(
            accept,
            lnld.at[g].set(new_pair[0]).at[ref_locus].set(new_pair[1]),
            lnld)
        acc = acc + accept.astype(jnp.int32)
        dvar = dvar + jnp.where(
            accept,
            (rnew**2 + rrefnew**2 - rold**2 - rref**2) / L, 0.0)
        return (gen, rng_state, lnld, acc, dvar), None

    init = (gen, rng_state, lnld, jnp.zeros((), jnp.int32),
            jnp.zeros((), lnld.dtype))
    (gen, rng_state, lnld, acc, dvar), _ = lax.scan(
        body, init, jnp.arange(L, dtype=jnp.int32))
    return gen, rng_state, lnld, acc, dvar


def update_locus_rates_paired(gen: GenState, seq: SeqData, rng_state,
                              finetune, lnld: jnp.ndarray, var_alpha,
                              cond, loci_axis=None):
    """Vectorized locus-rate kernel: random disjoint pairs, one step.

    The reference couples every locus to reference locus 0, forcing an
    L-step serial scan (src/GPhoCS.c:4598-4674).  This production kernel
    targets the same constrained posterior (rates live on the simplex
    sum r = L; each move transfers rate mass within a pair, exactly
    preserving the sum): a random perfect matching is drawn each call,
    every pair proposes one transfer, and all acceptances are independent
    because no locus appears in two pairs.  One vectorized pruning pass
    evaluates all proposed likelihoods (per-iteration cost independent of
    L up to that single pass).  The serial kernel remains the conformance
    path; marginal agreement is tested statistically
    (tests/test_locus_rate_paired.py).

    Returns (gen, rng_state, lnld, cond, accepted, rate_var_delta).
    """
    from gphocs_tpu.ops.likelihood_cache import full_build, lnld_from_cond

    L = gen.num_loci
    dt = lnld.dtype
    mask = jnp.ones((L,), bool)

    # random perfect matching: argsort of per-locus uniforms; rank 2m
    # pairs with rank 2m+1 (odd L: the last-ranked locus sits out)
    u_perm, rng_state = R.rndu(rng_state, mask)
    order = jnp.argsort(u_perm)                       # [L] locus ids by rank
    rank = jnp.argsort(order)                         # rank of each locus
    mate_rank = jnp.where(rank % 2 == 0, rank + 1, rank - 1)
    mate = order[jnp.clip(mate_rank, 0, L - 1)]       # partner locus id
    paired = (mate_rank < L) & (mate != jnp.arange(L)) & gen.valid \
        & gen.valid[mate]
    is_lo = rank % 2 == 0                             # proposer of the pair

    r = gen.mut_rate.astype(dt)
    r_mate = r[mate]
    z, rng_state = R.rnd2normal8(rng_state, mask)
    # the lower-ranked member proposes; both members see mirrored values
    z_pair = jnp.where(is_lo, z, z[mate])
    r_self_lo = jnp.where(is_lo, r, r_mate)           # pair's proposer rate
    total = r + r_mate
    rnew_lo = reflect(r_self_lo + finetune * z_pair,
                      jnp.zeros((), dt), total).astype(dt)
    rnew = jnp.where(is_lo, rnew_lo, total - rnew_lo)
    rnew = jnp.where(paired, rnew, r)

    gen_prop = gen._replace(mut_rate=rnew)
    cond_prop = full_build(gen_prop, seq)
    lnld_prop = lnld_from_cond(cond_prop, gen_prop, seq)

    dlnld_pair = (lnld_prop - lnld) + (lnld_prop - lnld)[mate]
    lnacc = ((var_alpha - 1.0)
             * jnp.log((rnew * rnew[mate]) / jnp.maximum(r * r_mate, 1e-300))
             + dlnld_pair)
    from gphocs_tpu.kernels.common import mh_accept

    # one uniform per pair: both members read the proposer's draw
    need = paired & (lnacc < 0.0)
    u, rng_state = R.rndu(rng_state, need)
    u_pair = jnp.where(is_lo, u, u[mate])
    accept = paired & ((lnacc >= 0.0)
                       | (u_pair < jnp.exp(jnp.minimum(lnacc, 0.0))))

    new_rate = jnp.where(accept, rnew, gen.mut_rate)
    gen = gen._replace(mut_rate=new_rate)
    lnld_new = jnp.where(accept, lnld_prop, lnld)
    cond_new = jnp.where(accept[:, None, None, None], cond_prop, cond)
    # count accepted LOCI (both pair members), matching the serial
    # kernel's denominator semantics in the acceptance log
    from gphocs_tpu.kernels.common import maybe_psum

    # under shard_map pairs form within each loci shard (the matching is
    # a free choice of the kernel; per-pair rate-sum conservation keeps
    # the global mean-1 constraint exact); the variance accumulator and
    # acceptance count reduce over the axis, with the global L in the
    # denominator
    L_total = L if loci_axis is None else L * jax.lax.axis_size(loci_axis)
    acc = maybe_psum(jnp.sum(accept.astype(jnp.int32), dtype=jnp.int32),
                     loci_axis)
    dvar = maybe_psum(jnp.sum(jnp.where(accept, rnew**2 - r**2, 0.0)),
                      loci_axis) / L_total
    return gen, rng_state, lnld_new, cond_new, acc, dvar
