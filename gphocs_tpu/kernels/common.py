"""Shared static context + helpers for the MH update kernels."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gphocs_tpu.constants import OLDAGE
from gphocs_tpu.model.poptree import PopTree
from gphocs_tpu.state import GenState, Params


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Context:
    """Static (per-run) population-tree context.

    Array fields are pytree children (flow through jit); `root_pop`,
    `num_cur_pops` and `oldage` are static metadata usable in python
    control flow.  Band *windows* are functions of tau and are recomputed
    inside kernels via `band_windows`.
    """

    father_pop: jnp.ndarray     # [P] int32
    pop_sons: jnp.ndarray       # [P, 2] int32
    is_ancestral: jnp.ndarray   # [P, P] bool
    band_source: jnp.ndarray    # [B] int32
    band_target: jnp.ndarray    # [B] int32
    theta_alpha: jnp.ndarray    # [P]
    theta_beta: jnp.ndarray
    tau_alpha: jnp.ndarray
    tau_beta: jnp.ndarray
    mig_alpha: jnp.ndarray      # [B]
    mig_beta: jnp.ndarray
    sample_pop: jnp.ndarray     # [S] int32
    update_sample_age: jnp.ndarray  # [P] bool
    admix_slot: jnp.ndarray     # [A] int32
    admix_pops: jnp.ndarray     # [A, 2] int32
    root_pop: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_cur_pops: int = dataclasses.field(metadata=dict(static=True),
                                          default=0)
    oldage: float = dataclasses.field(metadata=dict(static=True),
                                      default=OLDAGE)

    @property
    def num_pops(self) -> int:
        return self.father_pop.shape[0]

    @property
    def num_bands(self) -> int:
        return self.band_source.shape[0]

    @property
    def num_admixed(self) -> int:
        return self.admix_slot.shape[0]


def make_context(tree: PopTree, dtype=jnp.float64) -> Context:
    return Context(
        father_pop=jnp.asarray(tree.father),
        pop_sons=jnp.asarray(tree.sons),
        is_ancestral=jnp.asarray(tree.is_ancestral),
        band_source=jnp.asarray(tree.band_source),
        band_target=jnp.asarray(tree.band_target),
        theta_alpha=jnp.asarray(tree.theta_alpha, dtype),
        theta_beta=jnp.asarray(tree.theta_beta, dtype),
        tau_alpha=jnp.asarray(tree.tau_alpha, dtype),
        tau_beta=jnp.asarray(tree.tau_beta, dtype),
        mig_alpha=jnp.asarray(tree.mig_alpha, dtype),
        mig_beta=jnp.asarray(tree.mig_beta, dtype),
        sample_pop=jnp.asarray(tree.sample_pop),
        update_sample_age=jnp.asarray(tree.update_sample_age),
        admix_slot=jnp.asarray(tree.admix_slot),
        admix_pops=jnp.asarray(tree.admix_pops),
        root_pop=int(tree.root_pop),
        num_cur_pops=int(tree.num_cur_pops),
        oldage=OLDAGE,
    )


def band_windows(ctx: Context, tau: jnp.ndarray):
    """[B] band start/end from current taus
    (reference src/PopulationTree.c:439-505)."""
    if ctx.num_bands == 0:
        z = jnp.zeros((0,), tau.dtype)
        return z, z
    src, tgt = ctx.band_source, ctx.band_target
    start = jnp.maximum(tau[src], tau[tgt])
    end = jnp.minimum(tau[ctx.father_pop[src]], tau[ctx.father_pop[tgt]])
    collapsed = start >= end
    start = jnp.where(collapsed, tau[tgt], start)
    end = jnp.where(collapsed, tau[tgt], end)
    return start, end


def pop_end(ctx: Context, tau: jnp.ndarray) -> jnp.ndarray:
    """[P] top of each pop's window (tau of father, OLDAGE for root)."""
    fa = ctx.father_pop
    return jnp.where(fa < 0, jnp.asarray(ctx.oldage, tau.dtype),
                     tau[jnp.where(fa < 0, 0, fa)])


def full_stats(gen: GenState, params: Params, ctx: Context):
    """Sufficient statistics with band windows derived from current taus."""
    from gphocs_tpu.ops.coalstats import sufficient_stats

    bs, be = band_windows(ctx, params.tau)
    return sufficient_stats(
        gen, params, father_pop=ctx.father_pop,
        is_ancestral=ctx.is_ancestral, band_source=ctx.band_source,
        band_target=ctx.band_target, band_start=bs, band_end=be,
        oldage=ctx.oldage)


def gen_log_prior_from_stats(stats, gen: GenState, params: Params,
                             ctx: Context) -> jnp.ndarray:
    """Per-locus genealogy log prior from precomputed sufficient stats
    (lets callers that already paid for full_stats skip a second pass)."""
    from gphocs_tpu.ops.coalstats import genealogy_log_prior

    lnp = genealogy_log_prior(stats, params)
    if ctx.num_admixed > 0:
        # admixture assignment terms (reference gtreeLnLikelihood,
        # src/patch.c:2725-2735): log(c) when the admixed leaf sits in its
        # second pop, log(1-c) in its first
        leaf_pop = gen.node_pop[:, ctx.admix_slot]         # [L, A]
        in_second = leaf_pop == ctx.admix_pops[None, :, 1]
        c = params.admix_coeff[None, :]
        lnp = lnp + jnp.sum(
            jnp.where(in_second, jnp.log(c), jnp.log1p(-c)), axis=1)
    return lnp


def gen_log_prior(gen: GenState, params: Params, ctx: Context) -> jnp.ndarray:
    return gen_log_prior_from_stats(full_stats(gen, params, ctx), gen,
                                    params, ctx)


def first_mig_above(gen: GenState, node: jnp.ndarray, age: jnp.ndarray):
    """Per locus: min age of active migration events on edge `node` with age
    > `age` (reference findFirstMig, src/patch.c:397).  Returns +inf when
    none.  node/age: [L]."""
    big = jnp.asarray(jnp.inf, gen.age.dtype)
    on = (gen.mig_branch == node[:, None]) & (gen.mig_branch >= 0) \
        & (gen.mig_age > age[:, None])
    return jnp.min(jnp.where(on, gen.mig_age, big), axis=1)


def last_mig_below(gen: GenState, node: jnp.ndarray, age: jnp.ndarray):
    """Per locus: max age of active migs on edge `node` with age < `age`
    (reference findLastMig, src/patch.c:374).  Returns -inf when none."""
    small = jnp.asarray(-jnp.inf, gen.age.dtype)
    on = (gen.mig_branch == node[:, None]) & (gen.mig_branch >= 0) \
        & (gen.mig_age < age[:, None])
    return jnp.max(jnp.where(on, gen.mig_age, small), axis=1)


def maybe_psum(x, loci_axis):
    """all-reduce over the loci mesh axis inside shard_map; identity
    outside.  These are the TPU twins of the reference's `omp atomic`
    accumulators (src/GPhoCS.c:2413-2424) — every global accept/reject
    decision depends only on such reductions (SURVEY §5)."""
    if loci_axis is None:
        return x
    return jax.lax.psum(x, loci_axis)


def maybe_pmax(x, loci_axis):
    if loci_axis is None:
        return x
    return jax.lax.pmax(x, loci_axis)


def mh_accept(rng_state, lnacc: jnp.ndarray, mask: jnp.ndarray):
    """Vectorized MH decision mirroring the reference's short-circuit:
    the uniform is only consumed when lnacceptance < 0
    (e.g. src/GPhoCS.c:2383).  lnacc/mask: [L]; rng_state holds the L
    per-locus streams.  Returns (accept [L], rng_state)."""
    from gphocs_tpu import rng as R

    need_u = mask & (lnacc < 0.0)
    u, rng_state = R.rndu(rng_state, need_u)
    accept = mask & ((lnacc >= 0.0) | (u < jnp.exp(jnp.minimum(lnacc, 0.0))))
    return accept, rng_state


def scalar_mh_accept(rng_state, lnacc, conflict=False):
    """MH decision on the (size-1) general stream (scalar lnacc)."""
    from gphocs_tpu import rng as R

    need_u = jnp.logical_and(jnp.logical_not(conflict), lnacc < 0.0)
    u, rng_state = R.general_draw_u(rng_state, need_u)
    accept = jnp.logical_and(
        jnp.logical_not(conflict),
        jnp.logical_or(lnacc >= 0.0,
                       u < jnp.exp(jnp.minimum(lnacc, 0.0))))
    return accept, rng_state
