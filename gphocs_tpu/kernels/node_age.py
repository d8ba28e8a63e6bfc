"""UpdateGB_InternalNode: random-walk updates of coalescent-node ages.

Mirrors reference src/GPhoCS.c:2287-2428.  Nodes are swept sequentially
(inner `lax.scan` over node index, matching the C per-locus sweep order);
all loci update in parallel at each step.

Per node per locus:
  bounds  tb0 = max(pop age, per-son last-mig-age-or-son-age)
          tb1 = min(father-pop age | OLDAGE,
                    first-mig-age | father age (unless locus root))
  tnew    = reflect(t + finetune * rnd2normal8, tb0, tb1)
  lnacc   = [lnP(G') - lnP(G)] + [lnld'(X) - lnld(X)]
  a |tnew - t| < 1e-15 proposal is counted accepted without further draws
  (reference :2358-2362).

The genealogy-prior delta is closed-form (node_age_move_delta); the data
delta is computed incrementally from the carried conditionals tensor by
refreshing only the moved node and its ancestors (the tensor twin of the
reference's dirty-conditional reuse, src/LocusDataLikelihood.c:426-520) —
topology is static during this sweep so the one-hot topology tables are
hoisted out of the node scan.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gphocs_tpu import rng as R
from gphocs_tpu.kernels.common import (
    Context,
    band_windows,
    first_mig_above,
    last_mig_below,
    mh_accept,
)
from gphocs_tpu.ops.coalstats import node_age_move_delta
from gphocs_tpu.ops.likelihood_cache import make_tables, refresh_and_lnld
from gphocs_tpu.state import GenState, Params, SeqData
from gphocs_tpu.utils import reflect


def update_internal_node_ages(gen: GenState, params: Params, seq: SeqData,
                              rng_state, ctx: Context, finetune,
                              lnld: jnp.ndarray, lnp: jnp.ndarray,
                              cond: jnp.ndarray):
    """One full sweep over all internal nodes.

    lnld/lnp: current per-locus data log-likelihood and genealogy log-prior;
    cond: carried pruning conditionals (consistent with `gen`).  Returns
    (gen, rng_state, lnld, lnp, cond, accepted_count).
    """
    L = gen.num_loci
    S = gen.num_samples
    N = gen.num_nodes
    # inert padding loci (mesh/bucket alignment; gen.valid False) neither
    # propose nor count — the Pallas twins' `real` lane mask
    loci_mask = gen.valid
    bstart, bend = band_windows(ctx, params.tau)
    tables = make_tables(gen)  # topology is static across this sweep

    def body(carry, inode):
        gen, rng_state, lnld, lnp, cond, acc = carry
        t = gen.age[:, inode]
        pop = gen.node_pop[:, inode]

        tb0 = params.tau[pop]
        tb1 = jnp.where(pop == ctx.root_pop,
                        jnp.asarray(ctx.oldage, t.dtype),
                        params.tau[ctx.father_pop[pop]])
        # upper bound: first mig on own edge, else father age (locus root has none)
        node_vec = jnp.full((L,), inode, jnp.int32)
        fm = first_mig_above(gen, node_vec, jnp.full((L,), -jnp.inf, t.dtype))
        is_root = gen.root == inode
        fa = gen.father[:, inode]
        fa_age = gen.age[jnp.arange(L), jnp.where(fa < 0, 0, fa)]
        upper2 = jnp.where(jnp.isfinite(fm), fm,
                           jnp.where(is_root, jnp.inf, fa_age))
        tb1 = jnp.minimum(tb1, upper2)
        # lower bound: per son, last mig on son's edge else son age
        for son in (gen.lson[:, inode], gen.rson[:, inode]):
            lm = last_mig_below(gen, son, jnp.full((L,), jnp.inf, t.dtype))
            son_age = gen.age[jnp.arange(L), son]
            tb0 = jnp.maximum(tb0, jnp.where(jnp.isfinite(lm), lm, son_age))

        z, rng_state = R.rnd2normal8(rng_state, loci_mask)
        tnew = reflect(t + finetune * z, tb0, tb1).astype(t.dtype)
        tiny = jnp.abs(tnew - t) < 1e-15

        gen_prop = gen._replace(age=gen.age.at[:, inode].set(tnew))
        dirty0 = jnp.zeros((N,), bool).at[inode].set(True)
        cond_prop, lnld_prop = refresh_and_lnld(
            cond, gen_prop, seq, dirty0, tables)
        dlnp = node_age_move_delta(gen, params, ctx, node_vec, tnew,
                                   bstart, bend)
        lnp_prop = lnp + dlnp
        lnacc = dlnp + (lnld_prop - lnld)

        accept, rng_state = mh_accept(rng_state, lnacc, loci_mask & ~tiny)
        take = accept  # tiny moves keep the old age but count as accepted
        new_age = jnp.where(take, tnew, t)
        gen = gen._replace(age=gen.age.at[:, inode].set(new_age))
        cond = jnp.where(take[:, None, None, None], cond_prop, cond)
        lnld = jnp.where(take, lnld_prop, lnld)
        lnp = jnp.where(take, lnp_prop, lnp)
        acc = acc + jnp.sum(((accept | tiny) & loci_mask).astype(jnp.int32),
                            dtype=jnp.int32)
        return (gen, rng_state, lnld, lnp, cond, acc), None

    init = (gen, rng_state, lnld, lnp, cond, jnp.zeros((), jnp.int32))
    (gen, rng_state, lnld, lnp, cond, acc), _ = lax.scan(
        body, init, jnp.arange(S, N, dtype=jnp.int32))
    return gen, rng_state, lnld, lnp, cond, acc
