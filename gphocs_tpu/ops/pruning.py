"""Felsenstein pruning under Jukes-Cantor, batched over loci.

Replaces the recursive, dirty-flagged pruning of the reference
(src/LocusDataLikelihood.c:426-520, 1559-1862) with a levelized scan:
internal nodes are processed in increasing age order (a valid topological
order for coalescent genealogies), each step updating one [P, 4] slice per
locus.  The JC edge transition (reference :1831-1848) is

    p(L)   = (1 - exp(-4 L / 3)) / 4,     L = mut_rate * delta_age
    out[b] = p * sum_b'(c[b']) + (1 - 4 p) * c[b]

and the root likelihood averages over the 4 root bases AND over all
phasings of each het pattern group (reference :471-479):

    lnL = sum_groups count_g * log( sum_{phases, bases} c_root / (4 n_g) )
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gphocs_tpu.state import GenState, SeqData


def _edge_p(edge_len: jnp.ndarray) -> jnp.ndarray:
    """JC substitution probability for one of the 3 off-diagonal bases.

    The reference clamps tiny/negative lengths to p=0
    (src/LocusDataLikelihood.c:1843-1846).
    """
    p = (1.0 - jnp.exp(-4.0 * edge_len / 3.0)) / 4.0
    return jnp.where(edge_len < 1e-100, 0.0, p)


def leaf_conditionals(leaf_base: jnp.ndarray, real_dtype) -> jnp.ndarray:
    """[.., S, P] int8 base codes -> [.., S, P, 4] conditionals.

    Code 0..3 -> one-hot; code 4 ('N'/missing) -> all-ones
    (reference src/LocusDataLikelihood.c:1321-1390).
    """
    onehot = (leaf_base[..., None] == jnp.arange(4, dtype=leaf_base.dtype))
    is_n = (leaf_base[..., None] >= 4)
    return (onehot | is_n).astype(real_dtype)


def _pruning_single(father, lson, rson, age, root, mut_rate,
                    leaf_base, group_id, group_count, group_nphases,
                    pattern_valid, real_dtype):
    """Log-likelihood of one locus.  Shapes: [N], [S, P], [P]."""
    N = father.shape[0]
    S = (N + 1) // 2
    P = leaf_base.shape[1]

    cond = jnp.zeros((N, P, 4), real_dtype)
    cond = cond.at[:S].set(leaf_conditionals(leaf_base, real_dtype))

    # process internal nodes in increasing age order (valid topological order)
    order = jnp.argsort(age[S:]) + S

    def step(cond, node):
        ls = lson[node]
        rs = rson[node]
        pl = _edge_p(mut_rate * (age[node] - age[ls])).astype(real_dtype)
        pr = _edge_p(mut_rate * (age[node] - age[rs])).astype(real_dtype)
        cl = cond[ls]
        cr = cond[rs]
        fl = pl * jnp.sum(cl, axis=-1, keepdims=True) + (1.0 - 4.0 * pl) * cl
        fr = pr * jnp.sum(cr, axis=-1, keepdims=True) + (1.0 - 4.0 * pr) * cr
        # constant x4 Felsenstein rescale per internal node: stored
        # conditionals are 4^(internal nodes in subtree) x true, keeping
        # f32 values representable at deep trees (true per-pattern root
        # conditionals reach ~0.25^N ~ 1e-38 at N=63 = the f32 underflow
        # boundary; the reference never sees this at f64).  The root
        # reduce subtracts the exact (S-1) log 4 back, so log-likelihood
        # VALUES are unchanged.  f32 overflow bound: 4^(S-1) < 3.4e38
        # -> S <= 64; use f64 beyond.
        cond = cond.at[node].set(4.0 * fl * fr)
        return cond, None

    cond, _ = lax.scan(step, cond, order)

    root_sum = jnp.sum(cond[root], axis=-1)              # [P]
    root_sum = jnp.where(pattern_valid, root_sum, 0.0)
    group_sum = jax.ops.segment_sum(root_sum, group_id, num_segments=P)
    # log of the phase-and-base average, weighted by site counts
    safe = jnp.where(group_count > 0, group_sum, 1.0)
    lnl = jnp.sum(
        group_count * (jnp.log(safe) - jnp.log(4.0 * group_nphases)
                       - (S - 1) * jnp.log(jnp.asarray(4.0, real_dtype)))
    )
    return lnl


def data_log_likelihood(gen: GenState, seq: SeqData) -> jnp.ndarray:
    """Per-locus data log-likelihood [L]."""
    real_dtype = gen.age.dtype
    fn = jax.vmap(
        lambda fa, ls, rs, ag, rt, mr, lb, gi, gc, gn, pv: _pruning_single(
            fa, ls, rs, ag, rt, mr, lb, gi, gc, gn, pv, real_dtype
        )
    )
    return fn(
        gen.father, gen.lson, gen.rson, gen.age, gen.root, gen.mut_rate,
        seq.leaf_base, seq.group_id, seq.group_count, seq.group_nphases,
        seq.pattern_valid,
    )
