"""Coalescent-statistics diagnostic outputs.

Working implementation of the reference's dormant coal-stats machinery
(printCoalStats src/GPhoCS.c:911-1040; computeFlatStats :2278,
computeNodeStats :2172, recalcStats_partitioned :2523 of src/patch.c —
disabled there by `recordCoalStats && 0` at :1771):

  * flat stats: the single-population null model — total sum n(n-1) dt
    and total coalescent count with all populations merged;
  * node stats: per leaf-pair LCA ages (model-violation diagnosis);
  * partitioned stats: each population's time window split into
    `num-pop-partitions` equal slices with per-slice sum n(n-1) dt.

Enabled with `coal-stats-file <path>` (+ optional `num-pop-partitions`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gphocs_tpu.ops.coalstats import segments
from gphocs_tpu.state import GenState, Params


def flat_stats(gen: GenState, band_source, oldage=999.0):
    """[L] total coal stat with all pops merged; counts are S-1 per locus."""
    segs = segments(gen, band_source, oldage)
    lo = jnp.where(segs.valid, segs.start, 0.0)
    hi = jnp.where(segs.valid, segs.end, 0.0)
    pair = jnp.maximum(
        jnp.minimum(hi[:, :, None], hi[:, None, :])
        - jnp.maximum(lo[:, :, None], lo[:, None, :]), 0.0)
    pair = pair * (segs.valid[:, :, None] & segs.valid[:, None, :])
    length = jnp.maximum(hi - lo, 0.0)
    return jnp.sum(pair, axis=(1, 2)) - jnp.sum(length, axis=1)


def pairwise_lca_ages(gen: GenState):
    """[L, S, S] age of the LCA of every leaf pair
    (reference computePairwiseLCAs, src/LocusDataLikelihood.c:1685)."""
    L, N = gen.father.shape
    S = (N + 1) // 2
    # ancestor matrix per locus: anc[l, v, u] = v is ancestor-or-self of u
    anc = jnp.eye(N, dtype=bool)[None].repeat(L, 0)
    fa = jnp.where(gen.father < 0, jnp.arange(N)[None, :], gen.father)
    cur = jnp.arange(N)[None, :].repeat(L, 0)
    for _ in range(N):  # climb to root (N bounds the depth)
        cur = jnp.take_along_axis(fa, cur, axis=1)
        anc = anc.at[jnp.arange(L)[:, None], cur,
                     jnp.arange(N)[None, :]].set(True)
    # LCA(i, j) = the common ancestor with minimal age
    common = anc[:, :, :S, None] & anc[:, :, None, :S]   # [L, N, S, S]
    age_big = jnp.where(common, gen.age[:, :, None, None], jnp.inf)
    return jnp.min(age_big, axis=1)


def partitioned_stats(gen: GenState, params: Params, ctx, num_partitions):
    """[L, P, K] per-pop per-time-slice sum n(n-1) dt."""
    segs = segments(gen, ctx.band_source, ctx.oldage)
    P = params.tau.shape[0]
    pe = jnp.where(ctx.father_pop < 0, jnp.asarray(ctx.oldage),
                   params.tau[jnp.where(ctx.father_pop < 0, 0,
                                        ctx.father_pop)])
    out = []
    for k in range(num_partitions):
        lo_k = params.tau + (pe - params.tau) * (k / num_partitions)
        hi_k = params.tau + (pe - params.tau) * ((k + 1) / num_partitions)
        lo = jnp.maximum(
            jnp.maximum(segs.start[:, None, :], params.tau[None, :, None]),
            lo_k[None, :, None])
        hi = jnp.minimum(
            jnp.minimum(segs.end[:, None, :], pe[None, :, None]),
            hi_k[None, :, None])
        present = segs.valid[:, None, :] & jnp.asarray(
            ctx.is_ancestral)[:, segs.base_pop].transpose(1, 0, 2)
        lo = jnp.where(present, lo, 0.0)
        hi = jnp.where(present, hi, 0.0)
        pair = jnp.maximum(
            jnp.minimum(hi[:, :, :, None], hi[:, :, None, :])
            - jnp.maximum(lo[:, :, :, None], lo[:, :, None, :]), 0.0)
        pair = pair * (present[:, :, :, None] & present[:, :, None, :])
        length = jnp.maximum(hi - lo, 0.0)
        out.append(jnp.sum(pair, axis=(2, 3)) - jnp.sum(length, axis=2))
    return jnp.stack(out, axis=2)


def write_coal_stats_row(f, iteration, gen: GenState, params: Params, ctx,
                         tree, num_partitions: int = 1):
    """One diagnostics row: flat totals + per-pop partitioned totals +
    mean pairwise LCA ages over loci."""
    fl = np.asarray(flat_stats(gen, ctx.band_source, ctx.oldage))
    part = np.asarray(partitioned_stats(gen, params, ctx, num_partitions))
    lca = np.asarray(pairwise_lca_ages(gen)).mean(axis=0)
    S = lca.shape[0]
    cols = [str(iteration), f"{fl.sum():.8g}"]
    for p in range(part.shape[1]):
        for k in range(num_partitions):
            cols.append(f"{part[:, p, k].sum():.8g}")
    for i in range(S):
        for j in range(i + 1, S):
            cols.append(f"{lca[i, j]:.8g}")
    f.write("\t".join(cols) + "\n")


def coal_stats_header(tree, num_partitions: int = 1):
    cols = ["Sample", "flat-coal-stat"]
    for name in tree.names:
        for k in range(num_partitions):
            cols.append(f"coal-stat_{name}_{k}")
    S = tree.num_samples
    for i in range(S):
        for j in range(i + 1, S):
            cols.append(f"lca_{i}_{j}")
    return "\t".join(cols)
