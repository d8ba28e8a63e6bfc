"""Pallas TPU kernel: fused Felsenstein-JC pruning.

The jnp implementation (ops/pruning.py) executes one scan step per
internal node — ~S dispatches of small [L, P, 4] updates per likelihood
evaluation, and the sampler evaluates likelihoods ~2(S-1)+P_anc times per
iteration.  At sample-scale model sizes the TPU is dispatch-bound, so this
kernel fuses the whole per-locus pruning recursion into a single
`pallas_call`: a grid over locus tiles, conditionals resident in VMEM,
scalar loops over (locus-in-tile, level) with vectorized [PW] pattern
rows.

Layout: conditionals are [TILE, N, PW] where PW = P*4 padded to a lane
multiple (128).  The per-level update for node v with sons a, b is

    pa = (1 - exp(-4 mu (t_v - t_a) / 3)) / 4     (scalar)
    cond[v, p, x] = (pa * sum_y cond[a,p,y] + (1-4 pa) cond[a,p,x]) * (...b)

with the base-sum reduced per 4-wide group via a precomputed [PW, PW]
group-sum matrix (an MXU matmul per node).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gphocs_tpu.state import GenState, SeqData

_TILE = 8


def _group_sum_matrix(pw: int) -> np.ndarray:
    """[PW, PW] matrix G with (c @ G)[i] = sum over i's 4-wide group."""
    g = np.zeros((pw, pw), np.float32)
    for i in range(pw):
        base = (i // 4) * 4
        g[base:base + 4, i] = 1.0
    return g


def _pruning_kernel(order_ref, lson_ref, rson_ref,
                    age_ref, mut_ref, leaf_ref, gmat_ref,
                    out_ref, cond_ref):
    """One locus tile.  Shapes:
    order/lson/rson: [TILE, N] int32 (SMEM); age [TILE, N], mut [TILE, 1],
    leaf [TILE, S * PW] (leaf conditionals flattened), gmat [PW, PW];
    out [TILE, PW] (root conditionals); cond scratch [TILE, N, PW]."""
    tile, n_nodes, pw = cond_ref.shape
    s = (n_nodes + 1) // 2
    leaf = leaf_ref[:].reshape(tile, s, pw)
    cond_ref[:, :s, :] = leaf
    gmat = gmat_ref[:]

    def locus_body(i, _):
        mu = mut_ref[i, 0]

        def level_body(k, _):
            v = order_ref[i, k]
            a = lson_ref[i, v]
            b = rson_ref[i, v]
            tv = age_ref[i, v]
            ca = cond_ref[i, a, :]
            cb = cond_ref[i, b, :]
            la = mu * (tv - age_ref[i, a])
            lb = mu * (tv - age_ref[i, b])
            pa = jnp.where(la < 1e-30, 0.0,
                           (1.0 - jnp.exp(-4.0 * la / 3.0)) / 4.0)
            pb = jnp.where(lb < 1e-30, 0.0,
                           (1.0 - jnp.exp(-4.0 * lb / 3.0)) / 4.0)
            sa = jnp.dot(ca.reshape(1, pw), gmat,
                         preferred_element_type=jnp.float32).reshape(pw)
            sb = jnp.dot(cb.reshape(1, pw), gmat,
                         preferred_element_type=jnp.float32).reshape(pw)
            fa = pa * sa + (1.0 - 4.0 * pa) * ca
            fb = pb * sb + (1.0 - 4.0 * pb) * cb
            cond_ref[i, v, :] = fa * fb
            return 0

        lax.fori_loop(0, s - 1, level_body, 0)
        root = order_ref[i, s - 2]
        out_ref[i, :] = cond_ref[i, root, :]
        return 0

    lax.fori_loop(0, tile, locus_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pruning_root_conditionals(gen: GenState, seq: SeqData,
                              interpret: bool = False):
    """[L, P, 4] root conditionals via the fused kernel (f32)."""
    L, N = gen.father.shape
    S = (N + 1) // 2
    P = seq.leaf_base.shape[2]
    PW = ((P * 4 + 127) // 128) * 128
    order = jnp.argsort(gen.age[:, S:], axis=1).astype(jnp.int32) + S

    onehot = (seq.leaf_base[..., None] == jnp.arange(4, dtype=jnp.int8))
    is_n = seq.leaf_base[..., None] >= 4
    leaf = (onehot | is_n).astype(jnp.float32).reshape(L, S, P * 4)
    leaf = jnp.pad(leaf, ((0, 0), (0, 0), (0, PW - P * 4)))
    leaf = leaf.reshape(L, S * PW)

    pad_l = (-L) % _TILE
    if pad_l:
        order = jnp.pad(order, ((0, pad_l), (0, 0)))
        leaf = jnp.pad(leaf, ((0, pad_l), (0, 0)))
    Lp = L + pad_l
    lson = jnp.pad(jnp.maximum(gen.lson, 0).astype(jnp.int32),
                   ((0, pad_l), (0, 0)))
    rson = jnp.pad(jnp.maximum(gen.rson, 0).astype(jnp.int32),
                   ((0, pad_l), (0, 0)))
    age = jnp.pad(gen.age.astype(jnp.float32), ((0, pad_l), (0, 0)))
    mut = jnp.pad(gen.mut_rate.astype(jnp.float32), (0, pad_l)
                  ).reshape(Lp, 1)
    gmat = jnp.asarray(_group_sum_matrix(PW))

    grid = (Lp // _TILE,)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i, 0), memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _pruning_kernel,
        grid=grid,
        in_specs=[
            smem((_TILE, S - 1)),                # order
            smem((_TILE, N)),                    # lson
            smem((_TILE, N)),                    # rson
            smem((_TILE, N)),                    # age
            smem((_TILE, 1)),                    # mut
            vmem((_TILE, S * PW)),               # leaf
            pl.BlockSpec((PW, PW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=vmem((_TILE, PW)),
        scratch_shapes=[pltpu.VMEM((_TILE, N, PW), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Lp, PW), jnp.float32),
        interpret=interpret,
    )(order, lson, rson, age, mut, leaf, gmat)
    out = out[:L, :P * 4].reshape(L, P, 4)
    return out


def data_log_likelihood_pallas(gen: GenState, seq: SeqData,
                               interpret: bool = False) -> jnp.ndarray:
    """Drop-in f32 twin of ops.pruning.data_log_likelihood."""
    root = pruning_root_conditionals(gen, seq, interpret=interpret)
    root_sum = jnp.sum(root, axis=-1)
    root_sum = jnp.where(seq.pattern_valid, root_sum, 0.0)
    P = root_sum.shape[1]
    seg = jax.vmap(
        lambda x, gid: jax.ops.segment_sum(x, gid, num_segments=P))(
        root_sum, seq.group_id)
    safe = jnp.where(seq.group_count > 0, seg, 1.0)
    return jnp.sum(
        seq.group_count * (jnp.log(safe)
                           - jnp.log(4.0 * seq.group_nphases)),
        axis=1).astype(gen.age.dtype)
