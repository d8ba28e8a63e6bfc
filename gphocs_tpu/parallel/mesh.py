"""Device-mesh scale-out: shard loci across chips/hosts.

The reference's only parallelism is an OpenMP `parallel for` over loci
within one shared-memory node, with atomics for cross-locus sums
(src/MultiCoreUtils.h:14-21, src/GPhoCS.c:2413-2424).  The TPU-native
equivalent is a 1-D `loci` mesh axis:

  * every [L, ...] state tensor is sharded on axis 0 (GenState, SeqData,
    per-locus RNG streams, lnld/lnp);
  * population-tree parameters, the general RNG stream and the Context are
    replicated;
  * the per-iteration cross-locus reductions (sum of likelihood deltas in
    tau/sample-age/mixing updates, total sufficient statistics in
    theta/mig-rate updates, conflict flags) compile to all-reduces over ICI
    — a few hundred bytes per iteration, exactly mirroring the role of the
    reference's `omp atomic` accumulators.

Partitioning is done by GSPMD through jit + NamedSharding annotations on
the inputs — the kernels themselves are sharding-agnostic.

Multi-host: call `init_distributed()` (jax.distributed) before creating
the mesh; loci shard across all processes' devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize the multi-host runtime (no-op for single host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices with a single 'loci' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("loci",))


def loci_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("loci"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_sampler_state(mesh: Mesh, gen, seq, lrng, lnld, lnp,
                        params=None, grng=None):
    """Place the per-locus state sharded over 'loci', the rest replicated.

    Returns the same tuple with device placements applied.  L must be a
    multiple of the mesh size — the Sampler constructor pads the loci axis
    with inert padding loci (valid=False, zero pattern counts) before
    sharding, so their likelihood is 0 and they are masked out of the
    sufficient statistics (ops/coalstats.py gates on gen.valid).
    """
    sh = loci_sharding(mesh)
    rep = replicated(mesh)

    def put_loci(tree):
        # per-leaf: rank >= 1 leaves shard on their loci axis; rank-0
        # leaves (e.g. the fast-RNG draw counter) replicate
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh if jnp.ndim(x) >= 1 else rep),
            tree)

    gen = put_loci(gen)
    seq = put_loci(seq)
    lrng = put_loci(lrng)
    lnld = jax.device_put(lnld, sh)
    lnp = jax.device_put(lnp, sh)
    out = [gen, seq, lrng, lnld, lnp]
    if params is not None:
        out.append(jax.device_put(params, rep))
    if grng is not None:
        out.append(jax.device_put(grng, rep))
    return tuple(out)
