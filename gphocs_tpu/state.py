"""MCMC state as fixed-shape tensors batched over loci.

The reference represents per-locus state as pointer-linked event chains
(src/patch.h:159-186) and LikelihoodNode trees (src/LocusDataLikelihood.c:90).
Here the complete sampler state is three pytrees of padded tensors:

  * `GenState`  — genealogies + migration events, [L, ...] tensors
  * `SeqData`   — static phased site-pattern data, [L, S, P] tensors
  * `Params`    — population-tree parameters (theta/tau/sample ages/mig rates)

Rejected proposals never mutate anything (pure-functional `jnp.where`
select), which eliminates the reference's entire savedVersion / revert
machinery (src/LocusDataLikelihood.c:768-906).

Node indexing per locus: 0..S-1 leaves (haploid sample slots, fixed pops),
S..2S-2 internal (coalescent) nodes.  The root's "edge" extends to OLDAGE
(mirroring the root chain padding of reference src/patch.c adjustRootEvents),
so migration events above the genealogy root are representable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class GenState(NamedTuple):
    """Per-locus genealogy + migration events.  L loci, N=2S-1 nodes, M mig slots."""

    father: jnp.ndarray     # [L, N] int32, -1 for root
    lson: jnp.ndarray       # [L, N] int32, -1 for leaves
    rson: jnp.ndarray       # [L, N] int32, -1 for leaves
    age: jnp.ndarray        # [L, N] float
    node_pop: jnp.ndarray   # [L, N] int32
    root: jnp.ndarray       # [L] int32
    mig_branch: jnp.ndarray  # [L, M] int32; child node of the edge carrying the event; -1 = free slot
    mig_band: jnp.ndarray   # [L, M] int32
    mig_age: jnp.ndarray    # [L, M] float
    mut_rate: jnp.ndarray   # [L] float, relative locus mutation rate
    valid: jnp.ndarray      # [L] bool; False for padding loci (sharding)

    @property
    def num_loci(self) -> int:
        return self.father.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.father.shape[1]

    @property
    def num_samples(self) -> int:
        return (self.father.shape[1] + 1) // 2

    @property
    def max_migs(self) -> int:
        return self.mig_branch.shape[1]


class SeqData(NamedTuple):
    """Phased site-pattern data (static during sampling).

    Patterns are the *phased* patterns of the reference (each unphased het
    pattern expands into a group of phased variants; the root likelihood
    averages over the group — reference src/LocusDataLikelihood.c:471-479).
    P = padded pattern capacity.
    """

    leaf_base: jnp.ndarray     # [L, S, P] int8: 0..3 = TCAG, 4 = N/missing
    group_id: jnp.ndarray      # [L, P] int32 phase-group segment id in [0, P)
    group_count: jnp.ndarray   # [L, P] float: site count of group g at index g (0 on padding)
    group_nphases: jnp.ndarray  # [L, P] float: #phases of group g at index g (1 on padding)
    pattern_valid: jnp.ndarray  # [L, P] bool: is this phased-pattern column real


class Params(NamedTuple):
    """Population-tree parameters (replicated across loci shards)."""

    theta: jnp.ndarray       # [P]
    tau: jnp.ndarray         # [P]: age of each pop (0 for current pops)
    sample_age: jnp.ndarray  # [P]: ancient-sample age per (current) pop
    mig_rate: jnp.ndarray    # [B]
    admix_coeff: jnp.ndarray = None  # [A] admixture coefficients


def pop_end_times(tau: jnp.ndarray, father: np.ndarray, oldage: float) -> jnp.ndarray:
    """Upper end of each population's time window: tau[father] or OLDAGE."""
    fa = jnp.asarray(father)
    return jnp.where(fa < 0, oldage, tau[jnp.where(fa < 0, 0, fa)])
