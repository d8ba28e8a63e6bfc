"""gphocs_tpu — TPU-native Bayesian coalescent MCMC.

A ground-up JAX/XLA reimplementation of the capabilities of G-PhoCS
(Gronau et al. 2011): joint Bayesian sampling of population sizes (theta),
divergence times (tau), migration rates (m) and per-locus genealogies from
multi-locus sequence alignments, with migration bands and integration over
unphased diploid genotypes.

Design (TPU-first, not a port):
  * All per-locus state is held in fixed-shape tensors batched over loci
    (the reference's pointer-based event chains / linked lists are replaced
    by pure-functional recomputation over padded tensors).
  * MH update kernels are `vmap`-ed over loci and compiled by XLA; cross-locus
    reductions are `psum`s over a `loci` mesh axis (`shard_map`).
  * A vectorized reimplementation of the reference's per-locus Wichmann-Hill
    RNG streams enables golden-trace conformance tests against the C binary;
    production runs can use `jax.random` instead.
"""

__version__ = "0.1.0"

# Numerical contract: likelihoods and sufficient statistics flow through
# one-hot einsum selections; on TPU the default matmul precision rounds the
# non-one-hot operand to bfloat16 (measured ~2e-3 absolute error on pruning
# conditionals, ~1e-1 on per-locus log-likelihoods).  The reference is f64
# throughout — force full-precision dots.  This workload has no large
# matmuls, so the cost is negligible.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

from gphocs_tpu.constants import OLDAGE  # noqa: F401
