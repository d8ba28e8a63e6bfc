"""Sampler driver: the performMCMC orchestration loop.

Mirrors reference src/GPhoCS.c:1232-2267: initialization, burn-in +
sampling loop with the per-iteration update schedule (sampler/step.py),
start-mig gating, trace emission, acceptance-rate logging and the dynamic
finetune binary search (reference :1898-2250, constants src/GPhoCS.h:21-25).
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gphocs_tpu import rng as R
from gphocs_tpu.constants import (
    FINETUNE_RESOLUTION,
    MAX_FINETUNE,
    TARGET_ACCEPTANCE_PERCENT,
    TARGET_ACCEPTANCE_RANGE,
)
from gphocs_tpu.config.settings import RunConfig
from gphocs_tpu.io import trace as trace_io
from gphocs_tpu.io.sequences import build_seq_data, read_seq_file
from gphocs_tpu.kernels.common import make_context
from gphocs_tpu.model.poptree import PopTree, build_poptree
from gphocs_tpu.ops.pruning import data_log_likelihood
from gphocs_tpu.ops.likelihood_cache import full_build, lnld_from_cond
from gphocs_tpu.kernels.common import gen_log_prior
import functools


@functools.partial(jax.jit, static_argnames=())
def _init_device_state(gen, params, seq, ctx):
    """One compiled call for the initial conditionals + likelihoods
    (eager evaluation would trigger one XLA compile per primitive —
    measured ~105 s of compile time at 1000 loci on the TPU relay)."""
    cond = full_build(gen, seq)
    lnld = lnld_from_cond(cond, gen, seq)
    lnp = gen_log_prior(gen, params, ctx)
    return cond, lnld, lnp
from gphocs_tpu.rng_host import HostRng
from gphocs_tpu.sampler.init import (
    init_gen_state,
    sample_locus_rates,
    sample_pop_parameters,
)
from gphocs_tpu.sampler.step import (Finetunes, mcmc_chunk,
    mcmc_chunk_chains, mcmc_iteration)
from gphocs_tpu.state import GenState, Params, SeqData


@dataclass
class _FinetuneSearch:
    """One binary-search tracker (reference src/GPhoCS.c:1898-2250)."""

    value: float
    lo: float = 0.0
    hi: float = MAX_FINETUNE

    def adjust(self, percent: float) -> float:
        if percent > TARGET_ACCEPTANCE_PERCENT + TARGET_ACCEPTANCE_RANGE:
            self.lo = self.value
            if self.hi - self.lo < FINETUNE_RESOLUTION:
                if self.hi >= MAX_FINETUNE:
                    self.hi = self.lo = MAX_FINETUNE
                else:
                    self.hi *= 2.0
        elif percent < TARGET_ACCEPTANCE_PERCENT - TARGET_ACCEPTANCE_RANGE:
            self.hi = self.value
            if self.hi - self.lo < FINETUNE_RESOLUTION:
                self.lo /= 2.0
        self.value = 0.5 * (self.hi + self.lo)
        return self.value


@dataclass
class AcceptCounts:
    coal_time: int = 0
    mig_time: int = 0
    spr: int = 0
    theta: int = 0
    mig_rate: int = 0
    taus: Optional[np.ndarray] = None
    mixing: int = 0
    conflicts: int = 0
    mig_nodes: int = 0
    locus_rate: int = 0
    admix: int = 0

    def reset(self, P: int):
        self.coal_time = self.mig_time = self.spr = 0
        self.theta = self.mig_rate = self.mixing = 0
        self.conflicts = self.mig_nodes = 0
        self.locus_rate = self.admix = 0
        self.taus = np.zeros(P, int)


class Sampler:
    """End-to-end sampler for one control-file configuration."""

    def __init__(self, cfg: RunConfig, seq_path: Optional[str] = None,
                 num_loci: Optional[int] = None, dtype=jnp.float64,
                 legacy_rng: bool = True, verbose: bool = False,
                 mesh=None, chains: int = 1, rng_mode: str = "legacy",
                 buckets: int = 1):
        """mesh: optional jax.sharding.Mesh with a 'loci' axis; per-locus
        state shards over it (loci padded to a device-count multiple with
        inert padding loci).  chains > 1 runs that many independent chains
        vmapped over a leading axis (shared data; per-chain params/RNG).

        rng_mode: 'legacy' carries the reference's Wichmann-Hill streams
        (bit-compatible consumption order, conformance mode); 'fast' uses
        loop-free counter-based streams (gphocs_tpu/rng_fast.py) — the
        production mode on TPU, statistically but not bitwise equivalent."""
        self.cfg = cfg
        self.mesh = mesh
        self.chains = chains
        assert rng_mode in ("legacy", "fast")
        self.rng_mode = rng_mode
        # pattern-axis bucketing for ragged loci (sampler/bucketed.py):
        # pads each bucket only to its own max pattern count
        self.buckets = max(1, buckets)
        if self.buckets > 1:
            assert rng_mode == "fast" and chains == 1, \
                "bucketed mode requires fast RNG and one chain"
            assert not cfg.admixed, "bucketed mode: no admixture support"
        # whole-sweep fused Pallas kernels (ops/sweeps_pallas.py): the
        # production TPU path.  Fast-RNG mode only (the kernels reproduce
        # the counter-based streams in-kernel, draw-for-draw); XLA path
        # retained for conformance (legacy RNG), CPU, and as a fallback
        # (GPHOCS_FUSED=0).  Under a mesh the fused chunk runs inside
        # shard_map over the 'loci' axis with psum reductions at the
        # global decision points (the reference's `omp atomic` twins).
        # GPHOCS_FUSED_INTERPRET=1 runs the kernels in interpret mode so
        # the sharded fused path can be validated on a virtual CPU mesh.
        self.fused_interpret = bool(
            os.environ.get("GPHOCS_FUSED_INTERPRET", "0") == "1")
        self.use_fused = bool(
            (jax.default_backend() == "tpu" or self.fused_interpret)
            and rng_mode == "fast"
            and jnp.zeros((), dtype).dtype == jnp.float32
            and os.environ.get("GPHOCS_FUSED", "1") != "0")
        self._sharded_chunk_cache = {}
        self.tree: PopTree = build_poptree(cfg)
        self.ctx = make_context(self.tree, dtype)
        self.dtype = dtype
        self.verbose = verbose

        seed = cfg.mcmc.random_seed
        if seed < 0:
            seed = int(time.time())
        self.seed = seed

        if seq_path is None and cfg.mcmc.seq_file != "NONE":
            seq_path = cfg.mcmc.seq_file
        if seq_path is not None:
            raw = read_seq_file(seq_path, cfg.sample_names,
                                cfg.mcmc.num_loci)
            self.num_loci = raw.num_loci
            np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
            if self.buckets > 1:
                from gphocs_tpu.io.sequences import build_seq_data_buckets

                perm, sizes, seqs = build_seq_data_buckets(
                    raw, cfg.is_diploid(), self.buckets, dtype=np_dtype)
                self.bucket_perm = perm
                self.bucket_sizes = sizes
                # the cost-minimizing partition may use fewer buckets
                # than requested (e.g. few distinct pattern counts)
                self.buckets = len(sizes)
                self.seqs = tuple(SeqData(*[jnp.asarray(x) for x in s_])
                                  for s_ in seqs)
                # a dense (unbucketed) copy only for shape bookkeeping
                self.seq: SeqData = build_seq_data(raw, cfg.is_diploid(),
                                                   dtype=np_dtype)
            else:
                self.seq = build_seq_data(raw, cfg.is_diploid(),
                                          dtype=np_dtype)
        else:
            # prior-only run (reference initLociWithoutData,
            # src/GPhoCS.c:447-483)
            assert num_loci or cfg.mcmc.num_loci > 0, \
                "num-loci required without sequence data"
            self.num_loci = num_loci or cfg.mcmc.num_loci
            S = cfg.num_samples
            self.seq = SeqData(
                leaf_base=np.full((self.num_loci, S, 1), 4, np.int8),
                group_id=np.zeros((self.num_loci, 1), np.int32),
                group_count=np.zeros((self.num_loci, 1)),
                group_nphases=np.ones((self.num_loci, 1)),
                pattern_valid=np.zeros((self.num_loci, 1), bool),
            )
        # VMEM feasibility of the whole-sweep kernels: two conditional
        # buffers (working + proposal scratch) at the minimum 128-lane
        # tile must fit the _pick_tile budget (ops/sweeps_pallas.py).
        # Beyond it (large samples x patterns) fall back to the XLA path
        # rather than fail Mosaic allocation — the documented sample-axis
        # capacity bound (SAMPLES_r04.json).
        self.bucket_fused = (False,) * self.buckets
        if self.use_fused and seq_path is not None:
            N_nodes = 2 * cfg.num_samples - 1

            def _fits(P_pat):
                CPWP = (4 * P_pat + 7) // 8 * 8
                return 2 * N_nodes * CPWP * 128 * 4 <= 8 * 1024 * 1024

            if self.buckets > 1:
                # per-bucket gate: small-pattern buckets keep the fused
                # kernels; only buckets whose conditionals overflow VMEM
                # fall back to the XLA path.  With heavy-tailed pattern
                # counts (e.g. one 2^k-phasing whale locus) this keeps
                # ~all loci on the production kernels
                self.bucket_fused = tuple(
                    _fits(int(s_.leaf_base.shape[2])) for s_ in self.seqs)
                if not any(self.bucket_fused):
                    self.use_fused = False
            elif not _fits(int(self.seq.leaf_base.shape[2])):
                import warnings

                warnings.warn(
                    f"fused kernels disabled: conditionals "
                    f"({N_nodes} nodes x {self.seq.leaf_base.shape[2]} "
                    f"patterns) exceed the VMEM tile budget; using the "
                    f"XLA path (consider --buckets for ragged data)")
                self.use_fused = False
        self.pad_loci = 0
        if mesh is not None and self.buckets == 1:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            rem = self.num_loci % n_dev
            if rem:
                self.pad_loci = n_dev - rem
                pad = self.pad_loci
                self.seq = SeqData(
                    leaf_base=np.concatenate(
                        [self.seq.leaf_base,
                         np.repeat(self.seq.leaf_base[:1], pad, 0)]),
                    group_id=np.concatenate(
                        [self.seq.group_id,
                         np.repeat(self.seq.group_id[:1], pad, 0)]),
                    group_count=np.concatenate(
                        [self.seq.group_count,
                         np.zeros((pad,) + self.seq.group_count.shape[1:])]),
                    group_nphases=np.concatenate(
                        [self.seq.group_nphases,
                         np.ones((pad,) + self.seq.group_nphases.shape[1:])]),
                    pattern_valid=np.concatenate(
                        [self.seq.pattern_valid,
                         np.zeros((pad,) + self.seq.pattern_valid.shape[1:],
                                  bool)]),
                )
                self.num_loci += pad
        self.seq = SeqData(*[jnp.asarray(x) for x in self.seq])
        self.host_rng = HostRng(self.num_loci + 1, seed, legacy=legacy_rng)
        self._legacy_host_rng = legacy_rng
        self.trace_rows: List[str] = []

    # -- initialization (reference initializeMCMC, src/GPhoCS.c:1122) --
    def initialize(self):
        if self.chains > 1:
            return self._initialize_chains()
        cfg = self.cfg
        params = sample_pop_parameters(self.tree, self.host_rng)
        fixed = None
        if cfg.mcmc.mut_rate_mode == 2:
            # whitespace-separated per-locus rates, normalized to mean 1
            # (reference readRateFile, src/GPhoCS.c:486-560)
            fixed = np.loadtxt(cfg.mcmc.rate_file).ravel()[:self.num_loci]
            if len(fixed) < self.num_loci:
                raise ValueError(
                    f"rate file has {len(fixed)} rates, "
                    f"need {self.num_loci}")
        rates, self.rate_var = sample_locus_rates(
            self.num_loci, cfg.mcmc.mut_rate_mode, self.host_rng, fixed)
        if self.rng_mode == "fast":
            from gphocs_tpu.sampler.init import init_gen_state_fast

            gen_np = init_gen_state_fast(self.tree, params,
                                         self.seed ^ 0x243F6A88,
                                         self.num_loci, rates)
        else:
            gen_np = init_gen_state(self.tree, params, self.host_rng,
                                    self.num_loci, rates)
        self.gen = GenState(*[jnp.asarray(x) for x in gen_np])
        cast = lambda a: jnp.asarray(a, self.dtype)  # noqa: E731
        self.gen = self.gen._replace(age=cast(gen_np.age),
                                     mig_age=cast(gen_np.mig_age),
                                     mut_rate=cast(gen_np.mut_rate))
        self.params = Params(theta=cast(params.theta), tau=cast(params.tau),
                             sample_age=cast(params.sample_age),
                             mig_rate=cast(params.mig_rate),
                             admix_coeff=cast(params.admix_coeff))
        # per-locus streams [L] and general stream [1] are kept separate so
        # that locus streams shard cleanly over the loci mesh axis
        if self.rng_mode == "fast":
            from gphocs_tpu.rng_fast import init_fast

            self.lrng = init_fast(self.num_loci, self.seed)
            self.grng = init_fast(1, self.seed + 0x5F3759DF)
        else:
            x, y, z = self.host_rng.state_arrays()
            self.lrng = R.RngState(x=jnp.asarray(x[:-1]),
                                   y=jnp.asarray(y[:-1]),
                                   z=jnp.asarray(z[:-1]))
            self.grng = R.RngState(x=jnp.asarray(x[-1:]),
                                   y=jnp.asarray(y[-1:]),
                                   z=jnp.asarray(z[-1:]))
        if self.pad_loci:
            self.gen = self.gen._replace(valid=self.gen.valid.at[
                self.num_loci - self.pad_loci:].set(False))
        if self.mesh is not None and self.buckets == 1:
            from gphocs_tpu.parallel.mesh import (
                loci_sharding, replicated, shard_sampler_state)

            (self.gen, self.seq, self.lrng, _ld, _lp, self.params,
             self.grng) = shard_sampler_state(
                self.mesh, self.gen, self.seq, self.lrng,
                jnp.zeros((self.num_loci,), self.dtype),
                jnp.zeros((self.num_loci,), self.dtype),
                self.params, self.grng)
            self.ctx = jax.device_put(self.ctx, replicated(self.mesh))
        if self.buckets > 1:
            # slice the full state into buckets along the sorted-locus
            # permutation; each bucket pads patterns only to its own max
            perm = jnp.asarray(self.bucket_perm)
            gperm = jax.tree_util.tree_map(
                lambda a: a[perm] if (hasattr(a, "ndim") and a.ndim >= 1
                                      and a.shape[0] == self.num_loci)
                else a, self.gen)
            keys = self.lrng.key[perm]
            gens, lrngs, lnlds, lnps, conds = [], [], [], [], []
            off = 0
            n_dev = 1
            if self.mesh is not None:
                n_dev = int(np.prod([self.mesh.shape[a]
                                     for a in self.mesh.axis_names]))
            from gphocs_tpu.rng_fast import FastRngState
            seqs_p = list(self.seqs)
            for k, n in enumerate(self.bucket_sizes):
                gk = jax.tree_util.tree_map(
                    lambda a: a[off:off + n]
                    if (hasattr(a, "ndim") and a.ndim >= 1
                        and a.shape[0] == self.num_loci) else a, gperm)
                keys_k = keys[off:off + n]
                padk = (-n) % n_dev
                if padk:
                    # buckets x mesh: pad each bucket to a mesh multiple
                    # with inert loci (valid=False, zero pattern counts
                    # -> zero likelihood, masked out of all statistics),
                    # exactly the dense path's pad_loci mechanism
                    rep_rows = lambda a: (jnp.concatenate(  # noqa: E731
                        [a, jnp.repeat(a[:1], padk, axis=0)], axis=0)
                        if hasattr(a, "ndim") and a.ndim >= 1
                        and a.shape[0] == n else a)
                    gk = jax.tree_util.tree_map(rep_rows, gk)
                    gk = gk._replace(valid=gk.valid.at[n:].set(False))
                    keys_k = jnp.concatenate(
                        [keys_k, keys_k[:1] + jnp.arange(
                            1, padk + 1, dtype=keys_k.dtype) * 0x9E3779B9])
                    sq = seqs_p[k]
                    seqs_p[k] = SeqData(
                        leaf_base=rep_rows(sq.leaf_base),
                        group_id=rep_rows(sq.group_id),
                        group_count=rep_rows(sq.group_count).at[n:].set(0),
                        group_nphases=rep_rows(sq.group_nphases
                                               ).at[n:].set(1),
                        pattern_valid=rep_rows(sq.pattern_valid
                                               ).at[n:].set(False))
                lrngs.append(FastRngState(key=keys_k,
                                          ctr=jnp.zeros((), jnp.uint32)))
                ck, ldk, lpk = _init_device_state(
                    gk, self.params, seqs_p[k], self.ctx)
                gens.append(gk)
                conds.append(ck)
                lnlds.append(ldk)
                lnps.append(lpk)
                off += n
            self.seqs = tuple(seqs_p)
            self.gens = tuple(gens)
            self.lrngs = tuple(lrngs)
            self.conds = tuple(conds)
            self.lnlds = tuple(lnlds)
            self.lnps = tuple(lnps)
            if self.mesh is not None:
                from gphocs_tpu.parallel.mesh import (loci_sharding,
                                                      replicated)

                sh = loci_sharding(self.mesh)
                rep = replicated(self.mesh)
                put = lambda t: jax.tree_util.tree_map(  # noqa: E731
                    lambda x: jax.device_put(
                        x, sh if jnp.ndim(x) >= 1 else rep), t)
                self.gens = put(self.gens)
                self.seqs = put(self.seqs)
                self.lrngs = put(self.lrngs)
                self.conds = put(self.conds)
                self.lnlds = put(self.lnlds)
                self.lnps = put(self.lnps)
                self.params = jax.device_put(self.params, rep)
                self.grng = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep), self.grng)
                self.ctx = jax.device_put(self.ctx, rep)
            self.lnld = jnp.concatenate(self.lnlds)
            self.lnp = jnp.concatenate(self.lnps)
            self.cond = None
        else:
            self.cond, self.lnld, self.lnp = _init_device_state(
                self.gen, self.params, self.seq, self.ctx)

        ftc = cfg.mcmc.finetunes
        if cfg.mcmc.find_finetunes:
            # reference seeds the search at 1.0 for unspecified finetunes
            seedv = lambda v: v if v > 0 else 1.0  # noqa: E731
        else:
            seedv = lambda v: v  # noqa: E731
        self.ft_search = {
            "coal_time": _FinetuneSearch(seedv(ftc.coal_time)),
            "mig_time": _FinetuneSearch(seedv(ftc.mig_time)),
            "theta": _FinetuneSearch(seedv(ftc.theta)),
            "mig_rate": _FinetuneSearch(seedv(ftc.mig_rate)),
            "mixing": _FinetuneSearch(seedv(ftc.mixing)),
            "locus_rate": _FinetuneSearch(seedv(ftc.locus_rate)),
            "admix": _FinetuneSearch(seedv(ftc.admix)),
        }
        self.ft_taus = [
            _FinetuneSearch(seedv(v) if v > 0 or cfg.mcmc.find_finetunes
                            else v)
            for v in ftc.taus
        ]
        self._update_ft_device()

    def _initialize_chains(self):
        """Stack `chains` independent initializations along a leading axis."""
        import jax

        cfg = self.cfg
        states = []
        base_seed = self.seed
        self.rate_var = 0.0
        for c in range(self.chains):
            self.host_rng = HostRng(self.num_loci + 1,
                                    base_seed + 7919 * c,
                                    legacy=self._legacy_host_rng)
            # fast-mode device streams (lrng/grng) and the genealogy
            # simulation seed from self.seed — give every chain its own,
            # or the vmapped chains share identical proposal noise
            # (correlated chains defeat the R-hat diagnostics)
            self.seed = base_seed + 7919 * c
            self.chains, saved = 1, self.chains
            try:
                self.initialize()
            finally:
                self.chains = saved
                self.seed = base_seed
            states.append((self.gen, self.params, self.lrng, self.grng,
                           self.lnld, self.lnp, self.cond))
        stack = lambda xs: jax.tree_util.tree_map(  # noqa: E731
            lambda *a: jnp.stack(a), *xs)
        (self.gen, self.params, self.lrng, self.grng, self.lnld,
         self.lnp, self.cond) = (stack([st[i] for st in states])
                                 for i in range(7))

    def _update_ft_device(self):
        self.ft = Finetunes(
            coal_time=jnp.asarray(self.ft_search["coal_time"].value,
                                  self.dtype),
            mig_time=jnp.asarray(self.ft_search["mig_time"].value,
                                 self.dtype),
            theta=jnp.asarray(self.ft_search["theta"].value, self.dtype),
            mig_rate=jnp.asarray(self.ft_search["mig_rate"].value,
                                 self.dtype),
            mixing=jnp.asarray(self.ft_search["mixing"].value, self.dtype),
            locus_rate=jnp.asarray(self.ft_search["locus_rate"].value,
                                   self.dtype),
            admix=jnp.asarray(self.ft_search["admix"].value, self.dtype),
            taus=jnp.asarray([t.value for t in self.ft_taus], self.dtype),
        )

    def _sample_mig_rates_device(self):
        """m ~ U[0.9, 1.1] * prior mean via the general stream
        (reference sampleMigRates, src/PopulationTree.c:414-433)."""
        B = self.tree.num_bands
        means = jnp.asarray(self.tree.mig_alpha / self.tree.mig_beta,
                            self.dtype)

        def draw(grng):
            rates = []
            for b in range(B):
                u, grng = R.general_draw_u(grng)
                rates.append(means[b] * (0.9 + 0.2 * u))
            return grng, (jnp.stack(rates).astype(self.dtype) if B
                          else jnp.zeros((0,), self.dtype))

        if self.chains > 1:
            self.grng, rates = jax.vmap(draw)(self.grng)
        else:
            self.grng, rates = draw(self.grng)
        if B:
            self.params = self.params._replace(mig_rate=rates)
        # refresh genealogy prior under the new rates
        if self.chains > 1:
            self.lnp = jax.vmap(
                lambda g, p: gen_log_prior(g, p, self.ctx))(
                self.gen, self.params)
        else:
            self.lnp = gen_log_prior(self.gen, self.params, self.ctx)

    def step(self, do_migrate: bool):
        cfg = self.cfg
        ft = self.ft
        sample_age_mask = tuple(bool(x) for x in self.tree.update_sample_age
                                [:self.tree.num_cur_pops])
        (self.gen, self.params, self.lrng, self.grng, self.lnld, self.lnp,
         self.cond, stats) = mcmc_iteration(
            self.gen, self.params, self.seq, self.lrng, self.grng, self.lnld,
            self.lnp, self.cond, ft, ctx=self.ctx,
            genetree_samples=cfg.mcmc.genetree_samples,
            do_migrate=do_migrate,
            do_mixing=cfg.mcmc.do_mixing,
            num_pops=self.tree.num_pops,
            num_cur_pops=self.tree.num_cur_pops,
            sample_age_mask=sample_age_mask,
            coal_time_on=self.ft_search["coal_time"].value > 0,
            mig_time_on=self.ft_search["mig_time"].value > 0,
            theta_on=self.ft_search["theta"].value > 0,
            mig_rate_on=self.ft_search["mig_rate"].value > 0,
            mixing_on=self.ft_search["mixing"].value > 0,
            var_rates=cfg.mcmc.mut_rate_mode == 1,
            locus_rate_on=self.ft_search["locus_rate"].value > 0,
            var_alpha=cfg.mcmc.var_rates_alpha,
            use_fused=self.use_fused and self.mesh is None,
            fused_interpret=self.fused_interpret,
        )
        self.rate_var += float(np.sum(np.asarray(stats.rate_var_delta))
                               / max(self.chains, 1))
        return stats

    def _sharded_fused_chunk(self, n_iters: int, do_migrate: bool,
                             sample_age_mask):
        """shard_map-wrapped fused chunk over the 'loci' mesh axis.

        Per-locus state shards; params/general-RNG/finetunes/context
        replicate; the only cross-shard traffic is the psum of
        sufficient-statistic totals, likelihood-delta sums, Jacobian
        counts and conflict/acceptance counters (~hundreds of bytes per
        iteration over ICI — SURVEY §5's communication inventory)."""
        cfg = self.cfg
        key = (n_iters, do_migrate, sample_age_mask,
               self.ft_search["coal_time"].value > 0,
               self.ft_search["mig_time"].value > 0,
               self.ft_search["theta"].value > 0,
               self.ft_search["mig_rate"].value > 0,
               self.ft_search["mixing"].value > 0,
               self.ft_search["locus_rate"].value > 0)
        if key in self._sharded_chunk_cache:
            return self._sharded_chunk_cache[key]
        from jax.sharding import PartitionSpec as P
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # newer JAX
            from jax import shard_map

        from gphocs_tpu.sampler.step import (ChunkTrace, StepStats,
                                             mcmc_chunk)

        lspec, rspec = P("loci"), P()

        def loci_specs(tree):
            # rank >= 1 leaves shard on their loci axis; rank-0 leaves
            # (the fast-RNG counter) replicate
            return jax.tree_util.tree_map(
                lambda x: lspec if jnp.ndim(x) >= 1 else rspec, tree)

        def rep_specs(tree):
            return jax.tree_util.tree_map(lambda x: rspec, tree)

        flags = dict(
            n_iters=n_iters,
            genetree_samples=cfg.mcmc.genetree_samples,
            do_migrate=do_migrate,
            do_mixing=cfg.mcmc.do_mixing,
            num_pops=self.tree.num_pops,
            num_cur_pops=self.tree.num_cur_pops,
            sample_age_mask=sample_age_mask,
            coal_time_on=self.ft_search["coal_time"].value > 0,
            mig_time_on=self.ft_search["mig_time"].value > 0,
            theta_on=self.ft_search["theta"].value > 0,
            mig_rate_on=self.ft_search["mig_rate"].value > 0,
            mixing_on=self.ft_search["mixing"].value > 0,
            var_rates=cfg.mcmc.mut_rate_mode == 1,
            locus_rate_on=self.ft_search["locus_rate"].value > 0,
            var_alpha=cfg.mcmc.var_rates_alpha,
            use_fused=True,
            loci_axis="loci",
            fused_interpret=self.fused_interpret,
        )

        def local_chunk(gen, params, seq, lrng, grng, lnld, lnp, cond,
                        ft, ctx):
            return mcmc_chunk.__wrapped__(
                gen, params, seq, lrng, grng, lnld, lnp, cond, ft,
                ctx=ctx, **flags)

        in_specs = (loci_specs(self.gen), rep_specs(self.params),
                    loci_specs(self.seq), loci_specs(self.lrng),
                    rep_specs(self.grng), lspec, lspec, lspec,
                    rep_specs(self.ft), rep_specs(self.ctx))
        # trace fields carry a leading iterations axis; admix_in2 is the
        # only per-locus one ([K, L, A] -> shard axis 1)
        trace_specs = ChunkTrace(**{
            f: (P(None, "loci") if f == "admix_in2" else rspec)
            for f in ChunkTrace._fields})
        out_specs = (loci_specs(self.gen), rep_specs(self.params),
                     loci_specs(self.lrng), rep_specs(self.grng),
                     lspec, lspec, lspec,
                     StepStats(*(rspec,) * len(StepStats._fields)),
                     trace_specs)
        fn = jax.jit(shard_map(local_chunk, mesh=self.mesh,
                               in_specs=in_specs, out_specs=out_specs,
                               check_rep=False))
        self._sharded_chunk_cache[key] = fn
        return fn

    def _sharded_bucketed_chunk(self, n_iters: int, do_migrate: bool,
                                sample_age_mask):
        """shard_map-wrapped bucketed chunk: buckets x mesh compose.

        Every bucket's per-locus state shards over the SAME 'loci' axis
        (each bucket padded to a mesh multiple at init); cross-bucket
        global decisions psum over the axis inside mcmc_chunk_buckets.
        The reference runs its one parallelism mode on exactly-ragged
        per-locus profiles unconditionally
        (src/AlignmentProcessor.h:25-31 + the omp loops) — this is the
        composition of its raggedness with its parallelism."""
        cfg = self.cfg
        key = ("buckets", n_iters, do_migrate, sample_age_mask)
        if key in self._sharded_chunk_cache:
            return self._sharded_chunk_cache[key]
        from jax.sharding import PartitionSpec as P
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # newer JAX
            from jax import shard_map

        from gphocs_tpu.sampler.bucketed import mcmc_chunk_buckets
        from gphocs_tpu.sampler.step import ChunkTrace, StepStats

        lspec, rspec = P("loci"), P()

        def lsp(tree):
            return jax.tree_util.tree_map(
                lambda x: lspec if jnp.ndim(x) >= 1 else rspec, tree)

        def rsp(tree):
            return jax.tree_util.tree_map(lambda x: rspec, tree)

        flags = dict(
            n_iters=n_iters,
            genetree_samples=cfg.mcmc.genetree_samples,
            do_migrate=do_migrate,
            do_mixing=cfg.mcmc.do_mixing
            and self.ft_search["mixing"].value > 0,
            num_pops=self.tree.num_pops,
            num_cur_pops=self.tree.num_cur_pops,
            sample_age_mask=sample_age_mask,
            var_rates=cfg.mcmc.mut_rate_mode == 1,
            var_alpha=cfg.mcmc.var_rates_alpha,
            use_fused=(self.bucket_fused if self.use_fused
                       else (False,) * self.buckets),
            fused_interpret=self.fused_interpret,
            loci_axis="loci",
        )

        def local(gens, params, seqs, lrngs, grng, lnlds, lnps, conds,
                  ft, ctx):
            return mcmc_chunk_buckets.__wrapped__(
                gens, params, seqs, lrngs, grng, lnlds, lnps, conds, ft,
                ctx=ctx, **flags)

        in_specs = (lsp(self.gens), rsp(self.params), lsp(self.seqs),
                    lsp(self.lrngs), rsp(self.grng), lsp(self.lnlds),
                    lsp(self.lnps), lsp(self.conds), rsp(self.ft),
                    rsp(self.ctx))
        out_specs = (lsp(self.gens), rsp(self.params), lsp(self.lrngs),
                     rsp(self.grng), lsp(self.lnlds), lsp(self.lnps),
                     lsp(self.conds),
                     StepStats(*(rspec,) * len(StepStats._fields)),
                     ChunkTrace(*(rspec,) * len(ChunkTrace._fields)))
        fn = jax.jit(shard_map(local, mesh=self.mesh,
                               in_specs=in_specs, out_specs=out_specs,
                               check_rep=False))
        self._sharded_chunk_cache[key] = fn
        return fn

    def step_chunk(self, n_iters: int, do_migrate: bool):
        """Run n_iters iterations in one compiled call."""
        cfg = self.cfg
        sample_age_mask = tuple(bool(x) for x in self.tree.update_sample_age
                                [:self.tree.num_cur_pops])
        if self.mesh is not None and self.use_fused and self.chains == 1 \
                and self.buckets == 1:
            fn = self._sharded_fused_chunk(n_iters, do_migrate,
                                           sample_age_mask)
            (self.gen, self.params, self.lrng, self.grng, self.lnld,
             self.lnp, self.cond, stats, trace) = fn(
                self.gen, self.params, self.seq, self.lrng, self.grng,
                self.lnld, self.lnp, self.cond, self.ft, self.ctx)
            self.rate_var += float(np.sum(np.asarray(stats.rate_var_delta)))
            return stats, trace
        if self.buckets > 1:
            if self.mesh is not None:
                fn = self._sharded_bucketed_chunk(n_iters, do_migrate,
                                                  sample_age_mask)
                (self.gens, self.params, self.lrngs, self.grng,
                 self.lnlds, self.lnps, self.conds, stats, trace) = fn(
                    self.gens, self.params, self.seqs, self.lrngs,
                    self.grng, self.lnlds, self.lnps, self.conds,
                    self.ft, self.ctx)
                self.lnld = jnp.concatenate(self.lnlds)
                self.lnp = jnp.concatenate(self.lnps)
                self.rate_var += float(np.sum(np.asarray(
                    stats.rate_var_delta)))
                return stats, trace
            from gphocs_tpu.sampler.bucketed import mcmc_chunk_buckets

            (self.gens, self.params, self.lrngs, self.grng, self.lnlds,
             self.lnps, self.conds, stats, trace) = mcmc_chunk_buckets(
                self.gens, self.params, self.seqs, self.lrngs, self.grng,
                self.lnlds, self.lnps, self.conds, self.ft, ctx=self.ctx,
                n_iters=n_iters,
                genetree_samples=cfg.mcmc.genetree_samples,
                do_migrate=do_migrate,
                do_mixing=cfg.mcmc.do_mixing
                and self.ft_search["mixing"].value > 0,
                num_pops=self.tree.num_pops,
                num_cur_pops=self.tree.num_cur_pops,
                sample_age_mask=sample_age_mask,
                var_rates=cfg.mcmc.mut_rate_mode == 1,
                var_alpha=cfg.mcmc.var_rates_alpha,
                use_fused=(self.bucket_fused if self.use_fused
                           else (False,) * self.buckets),
                fused_interpret=self.fused_interpret)
            self.lnld = jnp.concatenate(self.lnlds)
            self.lnp = jnp.concatenate(self.lnps)
            self.rate_var += float(np.sum(np.asarray(
                stats.rate_var_delta)))
            return stats, trace
        chunk_fn = mcmc_chunk_chains if self.chains > 1 else mcmc_chunk
        (self.gen, self.params, self.lrng, self.grng, self.lnld, self.lnp,
         self.cond, stats, trace) = chunk_fn(
            self.gen, self.params, self.seq, self.lrng, self.grng,
            self.lnld, self.lnp, self.cond, self.ft, ctx=self.ctx,
            n_iters=n_iters,
            genetree_samples=cfg.mcmc.genetree_samples,
            do_migrate=do_migrate,
            do_mixing=cfg.mcmc.do_mixing,
            num_pops=self.tree.num_pops,
            num_cur_pops=self.tree.num_cur_pops,
            sample_age_mask=sample_age_mask,
            coal_time_on=self.ft_search["coal_time"].value > 0,
            mig_time_on=self.ft_search["mig_time"].value > 0,
            theta_on=self.ft_search["theta"].value > 0,
            mig_rate_on=self.ft_search["mig_rate"].value > 0,
            mixing_on=self.ft_search["mixing"].value > 0,
            var_rates=cfg.mcmc.mut_rate_mode == 1,
            locus_rate_on=self.ft_search["locus_rate"].value > 0,
            var_alpha=cfg.mcmc.var_rates_alpha,
            # chains > 1 rides the SAME fused kernels as extra vmap batch
            # (Pallas prepends a grid axis), so --chains keeps production
            # speed (round-4 Weak #8)
            use_fused=(self.use_fused and self.mesh is None),
            fused_interpret=self.fused_interpret,
        )
        self.rate_var += float(np.sum(np.asarray(stats.rate_var_delta))
                               / max(self.chains, 1))
        return stats, trace

    def _log_header(self):
        """Reference stdout header (src/GPhoCS.c:1357-1374)."""
        tree = self.tree
        cols = ["Samples", "CoalTimes", "MigTimes", "SPRs", "Thetas",
                "MigRates"]
        if len(tree.admix_slot):
            cols.append("AdmxCoefs")
        for pop in range(tree.num_pops):
            if (pop >= tree.num_cur_pops
                    or tree.update_sample_age[pop]):
                cols.append(f"TAU_{pop:2d}")
        cols += ["RbberBnd", "MutRates", "Mixing"]
        line = "".join(f"{c:<10}" for c in cols)
        return line + "| DATA-ln-ld |  TIME\n" + "-" * (len(line) + 25)

    def _log_line(self, iteration, pct, lnld_avg, elapsed):
        """Reference per-log acceptance row (src/GPhoCS.c:1823-1895)."""
        tree = self.tree
        parts = [f"{iteration + 1:7d}  "]
        for key in ("coal_time", "mig_time", "spr", "theta", "mig_rate"):
            parts.append(f"{pct[key]:5.1f}%    ")
        if len(tree.admix_slot):
            parts.append(f"{pct.get('admix', 0.0):5.1f}%    ")
        for pop in range(tree.num_pops):
            if (pop >= tree.num_cur_pops
                    or tree.update_sample_age[pop]):
                parts.append(f"{pct['taus'][pop]:5.1f}%    ")
        parts.append(f"{pct.get('rubberband', 0.0):6.1f}%    ")
        parts.append(f"{pct.get('locus_rate', 0.0):5.1f}%    ")
        parts.append(f"{pct['mixing']:5.1f}%    ")
        h, rem = divmod(int(elapsed), 3600)
        m, sec = divmod(rem, 60)
        parts.append(f"|{lnld_avg:12.6f}| {h:02d}:{m:02d}:{sec:02d}")
        return "".join(parts)

    def run(self, trace_path: Optional[str] = None,
            progress: bool = False,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: int = 0,
            resume: bool = False,
            debug_check: bool = False):
        """Full MCMC per the control file.  Returns the trace as
        (header_cols, numpy array).

        checkpoint_path/_every: periodically serialize the full sampler
        state; resume=True restores it and continues bit-identically.
        progress=True prints the reference-format acceptance log
        (header + one row per iterations-per-log block,
        src/GPhoCS.c:1357-1895).  debug_check=True runs the checkAll
        analogue (structural + carried-likelihood invariants,
        gphocs_tpu/debugcheck.py) at every log point, mirroring the
        reference's per-log checkAll() gate (src/GPhoCS.c:1814-1821)."""
        cfg = self.cfg
        self.initialize()
        resume_iteration = None
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            from gphocs_tpu.checkpoint import load_checkpoint

            resume_iteration = load_checkpoint(self, checkpoint_path)
        tree = self.tree
        P = tree.num_pops
        L = self.num_loci
        S = tree.num_samples
        total_coals = L * (S - 1)
        var_mut = cfg.mcmc.mut_rate_mode == 1

        header = trace_io.trace_header(tree, var_mut)
        factors = trace_io.print_factors(tree, var_mut)
        rows = []
        tf = open(trace_path, "w") if trace_path else None
        if tf:
            tf.write(header + "\n")

        cs_file = None
        if cfg.mcmc.coal_stats_file != "NONE":
            from gphocs_tpu.tools.coalstats_out import coal_stats_header

            nparts = max(cfg.mcmc.num_pop_partitions, 1)
            cs_file = open(cfg.mcmc.coal_stats_file, "w")
            cs_file.write(coal_stats_header(tree, nparts) + "\n")

        self._chain_traces = []
        admix_acc = None
        admix_count = 0
        counts = AcceptCounts()
        counts.reset(P)
        log_count = 0
        mig_nodes_accum = 0
        finding = cfg.mcmc.find_finetunes
        spl = (cfg.mcmc.find_finetunes_samples_per_step if finding
               else cfg.mcmc.iterations_per_log)
        t0 = time.time()
        if progress:
            print(self._log_header(), file=sys.stderr)

        it_start = -cfg.mcmc.burn_in
        iteration = it_start
        if resume_iteration is not None:
            iteration = resume_iteration
        while iteration < cfg.mcmc.mcmc_iterations:
            # chunk until the next boundary: a log point, the start-mig
            # switch (migration-rate sampling + update gating change), or
            # the end of the run
            next_log = ((iteration + 1 + spl - 1) // spl) * spl \
                if spl > 0 else cfg.mcmc.mcmc_iterations
            boundaries = [next_log, cfg.mcmc.mcmc_iterations]
            if iteration <= cfg.mcmc.start_mig:
                boundaries.append(cfg.mcmc.start_mig + 1)
            end = max(min(boundaries), iteration + 1)
            n_iters = end - iteration
            # quantize chunk lengths to limit recompilation: every distinct
            # n_iters compiles its own scan executable
            if n_iters > 64:
                n_iters = 64 * (n_iters // 64)
                end = iteration + n_iters
            st, tr = self.step_chunk(
                n_iters, do_migrate=iteration > cfg.mcmc.start_mig)
            if self.chains > 1:
                st = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), st)
                self._chain_traces.append(
                    jax.tree_util.tree_map(np.asarray, tr))
                tr = jax.tree_util.tree_map(lambda a: a[0], tr)

            counts.coal_time += int(st.acc_coal_time)
            counts.mig_time += int(st.acc_mig_time)
            counts.spr += int(st.acc_spr)
            counts.theta += int(st.acc_theta)
            counts.mig_rate += int(st.acc_mig_rate)
            counts.taus += np.asarray(st.acc_taus)
            counts.mixing += int(st.acc_mixing)
            counts.locus_rate += int(st.acc_locus_rate)
            counts.admix += int(st.acc_admix)
            counts.conflicts += int(st.tau_conflicts)
            mig_nodes_accum += int(st.num_migs_total)
            log_count += n_iters

            tr_np = jax.tree_util.tree_map(np.asarray, tr)
            for j in range(n_iters):
                it = iteration + j
                if it >= 0 and it % (cfg.mcmc.mcmc_sample_skip + 1) == 0:
                    lnld_sum = float(tr_np.lnld_sum[j])
                    lnp_sum = float(tr_np.lnp_sum[j])
                    full = (lnld_sum + lnp_sum) / L
                    vals = trace_io.record_param_vals(
                        tree, tr_np.theta[j], tr_np.tau[j],
                        tr_np.sample_age[j], tr_np.mig_rate[j],
                        self.rate_var if var_mut else None,
                        tr_np.admix_coeff[j]
                        if len(tree.admix_slot) else None)
                    row = trace_io.format_row(it, vals, factors, full,
                                              lnld_sum)
                    rows.append([it] + [v * f for v, f in
                                        zip(vals, factors)]
                                + [full, lnld_sum])
                    if tf:
                        tf.write(row + "\n")
            if tf:
                tf.flush()
            if len(tree.admix_slot) and self.chains == 1 \
                    and tr_np.admix_in2.size:
                # running per-(sample, locus) admixture assignment means
                # (reference src/GPhoCS.c:775-790)
                sel = [j for j in range(n_iters) if iteration + j >= 0]
                if sel:
                    if admix_acc is None:
                        admix_acc = np.zeros(tr_np.admix_in2.shape[1:],
                                             np.float64)
                    admix_acc += tr_np.admix_in2[sel].sum(axis=0)
                    admix_count += len(sel)

            iteration = end
            if iteration == cfg.mcmc.start_mig + 1:
                self._sample_mig_rates_device()

            if iteration % spl == 0:
                if admix_count and trace_path:
                    # admixture-trace.out twin (reference
                    # src/GPhoCS.c:1781-1805): one overwritten row —
                    # iteration, then the running admixture-rate mean per
                    # (admixed sample, locus), sample-major
                    apath = os.path.join(
                        os.path.dirname(trace_path) or ".",
                        "admixture-trace.out")
                    with open(apath, "w") as af:
                        af.write(str(iteration - 1))
                        for a_ in range(admix_acc.shape[1]):
                            for l_ in range(admix_acc.shape[0]):
                                af.write("\t%f" % (
                                    admix_acc[l_, a_] / admix_count))
                        af.write("\n")
                pct = self._percents(counts, log_count, total_coals,
                                     mig_nodes_accum)
                if progress:
                    lnld_avg = (float(tr_np.lnld_sum[-1])
                                + float(tr_np.lnp_sum[-1])) / L
                    print(self._log_line(iteration - 1, pct, lnld_avg,
                                         time.time() - t0),
                          file=sys.stderr)
                if debug_check:
                    # checkAll-analogue gate (reference src/GPhoCS.c:1814)
                    from gphocs_tpu.debugcheck import (check_gen_state,
                                                       check_likelihoods)

                    if self.buckets > 1:
                        errs = []
                        for bk, g in enumerate(self.gens):
                            errs += [f"bucket {bk}: {e}" for e in
                                     check_gen_state(g, self.params,
                                                     self.tree)]
                    elif self.chains > 1:
                        errs = []
                        pick = lambda t, c: jax.tree_util.tree_map(  # noqa
                            lambda a: a[c], t)
                        for c in range(self.chains):
                            errs += [f"chain {c}: {e}" for e in
                                     check_gen_state(
                                         pick(self.gen, c),
                                         pick(self.params, c), self.tree)]
                    else:
                        errs = check_gen_state(self.gen, self.params,
                                               self.tree)
                    errs += check_likelihoods(self)
                    if errs:
                        raise AssertionError(
                            "state inconsistency at iteration "
                            f"{iteration}: " + "; ".join(errs[:10]))
                if finding:
                    self._adjust_finetunes(pct)
                    if (iteration >= cfg.mcmc.find_finetunes_num_steps
                            * cfg.mcmc.find_finetunes_samples_per_step):
                        finding = False
                        spl = cfg.mcmc.iterations_per_log
                counts.reset(P)
                log_count = 0
                mig_nodes_accum = 0

            if cs_file is not None:
                from gphocs_tpu.tools.coalstats_out import write_coal_stats_row

                write_coal_stats_row(cs_file, iteration - 1, self.gen,
                                     self.params, self.ctx, tree, nparts)

            if (checkpoint_path and checkpoint_every > 0
                    and iteration % checkpoint_every == 0):
                from gphocs_tpu.checkpoint import save_checkpoint

                save_checkpoint(self, checkpoint_path, iteration)

        if checkpoint_path:
            from gphocs_tpu.checkpoint import save_checkpoint

            save_checkpoint(self, checkpoint_path, iteration)
        if cs_file is not None:
            cs_file.close()
        if tf:
            tf.close()
        if self.verbose:
            # reference printMethodTimes analogue (src/utils.c:233-326);
            # per-kernel isolation timings — on remote TPU backends each
            # carries per-call dispatch overhead, so treat as relative
            from gphocs_tpu.profiling import print_kernel_times

            print("method times (isolated, reference printMethodTimes "
                  "analogue):", file=sys.stderr)
            try:
                print_kernel_times(self)
            except Exception as exc:  # profiling must never kill a run
                print(f"  (unavailable: {exc})", file=sys.stderr)
        cols = header.split("\t")
        return cols, np.asarray(rows)

    def _percents(self, c: AcceptCounts, log_count, total_coals,
                  mig_nodes_accum):
        cfg = self.cfg
        gts = max(cfg.mcmc.genetree_samples, 1)
        P = self.tree.num_pops
        B = self.tree.num_bands
        A = len(self.tree.admix_slot)
        L = max(self.num_loci - self.pad_loci, 2)
        lc = max(log_count, 1)
        n_anc = max(self.tree.num_pops - self.tree.num_cur_pops, 1)
        return {
            "coal_time": c.coal_time * 100.0 / (lc * total_coals * gts),
            "mig_time": c.mig_time * 100.0 / (mig_nodes_accum + 1e-6),
            "spr": c.spr * 100.0 / (lc * 2 * total_coals * gts),
            "theta": c.theta * 100.0 / (lc * P),
            "mig_rate": c.mig_rate * 100.0 / (lc * B + 1e-6),
            "taus": c.taus * 100.0 / lc,
            "mixing": c.mixing * 100.0 / lc,
            "rubberband": c.conflicts * 100.0 / (lc * n_anc),
            # reference: accepted / (logCount * (numLoci-1) * genetreeSamples)
            # (src/GPhoCS.c:1842-1846) and / (logCount * #admixed) (:1848)
            "locus_rate": c.locus_rate * 100.0 / (lc * (L - 1) * gts),
            "admix": (c.admix * 100.0 / (lc * A)) if A else 0.0,
        }

    def _adjust_finetunes(self, pct):
        self.ft_search["coal_time"].adjust(pct["coal_time"])
        self.ft_search["mig_time"].adjust(pct["mig_time"])
        self.ft_search["theta"].adjust(pct["theta"])
        self.ft_search["mig_rate"].adjust(pct["mig_rate"])
        self.ft_search["mixing"].adjust(pct["mixing"])
        # locus-rate / admixture finetunes (reference src/GPhoCS.c:2163-2185)
        if self.cfg.mcmc.mut_rate_mode == 1:
            self.ft_search["locus_rate"].adjust(pct["locus_rate"])
        if len(self.tree.admix_slot):
            self.ft_search["admix"].adjust(pct.get("admix", 0.0))
        for p in range(self.tree.num_cur_pops, self.tree.num_pops):
            self.ft_taus[p].adjust(pct["taus"][p])
        # tau finetunes of current pops with estimated sample ages
        # (reference adjusts every taus[pop] entry, src/GPhoCS.c:2150-2190)
        for p in range(self.tree.num_cur_pops):
            if self.tree.update_sample_age[p]:
                self.ft_taus[p].adjust(pct["taus"][p])
        self._update_ft_device()
