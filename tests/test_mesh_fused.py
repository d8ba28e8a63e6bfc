"""Fused production kernels under the loci mesh (shard_map).

The round-3 fast path could not shard at all (use_fused required
mesh=None).  These tests run the fused kernels (interpret mode — the
Pallas TPU kernels' semantics twin on CPU) inside shard_map over a
4-device virtual mesh:

* the node-age sweep consumes per-lane fixed RNG offsets, so its result
  must be BIT-IDENTICAL however the loci are sharded;
* a full fused mcmc_chunk under the mesh must execute, psum its global
  decisions identically on every shard, and keep the checkAll
  invariants (the SPR walk's per-tile draw synchronization makes the
  full chunk statistically — not bitwise — equivalent to unsharded;
  docs/DESIGN.md round 4).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler
from tests.test_control import SAMPLE_CTL


@pytest.fixture(scope="module", autouse=True)
def _no_cache_writes():
    """Serializing the (interpret-mode, very large) fused shard_map
    executables into the persistent compilation cache aborts jaxlib
    (oversized zstd/protobuf serialize); raise the persistence
    thresholds for this module so nothing qualifies for a cache write."""
    saved = (jax.config.jax_persistent_cache_min_entry_size_bytes,
             jax.config.jax_persistent_cache_min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 1 << 62)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", saved[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", saved[1])


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree

    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    path = str(tmp_path_factory.mktemp("meshfused") / "seqs.txt")
    simulate_seq_file(cfg, tree, path, num_loci=16, seq_len=200, seed=23)
    return path


def _fused_sampler(path, mesh=None):
    os.environ["GPHOCS_FUSED_INTERPRET"] = "1"
    try:
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = 77
        cfg.mcmc.start_mig = 0
        s = Sampler(cfg, seq_path=path, dtype=jnp.float32, rng_mode="fast",
                    mesh=mesh)
        assert s.use_fused
        s.initialize()
        s._sample_mig_rates_device()
    finally:
        os.environ.pop("GPHOCS_FUSED_INTERPRET", None)
    return s


def test_node_age_sweep_shard_map_bitwise(data_file):
    """Sharded fused node-age sweep == unsharded, bit for bit."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:
        from jax import shard_map
    from gphocs_tpu.ops.sweeps_pallas import node_age_sweep_pallas
    from gphocs_tpu.parallel.mesh import make_mesh

    s = _fused_sampler(data_file)
    mesh = make_mesh(jax.devices()[:4])

    ref = node_age_sweep_pallas(s.gen, s.params, s.seq, s.lrng, s.ctx,
                                s.ft.coal_time, s.lnld, s.lnp, s.cond,
                                tile=8, interpret=True)

    lspec, rspec = P("loci"), P()

    def lsp(tree):
        return jax.tree_util.tree_map(
            lambda x: lspec if jnp.ndim(x) >= 1 else rspec, tree)

    def rsp(tree):
        return jax.tree_util.tree_map(lambda x: rspec, tree)

    def local(gen, params, seq, lrng, lnld, lnp, cond, ft, ctx):
        return node_age_sweep_pallas(gen, params, seq, lrng, ctx, ft,
                                     lnld, lnp, cond, tile=8,
                                     interpret=True)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(lsp(s.gen), rsp(s.params), lsp(s.seq), lsp(s.lrng),
                  lspec, lspec, lspec, rspec, rsp(s.ctx)),
        out_specs=(lsp(s.gen), lsp(s.lrng), lspec, lspec, lspec, rspec),
        check_rep=False)
    # acc is a shard-local sum -> returned per-shard; compare summed
    out = fn(s.gen, s.params, s.seq, s.lrng, s.lnld, s.lnp, s.cond,
             s.ft.coal_time, s.ctx)

    np.testing.assert_array_equal(np.asarray(ref[0].age),
                                  np.asarray(out[0].age))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(out[2]))
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(out[3]))
    np.testing.assert_array_equal(np.asarray(ref[4]), np.asarray(out[4]))
    assert int(ref[1].ctr) == int(out[1].ctr)


def test_fused_chunk_under_mesh_runs_and_invariants(data_file):
    """Full production chunk under the 4-device mesh: executes, global
    decisions replicate, invariants hold, trace is finite."""
    from gphocs_tpu.debugcheck import check_gen_state, check_likelihoods
    from gphocs_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:4])
    s = _fused_sampler(data_file, mesh=mesh)
    stats, trace = s.step_chunk(6, do_migrate=True)
    assert np.isfinite(np.asarray(s.lnld)).all()
    assert np.isfinite(np.asarray(trace.lnld_sum)).all()
    assert int(stats.acc_coal_time) > 0
    errs = check_gen_state(s.gen, s.params, s.tree, atol=1e-6)
    assert not errs, errs[:5]
    # carried vs freshly-recomputed likelihoods at the f32 drift scale
    assert check_likelihoods(s, atol=3e-3) == []


def test_tau_decisions_sharded_equal_unsharded(data_file):
    """The tau/sample-age rubber-band MH decision is GLOBAL: Jacobian
    counts (ntj0/ntj1) and the conflict flag must all-reduce over the
    loci axis before the accept draw.  Run many tau sweeps sharded vs
    unsharded and assert (a) every shard carries the IDENTICAL tau vector
    (exposed via a loci-sharded broadcast copy, since check_rep=False
    would otherwise mask divergence), and (b) it equals the unsharded
    run bit for bit.  Regression test for the round-4 advisor finding."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:
        from jax import shard_map
    from gphocs_tpu.kernels.tau import update_taus
    from gphocs_tpu.parallel.mesh import make_mesh

    s = _fused_sampler(data_file)
    # seed some migration events so conflict paths can trigger
    for _ in range(2):
        s.step(do_migrate=True)
    mesh = make_mesh(jax.devices()[:4])
    n_sweeps = 12

    def sweeps(gen, params, seq, grng, lnld, lnp, cond, ft_taus, ctx,
               loci_axis):
        accs = []
        for _ in range(n_sweeps):
            gen, params, grng, lnld, lnp, cond, acc, conf = update_taus(
                gen, params, seq, grng, ctx, ft_taus, lnld, lnp, cond,
                s.tree.num_pops, s.tree.num_cur_pops, loci_axis=loci_axis)
            accs.append(acc)
        return gen, params, grng, lnld, lnp, cond, jnp.stack(accs)

    ref = jax.jit(lambda *a: sweeps(*a, loci_axis=None))(
        s.gen, s.params, s.seq, s.grng, s.lnld, s.lnp, s.cond,
        s.ft.taus, s.ctx)

    lspec, rspec = P("loci"), P()

    def lsp(tree):
        return jax.tree_util.tree_map(
            lambda x: lspec if jnp.ndim(x) >= 1 else rspec, tree)

    def rsp(tree):
        return jax.tree_util.tree_map(lambda x: rspec, tree)

    def local(gen, params, seq, grng, lnld, lnp, cond, ft_taus, ctx):
        out = sweeps(gen, params, seq, grng, lnld, lnp, cond, ft_taus,
                     ctx, loci_axis="loci")
        gen, params, grng, lnld, lnp, cond, accs = out
        # per-shard copy of the nominally-replicated tau vector: sharded
        # output -> one row per shard, so divergence is visible
        tau_copies = jnp.broadcast_to(params.tau[None, :],
                                      (1, params.tau.shape[0]))
        return gen, params, grng, lnld, lnp, cond, accs, tau_copies

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(lsp(s.gen), rsp(s.params), lsp(s.seq), rsp(s.grng),
                  lspec, lspec, lspec, rspec, rsp(s.ctx)),
        out_specs=(lsp(s.gen), rsp(s.params), rsp(s.grng), lspec, lspec,
                   lspec, rspec, lspec),
        check_rep=False))
    out = fn(s.gen, s.params, s.seq, s.grng, s.lnld, s.lnp, s.cond,
             s.ft.taus, s.ctx)
    (gen_s, params_s, grng_s, lnld_s, lnp_s, cond_s, accs_s,
     tau_copies) = out

    # (a) every shard committed the same taus
    tau_rows = np.asarray(tau_copies)
    for row in tau_rows[1:]:
        np.testing.assert_array_equal(tau_rows[0], row)
    # (b) bit-identical to the unsharded run: params, per-locus state,
    # acceptance history, and the general RNG stream position
    np.testing.assert_array_equal(np.asarray(ref[1].tau),
                                  np.asarray(params_s.tau))
    np.testing.assert_array_equal(np.asarray(ref[0].age),
                                  np.asarray(gen_s.age))
    np.testing.assert_array_equal(np.asarray(ref[6]), np.asarray(accs_s))
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(lnld_s))
    r0, r1 = ref[2], grng_s
    for f in r0._fields:
        np.testing.assert_array_equal(np.asarray(getattr(r0, f)),
                                      np.asarray(getattr(r1, f)))
    # the sweeps actually decided something (accepts occurred)
    assert int(np.asarray(ref[6]).sum()) > 0


def test_buckets_times_mesh_matches_single_device(data_file):
    """buckets x mesh (round-4 Missing #3): a bucketed run under the
    4-device loci mesh equals the single-device bucketed run.  XLA
    kernels + fast RNG here (per-locus streams are position-independent,
    and all global decisions psum), so agreement is to f64 psum-
    association tolerance; invariants and trace finiteness hold."""
    import numpy as np

    from gphocs_tpu.debugcheck import check_gen_state
    from gphocs_tpu.parallel.mesh import make_mesh

    def build(mesh):
        os.environ["GPHOCS_FUSED"] = "0"  # XLA kernels: no tile-sync skew
        try:
            cfg = parse_control_text(SAMPLE_CTL)
            cfg.mcmc.random_seed = 31
            cfg.mcmc.start_mig = 0
            s = Sampler(cfg, seq_path=data_file, dtype=jnp.float64,
                        rng_mode="fast", buckets=3, mesh=mesh)
            s.initialize()
        finally:
            os.environ.pop("GPHOCS_FUSED", None)
        return s

    s1 = build(None)
    sm = build(make_mesh(jax.devices()[:4]))
    assert sm.buckets == s1.buckets

    st1, tr1 = s1.step_chunk(3, do_migrate=True)
    stm, trm = sm.step_chunk(3, do_migrate=True)

    np.testing.assert_allclose(np.asarray(s1.params.theta),
                               np.asarray(sm.params.theta), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s1.params.tau),
                               np.asarray(sm.params.tau), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(tr1.lnld_sum),
                               np.asarray(trm.lnld_sum), rtol=1e-9)
    # per-bucket per-locus state: identical decisions -> identical ages
    for k in range(s1.buckets):
        a1 = np.asarray(s1.gens[k].age)
        am = np.asarray(sm.gens[k].age)[:a1.shape[0]]  # mesh pads tails
        np.testing.assert_allclose(a1, am, rtol=1e-9, atol=1e-12)
        errs = check_gen_state(
            jax.tree_util.tree_map(np.asarray, sm.gens[k]),
            sm.params, sm.tree, atol=1e-8)
        assert not errs, (k, errs[:3])
    assert int(stm.acc_coal_time) == int(st1.acc_coal_time)
