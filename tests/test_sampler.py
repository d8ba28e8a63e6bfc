"""End-to-end sampler tests: invariants after iterations, with and without
migration, plus prior-recovery sanity."""

import numpy as np
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.debugcheck import check_gen_state, check_likelihoods
from gphocs_tpu.io.simulate import simulate_seq_file
from gphocs_tpu.model import build_poptree
from gphocs_tpu.sampler.driver import Sampler

from tests.test_control import SAMPLE_CTL


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    path = tmp_path_factory.mktemp("seqs") / "seqs.txt"
    simulate_seq_file(cfg, tree, str(path), num_loci=12, seq_len=120, seed=5)
    return str(path)


def _make_sampler(data_file, **mcmc_kw):
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 99
    for k, v in mcmc_kw.items():
        setattr(cfg.mcmc, k, v)
    return Sampler(cfg, seq_path=data_file)


def test_invariants_after_iterations(data_file):
    s = _make_sampler(data_file, mcmc_iterations=6, start_mig=1)
    s.run()
    errs = check_gen_state(s.gen, s.params, s.tree)
    assert not errs, "\n".join(errs[:10])
    errs = check_likelihoods(s)
    assert not errs, "\n".join(errs)


def test_migration_events_appear(data_file):
    """With a migration band and sampled rates, SPR should eventually
    introduce migration events, and the state should stay consistent."""
    s = _make_sampler(data_file, mcmc_iterations=40, start_mig=0)
    s.run()
    errs = check_gen_state(s.gen, s.params, s.tree)
    assert not errs, "\n".join(errs[:10])
    errs = check_likelihoods(s)
    assert not errs, "\n".join(errs)
    assert float(np.asarray(s.params.mig_rate)[0]) > 0.0


def test_trace_shape_and_finiteness(data_file):
    s = _make_sampler(data_file, mcmc_iterations=10)
    cols, rows = s.run()
    # 11 params + Sample + 2 likelihood columns
    assert len(cols) == 14
    assert rows.shape == (10, 14)
    assert np.isfinite(rows).all()
    # thetas are positive and scaled by the 10000 print factor
    assert (rows[:, 1:8] > 0).all()


def test_acceptance_rates_nontrivial(data_file):
    s = _make_sampler(data_file, mcmc_iterations=15)
    s.initialize()
    tot_ct = tot_spr = 0
    for i in range(15):
        st = s.step(do_migrate=True)
        tot_ct += int(st.acc_coal_time)
        tot_spr += int(st.acc_spr)
    assert tot_ct > 0, "no coal-time proposals accepted in 15 iterations"
    assert tot_spr > 0, "no SPR proposals accepted in 15 iterations"


def test_checkpoint_resume_bitexact(data_file, tmp_path):
    """A resumed run must continue bit-identically to an uninterrupted one."""
    ckpt = str(tmp_path / "state.npz")
    s1 = _make_sampler(data_file, mcmc_iterations=8)
    cols1, rows1 = s1.run()

    s2 = _make_sampler(data_file, mcmc_iterations=4)
    s2.run(checkpoint_path=ckpt)
    s3 = _make_sampler(data_file, mcmc_iterations=8)
    cols3, rows3 = s3.run(checkpoint_path=ckpt, resume=True)

    np.testing.assert_array_equal(rows1[4:], rows3[rows3[:, 0] >= 4])


def test_admixture_end_to_end(tmp_path):
    """Admixed sample (name in two pops): coefficients update, assignments
    flip through SPR, trace gains an A column, state stays consistent."""
    from tests.test_control import SAMPLE_CTL
    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.io.simulate import simulate_seq_file

    ctl = SAMPLE_CTL.replace(
        "GENERAL-INFO-END", "admixture TRUE\nfinetune-admix 0.05\nGENERAL-INFO-END"
    ).replace("samples\t\ttwo d", "samples\t\ttwo d one d")
    cfg = parse_control_text(ctl)
    assert cfg.admixed == [("one", 0, 1, "d")]
    # data simulated from the non-admixed model is fine for a smoke test
    base_cfg = parse_control_text(SAMPLE_CTL)
    tree0 = build_poptree(base_cfg)
    path = str(tmp_path / "seqs.txt")
    simulate_seq_file(base_cfg, tree0, path, num_loci=10, seq_len=100, seed=3)

    cfg.mcmc.random_seed = 5
    cfg.mcmc.mcmc_iterations = 10
    cfg.mcmc.iterations_per_log = 5
    s = Sampler(cfg, seq_path=path)
    cols, rows = s.run(trace_path=str(tmp_path / "mcmc.out"))
    assert any(c.startswith("A0[") or c.startswith("A1[") for c in cols), cols
    # admixture-trace.out twin (reference src/GPhoCS.c:1781-1805): one
    # row, iteration + per-(sample, locus) running assignment means
    atrace = tmp_path / "admixture-trace.out"
    assert atrace.exists()
    vals = atrace.read_text().split()
    # iteration + (2 haploid slots of the admixed diploid) x 10 loci
    assert len(vals) == 1 + len(s.tree.admix_slot) * 10
    assert all(0.0 <= float(v) <= 1.0 for v in vals[1:])
    # coefficient stays in (0,1)
    acol = [i for i, c in enumerate(cols) if c.startswith("A")][0]
    assert ((rows[:, acol] > 0) & (rows[:, acol] < 1)).all()
    errs = check_gen_state(s.gen, s.params, s.tree)
    assert not errs, "\n".join(errs[:5])
    errs = check_likelihoods(s)
    assert not errs, "\n".join(errs)


from tests.test_control import SAMPLE_CTL  # noqa: E402
from gphocs_tpu.config import parse_control_text  # noqa: E402


def test_mesh_sharded_run_matches_single_device(data_file):
    """A mesh-sharded run over 8 CPU devices must produce finite traces and
    consistent state; with exact locus multiples it must equal the
    unsharded run bit-for-bit (same program, different partitioning)."""
    import jax
    from gphocs_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:4])
    s1 = _make_sampler(data_file, mcmc_iterations=6)
    cols1, rows1 = s1.run()

    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 99
    cfg.mcmc.mcmc_iterations = 6
    s2 = Sampler(cfg, seq_path=data_file, mesh=mesh)
    cols2, rows2 = s2.run()
    assert np.isfinite(rows2).all()
    # 12 loci over 4 devices divides evenly: identical math
    np.testing.assert_allclose(rows1, rows2, rtol=1e-9)
    errs = check_gen_state(s2.gen, s2.params, s2.tree)
    assert not errs, "\n".join(errs[:5])


def test_var_locus_rates_end_to_end(data_file):
    """VAR mutation-rate mode: rates update, preserve mean 1, trace gains
    the Variance-Mut column."""
    s = _make_sampler(data_file, mcmc_iterations=8, mut_rate_mode=1,
                      var_rates_alpha=1.0)
    s.cfg.mcmc.finetunes.locus_rate = 0.3
    cols, rows = s.run()
    assert "Variance-Mut" in cols
    rates = np.asarray(s.gen.mut_rate)
    np.testing.assert_allclose(rates.mean(), 1.0, rtol=1e-9)
    assert rates.std() > 0
    errs = check_likelihoods(s)
    assert not errs, "\n".join(errs)


def test_fixed_locus_rates(data_file, tmp_path):
    rfile = tmp_path / "rates.txt"
    r = np.random.RandomState(0).uniform(0.5, 1.5, 12)
    rfile.write_text(" ".join(f"{x:.6f}" for x in r))
    s = _make_sampler(data_file, mcmc_iterations=3, mut_rate_mode=2,
                      rate_file=str(rfile))
    s.run()
    rates = np.asarray(s.gen.mut_rate)
    np.testing.assert_allclose(rates.mean(), 1.0, rtol=1e-9)
    r6 = np.loadtxt(str(rfile))  # written at 6 decimals
    np.testing.assert_allclose(rates, r6 / r6.mean(), rtol=1e-9)


def test_multi_chain_run(data_file):
    """4 vmapped chains: distinct trajectories, valid per-chain state,
    R-hat computable."""
    import jax
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 77
    cfg.mcmc.mcmc_iterations = 6
    s = Sampler(cfg, seq_path=data_file, chains=4)
    cols, rows = s.run()
    assert np.isfinite(rows).all()
    # chains produced distinct thetas
    th = np.asarray(s.params.theta)
    assert th.shape[0] == 4
    assert len({round(float(x), 12) for x in th[:, 0]}) > 1
    # per-chain states are structurally valid
    from gphocs_tpu.state import GenState
    g0 = GenState(*[np.asarray(x)[0] for x in s.gen])
    from gphocs_tpu.state import Params as Pr
    p0 = Pr(*[np.asarray(x)[0] for x in s.params])
    errs = check_gen_state(g0, p0, s.tree)
    assert not errs, "\n".join(errs[:5])


def test_debugcheck_vectorized_matches_slow_oracle(data_file):
    """The vectorized checkAll analogue must flag exactly the loci the
    per-locus loop oracle flags — on a clean state (no errors) and on
    deliberately corrupted states (each corruption class detected)."""
    import jax.numpy as jnp
    from gphocs_tpu.debugcheck import check_gen_state, check_gen_state_slow

    s = _make_sampler(data_file, mcmc_iterations=5)
    s.run()
    assert check_gen_state(s.gen, s.params, s.tree) == []
    assert check_gen_state_slow(s.gen, s.params, s.tree) == []

    def loci_of(errs):
        out = set()
        for e in errs:
            if e.startswith("locus "):
                out.add(int(e.split()[1].rstrip(":")))
        return out

    # corruption 1: break a father link
    g = s.gen._replace(father=s.gen.father.at[3, -1].set(0))
    v_loci = loci_of(check_gen_state(g, s.params, s.tree))
    o_loci = loci_of(check_gen_state_slow(g, s.params, s.tree))
    assert 3 in v_loci and v_loci == o_loci

    # corruption 2: age below a son's age
    S = s.tree.num_samples
    g = s.gen._replace(age=s.gen.age.at[5, S].set(-1.0))
    v = check_gen_state(g, s.params, s.tree)
    o = check_gen_state_slow(g, s.params, s.tree)
    assert 5 in loci_of(v) and 5 in loci_of(o)

    # corruption 3: leaf age != sample age
    g = s.gen._replace(age=s.gen.age.at[7, 0].set(0.125))
    assert 7 in loci_of(check_gen_state(g, s.params, s.tree))
    assert 7 in loci_of(check_gen_state_slow(g, s.params, s.tree))

    # corruption 4: migration event pushed outside its band window
    mbr = np.asarray(s.gen.mig_branch)
    live = np.argwhere(mbr >= 0)
    if len(live):
        l, m = live[0]
        g = s.gen._replace(mig_age=s.gen.mig_age.at[int(l), int(m)]
                           .set(999.0))
        assert int(l) in loci_of(check_gen_state(g, s.params, s.tree))
        assert int(l) in loci_of(check_gen_state_slow(g, s.params, s.tree))


def test_multi_chain_fused_matches_single_runs(data_file):
    """--chains keeps the fused production path (round-4 Weak #8): a
    2-chain fused run (Pallas kernels vmapped over the chains axis) is
    BIT-IDENTICAL per chain to two independent single-chain fused runs
    with the per-chain seeds (base + 7919*c)."""
    import os

    import jax.numpy as jnp

    os.environ["GPHOCS_FUSED_INTERPRET"] = "1"
    try:
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = 900
        cfg.mcmc.start_mig = 0
        s2 = Sampler(cfg, seq_path=data_file, dtype=jnp.float32,
                     rng_mode="fast", chains=2)
        assert s2.use_fused
        s2.initialize()
        s2.step_chunk(3, do_migrate=True)

        singles = []
        for c in range(2):
            cfg1 = parse_control_text(SAMPLE_CTL)
            cfg1.mcmc.random_seed = 900 + 7919 * c
            cfg1.mcmc.start_mig = 0
            s1 = Sampler(cfg1, seq_path=data_file, dtype=jnp.float32,
                         rng_mode="fast")
            assert s1.use_fused
            s1.initialize()
            s1.step_chunk(3, do_migrate=True)
            singles.append(s1)
    finally:
        os.environ.pop("GPHOCS_FUSED_INTERPRET", None)

    for c in range(2):
        np.testing.assert_array_equal(np.asarray(s2.gen.age)[c],
                                      np.asarray(singles[c].gen.age))
        np.testing.assert_array_equal(np.asarray(s2.params.theta)[c],
                                      np.asarray(singles[c].params.theta))
        np.testing.assert_array_equal(np.asarray(s2.params.tau)[c],
                                      np.asarray(singles[c].params.tau))
        np.testing.assert_array_equal(np.asarray(s2.lnld)[c],
                                      np.asarray(singles[c].lnld))
