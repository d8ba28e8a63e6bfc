"""Tests for tools: readTrace, alignstats, controlgen, Newick I/O."""

import numpy as np

from gphocs_tpu.model.newick import genealogy_to_newick, parse_newick
from gphocs_tpu.tools.alignstats import (
    classify_pattern,
    two_site_test,
)
from gphocs_tpu.tools.controlgen import build_config, config_to_control_text
from gphocs_tpu.config import parse_control_text


def test_newick_roundtrip():
    fa, ls, rs, age, root, names = parse_newick(
        "((a:1.0,b:1.0):0.5,c:1.5);")
    assert names == ["a", "b", "c"]
    np.testing.assert_allclose(age[root], 1.5)
    txt = genealogy_to_newick(fa, ls, rs, age, root, names)
    fa2, ls2, rs2, age2, root2, names2 = parse_newick(txt)
    np.testing.assert_allclose(age2, age)
    np.testing.assert_array_equal(fa2, fa)


def test_pattern_classification():
    # het singleton: one C genome among Ts -> non-informative
    assert classify_pattern("TTTY") == 0
    # homozygote C slot = two C genomes -> informative
    assert classify_pattern("TTTC") == 1
    # two Cs -> informative biallelic
    assert classify_pattern("TTCC") == 1
    # het counts as one of each
    assert classify_pattern("TTYC") == 1
    # tri-allelic beyond a singleton
    assert classify_pattern("TTCCAA") == 2


def test_four_gamete():
    # all four gametes TT, TC, CT, CC across two sites -> violation
    assert two_site_test("TTCC", "TCTC") == 1
    # compatible pair (only 3 gametes)
    assert two_site_test("TTCC", "TTTC") == 0
    # double-het ambiguity -> potential violation at most
    assert two_site_test("TYC", "TYC") in (0, 2)


def test_controlgen_roundtrip():
    cfg = build_config(
        "((A,B)AB,C)root",
        {"A": [("a1", "d")], "B": [("b1", "d")], "C": [("c1", "h")]},
        bands=[("A", "B")],
        seq_file="seqs.txt", mcmc_iterations=5000,
        tau_theta_alpha=1.0, tau_theta_beta=10000.0,
        mig_rate_alpha=0.002, mig_rate_beta=1e-5,
        find_finetunes=True)
    text = config_to_control_text(cfg)
    cfg2 = parse_control_text(text)
    assert [p.name for p in cfg2.pops] == ["A", "B", "C", "AB", "root"]
    assert cfg2.num_samples == 5
    assert len(cfg2.bands) == 1 and cfg2.bands[0].source == "A"
    assert cfg2.mcmc.mcmc_iterations == 5000


def test_coal_stats_diagnostics():
    """Flat stats equal the summed per-pop stats; LCA ages match a direct
    recursive computation."""
    import jax.numpy as jnp
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.rng_host import HostRng
    from gphocs_tpu.sampler.init import init_gen_state, sample_pop_parameters
    from gphocs_tpu.state import GenState
    from gphocs_tpu.kernels.common import make_context, full_stats
    from gphocs_tpu.tools.coalstats_out import flat_stats, pairwise_lca_ages
    from gphocs_tpu.state import Params
    from tests.test_control import SAMPLE_CTL

    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    rng = HostRng(9, 31)
    params = sample_pop_parameters(tree, rng)
    gen = init_gen_state(tree, params, rng, 8, np.ones(8))
    jgen = GenState(*[jnp.asarray(x) for x in gen])
    jparams = Params(*[jnp.asarray(x) for x in params])
    ctx = make_context(tree)

    # flat coal stat >= summed per-pop stats (merging pops can only add
    # cross-pop lineage overlap)
    st = full_stats(jgen, jparams, ctx)
    fl = np.asarray(flat_stats(jgen, ctx.band_source))
    assert (fl + 1e-12 >= np.asarray(st.coal_stats).sum(axis=1)).all()

    lca = np.asarray(pairwise_lca_ages(jgen))
    fa = np.asarray(gen.father)
    age = np.asarray(gen.age)
    S = tree.num_samples
    for l in range(3):
        def ancestors(v):
            out = [v]
            while fa[l, out[-1]] >= 0:
                out.append(fa[l, out[-1]])
            return out
        for i in range(S):
            for j in range(i + 1, S):
                ai = set(ancestors(i))
                common = [v for v in ancestors(j) if v in ai]
                expect = min(age[l, v] for v in common)
                np.testing.assert_allclose(lca[l, i, j], expect, rtol=1e-12)


def test_cli_mode_gating(tmp_path, capsys):
    """Support-matrix gating: contradictory/unsupported CLI combos raise
    (README 'Mode support matrix')."""
    import pytest
    from gphocs_tpu.cli import main as cli_main

    ctl = tmp_path / "x.ctl"
    ctl.write_text("GENERAL-INFO-START\nGENERAL-INFO-END\n")
    with pytest.raises(SystemExit):
        cli_main([str(ctl), "--legacy-rng", "--fast-rng"])
    with pytest.raises(SystemExit):
        cli_main([str(ctl), "--buckets", "4", "--legacy-rng"])
    # round 5: --buckets composes with --mesh (buckets x mesh shard_map)
    with pytest.raises(SystemExit):
        cli_main([str(ctl), "--buckets", "4", "--fast-rng", "--chains",
                  "2"])


def test_sampler_bucket_combo_guards(tmp_path):
    """Sampler constructor refuses unsupported bucket compositions."""
    import pytest
    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.sampler.driver import Sampler
    from tests.test_control import SAMPLE_CTL

    cfg = parse_control_text(SAMPLE_CTL)
    with pytest.raises(AssertionError):
        Sampler(cfg, num_loci=4, rng_mode="legacy", buckets=2)
    with pytest.raises(AssertionError):
        Sampler(cfg, num_loci=4, rng_mode="fast", buckets=2, chains=2)
