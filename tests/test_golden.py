"""Committed conformance gates vs the C reference.

1. `test_posterior_matches_c_reference` — builds the reference C binary
   (gcc, reference Makefile flags + -fcommon for the pre-C99-tentative
   globals), runs pooled chains of both implementations on the same
   simulated data and asserts every marginal posterior matches within
   between-chain error (|z| < 3.5).  Expensive (~10-20 min): opt in with
   GPHOCS_GOLDEN=1.  The CI artifact of record is GOLDEN_r02.json at the
   repo root, produced by exactly this code.

2. `test_prior_only_posterior_equals_prior` — the reference's vestigial
   no-data mode (src/GPhoCS.c:447-483): with the data likelihood
   short-circuited to 0, the sampler must reproduce its Gamma priors.
   Always runs (moderate cost).
"""

import json
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.sampler.driver import Sampler

REF_SRC = "/root/reference/src"

_C_SOURCES = [
    "GPhoCS.c", "MCMCcontrol.c", "utils.c", "GenericTree.c",
    "PopulationTree.c", "LocusDataLikelihood.c", "AlignmentProcessor.c",
    "patch.c", "omp_stub.c",
]


def build_c_reference(tmpdir) -> str:
    """Compile the reference into tmpdir (reference Makefile:17-28 flags;
    -fcommon because the 2017 code relies on tentative definitions)."""
    binary = os.path.join(str(tmpdir), "G-PhoCS")
    srcs = [os.path.join(REF_SRC, s) for s in _C_SOURCES]
    cmd = ["gcc", "-O3", "-std=c99", "-fstack-protector-all", "-fcommon",
           "-o", binary] + srcs + ["-lm"]
    subprocess.run(cmd, check=True, capture_output=True, cwd=str(tmpdir))
    return binary


@pytest.mark.golden
@pytest.mark.skipif(not os.environ.get("GPHOCS_GOLDEN"),
                    reason="expensive: set GPHOCS_GOLDEN=1 to run the "
                           "C-reference posterior conformance gate")
def test_posterior_matches_c_reference(tmp_path):
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not mounted")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from golden_compare import run_comparison

    binary = build_c_reference(tmp_path)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "8000")),
        n_chains=int(os.environ.get("GC_CHAINS", "6")),
        burnin=int(os.environ.get("GC_BURNIN", "1000")),
        nl=int(os.environ.get("GC_LOCI", "100")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "3")),
    )
    art = os.path.join(os.path.dirname(__file__), "..", "GOLDEN_r02.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    worst = max(abs(r["z"]) for r in out["results"])
    assert worst < 3.5, (
        f"posterior mismatch vs C reference: worst |z| = {worst:.2f}; "
        f"see {art}")


PRIOR_CTL = """
GENERAL-INFO-START
    seq-file            NONE
    trace-file          t.out
    num-loci            6
    locus-mut-rate      CONST
    mcmc-iterations     4000
    burn-in             400
    random-seed         4242
    mcmc-sample-skip    0
    start-mig 0
    iterations-per-log  10000
    logs-per-line       10
    find-finetunes      FALSE
    finetune-coal-time  0.01
    finetune-mig-time   0.3
    finetune-theta      0.08
    finetune-mig-rate   0.05
    finetune-tau        0.0000030
    finetune-mixing     0.006
    tau-theta-print     10000.0
    tau-theta-alpha     2.0
    tau-theta-beta      20000.0
    mig-rate-print      0.001
    mig-rate-alpha      1.5
    mig-rate-beta       10.0
GENERAL-INFO-END
CURRENT-POPS-START
    POP-START
        name        A
        samples     one d
    POP-END
    POP-START
        name        B
        samples     two d
    POP-END
CURRENT-POPS-END
ANCESTRAL-POPS-START
    POP-START
        name            root
        children        A   B
        tau-initial 0.0001
        tau-alpha       2.0
        tau-beta        20000.0
        finetune-tau            0.0000030
    POP-END
ANCESTRAL-POPS-END
MIG-BANDS-START
    BAND-START
       source  A
       target  B
       mig-rate-print 0.1
    BAND-END
MIG-BANDS-END
"""


def test_prior_only_posterior_equals_prior():
    """No data => the chain must sample the Gamma priors.

    theta ~ Gamma(2, 20000): mean 1e-4, sd 7.07e-5.  The sampled marginal
    means must match within MC error (estimated via chain splits).
    """
    cfg = parse_control_text(PRIOR_CTL)
    s = Sampler(cfg, dtype=jnp.float64, rng_mode="fast")
    cols, rows = s.run()
    assert rows.shape[0] >= 3000
    vals = rows[500:]  # extra in-sample burn
    # columns: Sample, theta_A, theta_B, theta_root, tau_root, m_A->B, ...
    idx = {c: i for i, c in enumerate(cols)}
    # print factors: theta/tau x 10000, mig x ... (mig-rate-print 0.001)
    checks = [
        ("theta_A", 2.0 / 20000.0 * 10000.0),
        ("theta_B", 2.0 / 20000.0 * 10000.0),
        ("theta_root", 2.0 / 20000.0 * 10000.0),
        ("tau_root", 2.0 / 20000.0 * 10000.0),
        # migration-rate prior gate (round-4 Weak #4: the C gates alone
        # could not exclude a ~2x m bias): m ~ Gamma(1.5, 10), mean
        # 0.15, per-band print factor 0.1.  P(G|params) is a normalized
        # density over genealogies for ANY m, so the prior-only m
        # marginal is exactly its Gamma prior
        # (reference UpdateMigRates, src/GPhoCS.c:3115-3212).
        ("m_A->B", 1.5 / 10.0 * 0.1),
    ]
    for name, expect in checks:
        x = vals[:, idx[name]]
        # MC error from 8 batch means (accounts for autocorrelation)
        batches = np.array_split(x, 8)
        bm = np.array([b.mean() for b in batches])
        se = bm.std(ddof=1) / np.sqrt(len(bm))
        z = (x.mean() - expect) / max(se, 1e-12)
        assert abs(z) < 4.0, (name, x.mean(), expect, se, z)
        if name.startswith("m_"):
            # power guarantee: this gate can see a ~1.5x m bias
            assert se < 0.2 * expect, ("m gate underpowered", se, expect)


SAMPLE_AGE_PRIOR_CTL = """
GENERAL-INFO-START
    seq-file            NONE
    trace-file          t.out
    num-loci            6
    locus-mut-rate      CONST
    mcmc-iterations     40000
    burn-in             500
    random-seed         777
    mcmc-sample-skip    0
    no-mixing
    start-mig 0
    iterations-per-log  10000
    logs-per-line       10
    find-finetunes      FALSE
    finetune-coal-time  0.01
    finetune-mig-time   0.3
    finetune-theta      0.08
    finetune-mig-rate   0.05
    finetune-tau        0.0000008
    finetune-mixing     0.006
    tau-theta-print     10000.0
    tau-theta-alpha     2.0
    tau-theta-beta      2000000.0
    mig-rate-print      0.001
    mig-rate-alpha      1.5
    mig-rate-beta       10.0
GENERAL-INFO-END
CURRENT-POPS-START
    POP-START
        name        A
        samples     one d
    POP-END
    POP-START
        name        B
        samples     two d
        age         0.0000005   e
    POP-END
CURRENT-POPS-END
ANCESTRAL-POPS-START
    POP-START
        name            root
        children        A   B
        tau-initial 0.0001
        tau-alpha       2.0
        tau-beta        20000.0
        finetune-tau            0.0000030
    POP-END
ANCESTRAL-POPS-END
"""


def test_prior_only_sample_age_matches_prior():
    """UpdateSampleAge statistical gate (reference src/GPhoCS.c:4006-4590).

    With no data, the marginal posterior of an estimated ancient-sample
    age equals its Gamma prior: the coalescent genealogy density is
    normalized for ANY sample age, so integrating over genealogies leaves
    the prior.  The age prior of a current pop is the global tau-theta
    prior (reference MCMCcontrol.c:276-300); here Gamma(2, 2e6) (mean
    1e-6), two decades below the root tau prior Gamma(2, 2e4) so the
    age < tau_root truncation is negligible (P ~ 3e-4).
    """
    cfg = parse_control_text(SAMPLE_AGE_PRIOR_CTL)
    s = Sampler(cfg, dtype=jnp.float64, rng_mode="fast")
    cols, rows = s.run()
    idx = {c: i for i, c in enumerate(cols)}
    assert "tau_B" in idx, cols
    vals = rows[2000:]
    x = vals[:, idx["tau_B"]]
    # the chain must actually move the sample age
    assert np.unique(x).size > 100
    expect_mean = 2.0 / 2000000.0 * 10000.0
    expect_sd = np.sqrt(2.0) / 2000000.0 * 10000.0
    batches = np.array_split(x, 8)
    bm = np.array([b.mean() for b in batches])
    se = bm.std(ddof=1) / np.sqrt(len(bm))
    z = (x.mean() - expect_mean) / max(se, 1e-12)
    assert abs(z) < 4.0, (x.mean(), expect_mean, se, z)
    # second moment within 15% (sd estimate is noisier)
    assert abs(x.std() - expect_sd) / expect_sd < 0.15, (x.std(), expect_sd)


@pytest.mark.golden
@pytest.mark.skipif(not os.environ.get("GPHOCS_GOLDEN"),
                    reason="expensive: set GPHOCS_GOLDEN=1 to run the "
                           "ancient-sample-age C conformance gate")
def test_posterior_matches_c_reference_sample_age(tmp_path):
    """BASELINE config 4 shape: posterior gate vs the C reference with an
    estimated ancient sample age on pop D (UpdateSampleAge exercised in
    both implementations; reference src/GPhoCS.c:4006-4590)."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not mounted")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from golden_compare import run_comparison, CTL_SAMPLE_AGE

    binary = build_c_reference(tmp_path)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "8000")),
        n_chains=int(os.environ.get("GC_CHAINS", "6")),
        burnin=int(os.environ.get("GC_BURNIN", "1000")),
        nl=int(os.environ.get("GC_LOCI", "100")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "3")),
        ctl_template=CTL_SAMPLE_AGE,
    )
    art = os.path.join(os.path.dirname(__file__), "..",
                       "GOLDEN_SAMPLEAGE_r03.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    worst = max(abs(r["z"]) for r in out["results"])
    assert worst < 3.5, (
        f"ancient-sample-age posterior mismatch vs C: worst |z| = "
        f"{worst:.2f}; see {art}")


@pytest.mark.golden
@pytest.mark.skipif(not os.environ.get("GPHOCS_GOLDEN"),
                    reason="expensive: set GPHOCS_GOLDEN=1 to run the "
                           "VAR-rates C conformance gate")
def test_posterior_matches_c_reference_var_rates(tmp_path):
    """VAR locus mutation rates posterior gate vs the C reference
    (UpdateLocusRate exercised in both; reference src/GPhoCS.c:4598-4674,
    rate initialization :1137-1178).  Includes the Variance-Mut column."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not mounted")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from golden_compare import run_comparison, CTL_VAR_RATES

    binary = build_c_reference(tmp_path)
    out = run_comparison(
        binary,
        iters=int(os.environ.get("GC_ITERS", "8000")),
        n_chains=int(os.environ.get("GC_CHAINS", "6")),
        burnin=int(os.environ.get("GC_BURNIN", "1000")),
        nl=int(os.environ.get("GC_LOCI", "100")),
        jax_chains=int(os.environ.get("GC_JAX_CHAINS", "3")),
        ctl_template=CTL_VAR_RATES,
    )
    art = os.path.join(os.path.dirname(__file__), "..",
                       "GOLDEN_VAR_r03.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    worst = max(abs(r["z"]) for r in out["results"])
    assert worst < 3.5, (
        f"VAR-rates posterior mismatch vs C: worst |z| = {worst:.2f}; "
        f"see {art}")
