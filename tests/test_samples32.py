"""Sample-axis scaling: S=32 haploid lineages (reference supports NS=200,
src/patch.h:17-22; round-2 never tested past S=8)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.kernels.common import gen_log_prior
from gphocs_tpu.ops.likelihood_cache import data_log_likelihood_cached
from gphocs_tpu.sampler.driver import Sampler

S32_CTL = """
GENERAL-INFO-START
    seq-file            {seq}
    trace-file          {trace}
    locus-mut-rate      CONST
    mcmc-iterations     40
    burn-in             0
    random-seed         19
    mcmc-sample-skip    0
    start-mig 0
    iterations-per-log  1000
    logs-per-line       10
    find-finetunes      FALSE
    finetune-coal-time  0.01
    finetune-mig-time   0.3
    finetune-theta      0.04
    finetune-mig-rate   0.02
    finetune-tau        0.0000008
    finetune-mixing     0.003
    tau-theta-print     10000.0
    tau-theta-alpha     1.0
    tau-theta-beta      10000.0
    mig-rate-print      0.001
    mig-rate-alpha      0.002
    mig-rate-beta       0.00001
GENERAL-INFO-END
CURRENT-POPS-START
    POP-START
        name  A
        samples  a1 d a2 d a3 d a4 d
    POP-END
    POP-START
        name  B
        samples  b1 d b2 d b3 d b4 d
    POP-END
    POP-START
        name  C
        samples  c1 d c2 d c3 d c4 d
    POP-END
    POP-START
        name  D
        samples  d1 d d2 d d3 d d4 d
    POP-END
CURRENT-POPS-END
ANCESTRAL-POPS-START
    POP-START
        name  AB
        children  A  B
        tau-initial 0.000005
        tau-beta  20000.0
    POP-END
    POP-START
        name  ABC
        children  AB  C
        tau-initial 0.00001
        tau-beta  20000.0
    POP-END
    POP-START
        name  root
        children  ABC  D
        tau-initial 0.00005
        tau-beta  20000.0
    POP-END
ANCESTRAL-POPS-END
MIG-BANDS-START
    BAND-START
       source  D
       target  B
       mig-rate-print 0.1
    BAND-END
MIG-BANDS-END
"""


def test_s32_sampler_runs_and_invariants(tmp_path):
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree

    seq = str(tmp_path / "seqs.txt")
    ctl = S32_CTL.format(seq=seq, trace=str(tmp_path / "t.out"))
    cfg = parse_control_text(ctl)
    tree = build_poptree(cfg)
    assert tree.num_samples == 32
    simulate_seq_file(cfg, tree, seq, num_loci=10, seq_len=300, seed=41)

    cfg = parse_control_text(ctl)
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=seq, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    assert s.gen.num_nodes == 63
    st, _ = s.step_chunk(4, do_migrate=True)
    assert int(st.acc_coal_time) > 0
    assert int(st.acc_spr) > 0
    lnld2 = data_log_likelihood_cached(s.gen, s.seq)
    lnp2 = gen_log_prior(s.gen, s.params, s.ctx)
    assert float(jnp.max(jnp.abs(s.lnld - lnld2))) < 1e-6
    assert float(jnp.max(jnp.abs(s.lnp - lnp2))) < 1e-5
    # structural sanity: ages respect father ordering
    fa = np.asarray(s.gen.father)
    age = np.asarray(s.gen.age)
    L, N = fa.shape
    for n in range(N):
        ok = fa[:, n] < 0
        fa_safe = np.where(ok, 0, fa[:, n])
        assert np.all(ok | (age[np.arange(L), fa_safe] >= age[:, n] - 1e-12))


def test_s64_sampler_runs_and_invariants(tmp_path):
    """S=64 (32 diploid individuals): the next doubling toward the
    reference's NS=200 ceiling (src/patch.h:17-22).  Correctness gate for
    the sample-axis capacity artifact (SAMPLES_r04.json)."""
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.debugcheck import check_gen_state

    s64 = S32_CTL
    for pop in "abcd":
        s64 = s64.replace(
            f"samples  {pop}1 d {pop}2 d {pop}3 d {pop}4 d",
            f"samples  {pop}1 d {pop}2 d {pop}3 d {pop}4 d "
            f"{pop}5 d {pop}6 d {pop}7 d {pop}8 d")
    seq = str(tmp_path / "seqs.txt")
    ctl = s64.format(seq=seq, trace=str(tmp_path / "t.out"))
    cfg = parse_control_text(ctl)
    tree = build_poptree(cfg)
    assert tree.num_samples == 64
    simulate_seq_file(cfg, tree, seq, num_loci=6, seq_len=200, seed=43)

    cfg = parse_control_text(ctl)
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=seq, dtype=jnp.float64, rng_mode="fast")
    s.initialize()
    assert s.gen.num_nodes == 127
    st, _ = s.step_chunk(3, do_migrate=True)
    assert int(st.acc_coal_time) > 0
    lnld2 = data_log_likelihood_cached(s.gen, s.seq)
    lnp2 = gen_log_prior(s.gen, s.params, s.ctx)
    assert float(jnp.max(jnp.abs(s.lnld - lnld2))) < 1e-6
    assert float(jnp.max(jnp.abs(s.lnp - lnp2))) < 1e-5
    assert check_gen_state(s.gen, s.params, s.tree) == []
