"""Control-file parser tests against the bundled sample control file
semantics (reference: sample-control-file.ctl and src/MCMCcontrol.c)."""

import numpy as np
import pytest

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.config.control import ControlFileError
from gphocs_tpu.model import build_poptree
from gphocs_tpu.model.poptree import band_times

SAMPLE_CTL = """
GENERAL-INFO-START
	seq-file            seqs-sample.txt
	trace-file          mcmc.log
	locus-mut-rate          CONST
	mcmc-iterations	  5000
	iterations-per-log  50
	logs-per-line       10
	find-finetunes		FALSE
	finetune-coal-time	0.01
	finetune-mig-time	0.3
	finetune-theta		0.04
	finetune-mig-rate	0.02
	finetune-tau		0.0000008
	finetune-mixing		0.003
#   finetune-locus-rate 0.3
	tau-theta-print		10000.0
	tau-theta-alpha		1.0			# for STD/mean ratio of 100%
	tau-theta-beta		10000.0		# for mean of 1e-4
	mig-rate-print		0.001
	mig-rate-alpha		0.002
	mig-rate-beta		0.00001
GENERAL-INFO-END

CURRENT-POPS-START
	POP-START
		name		A
		samples		one d
	POP-END
	POP-START
		name		B
		samples		two d
	POP-END
	POP-START
		name		C
		samples		three d
	POP-END
	POP-START
		name		D
		samples		five d
	POP-END
CURRENT-POPS-END

ANCESTRAL-POPS-START
	POP-START
		name			AB
		children		A		B
		tau-initial	0.000005
		tau-beta		20000.0
		finetune-tau			0.0000008
	POP-END
	POP-START
		name			ABC
		children		AB		C
		tau-initial	0.00001
		tau-beta		20000.0
		finetune-tau			0.0000008
	POP-END
	POP-START
		name			root
		children		ABC	D
		tau-initial	0.00005
		tau-beta		20000.0
		finetune-tau			0.00000286
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


def test_parse_sample_control():
    cfg = parse_control_text(SAMPLE_CTL)
    m = cfg.mcmc
    assert m.seq_file == "seqs-sample.txt"
    assert m.trace_file == "mcmc.log"
    assert m.mut_rate_mode == 0
    assert m.mcmc_iterations == 5000
    assert m.iterations_per_log == 50
    assert m.finetunes.coal_time == 0.01
    assert m.finetunes.mixing == 0.003
    assert cfg.num_cur_pops == 4 and cfg.num_pops == 7
    assert [p.name for p in cfg.pops] == ["A", "B", "C", "D", "AB", "ABC", "root"]
    # diploid samples -> 8 haploid slots
    assert cfg.num_samples == 8
    assert cfg.sample_names == ["one", "", "two", "", "three", "", "five", ""]
    assert cfg.samples_per_pop() == [2, 2, 2, 2]
    # ancestral priors inherit tau-theta-alpha but override beta
    ab = cfg.anc_pops[0]
    assert ab.tau_alpha == 1.0 and ab.tau_beta == 20000.0
    assert ab.tau_initial == 5e-6
    # per-pop tau finetunes (global default replaced by per-pop)
    assert m.finetunes.taus == pytest.approx(
        [8e-7, 8e-7, 8e-7, 8e-7, 8e-7, 8e-7, 2.86e-6]
    )
    # one band D->B
    assert len(cfg.bands) == 1
    assert (cfg.bands[0].source, cfg.bands[0].target) == ("D", "B")
    assert cfg.bands[0].mig_rate_print == 0.1
    assert cfg.bands[0].mig_rate_alpha == 0.002
    # parameter count: 2*7-4 + 1 band + 0 ancient + 0 admixed + 0 var-mut = 11
    assert cfg.num_parameters() == 11


def test_poptree_build():
    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    assert tree.num_pops == 7 and tree.num_cur_pops == 4
    assert tree.root_pop == 6
    # A,B -> AB(4); AB,C -> ABC(5); ABC,D -> root(6)
    np.testing.assert_array_equal(tree.father[:7], [4, 4, 5, 6, 5, 6, -1])
    assert tree.is_ancestral[6].all()
    assert tree.is_ancestral[4][0] and tree.is_ancestral[4][1]
    assert not tree.is_ancestral[4][2]
    assert tree.is_ancestral[4][4]  # self
    np.testing.assert_array_equal(tree.sample_pop, [0, 0, 1, 1, 2, 2, 3, 3])
    assert tree.num_bands == 1
    assert tree.band_source[0] == 3 and tree.band_target[0] == 1


def test_band_times():
    cfg = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg)
    tau = np.array([0.0, 0.0, 0.0, 0.0, 5e-6, 1e-5, 5e-5])
    start, end = band_times(tree, tau)
    # band D->B: start=max(tau_D, tau_B)=0, end=min(tau_root, tau_AB)=5e-6
    assert start[0] == 0.0 and end[0] == 5e-6


def test_secondary_control_overrides():
    sec = """
GENERAL-INFO-START
	mcmc-iterations 99
GENERAL-INFO-END
MIG-BANDS-START
MIG-BANDS-END
"""
    cfg = parse_control_text(SAMPLE_CTL, sec)
    assert cfg.mcmc.mcmc_iterations == 99
    assert len(cfg.bands) == 0  # replaced wholesale


def test_invalid_band_rejected():
    bad = SAMPLE_CTL.replace("source  D", "source  AB").replace(
        "target  B", "target  A"
    )
    with pytest.raises(ControlFileError):
        parse_control_text(bad)


def test_missing_finetune_rejected():
    bad = SAMPLE_CTL.replace("finetune-mixing		0.003", "")
    with pytest.raises(ControlFileError):
        parse_control_text(bad)
