"""Golden comparison: run the C reference and gphocs_tpu on the same
synthetic data + control settings, compare marginal posteriors.

Usage: python scripts/golden_compare.py <path-to-GPhoCS-binary> [iters]
"""
import os
import subprocess
import sys
import tempfile

if os.environ.get("GPHOCS_GOLDEN_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "true"
    os.environ["PYTHONPATH"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
if os.environ.get("GPHOCS_GOLDEN_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gphocs_tpu.config import parse_control_text  # noqa: E402
from gphocs_tpu.io.simulate import simulate_seq_file  # noqa: E402
from gphocs_tpu.io.trace import read_trace  # noqa: E402
from gphocs_tpu.model import build_poptree  # noqa: E402
from gphocs_tpu.sampler.driver import Sampler  # noqa: E402

CTL_TEMPLATE = """
GENERAL-INFO-START
	seq-file            {seq}
	trace-file          {trace}
	locus-mut-rate      CONST
	mcmc-iterations	  {iters}
	burn-in  {burnin}
	random-seed  {seed}
	mcmc-sample-skip 0
	start-mig 0
	iterations-per-log  1000
	logs-per-line       10
	find-finetunes		FALSE
	finetune-coal-time	0.01
	finetune-mig-time	0.3
	finetune-theta		0.04
	finetune-mig-rate	0.02
	finetune-tau		0.0000008
	finetune-mixing		0.003
	tau-theta-print		10000.0
	tau-theta-alpha		1.0
	tau-theta-beta		10000.0
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


def run_comparison(binary, iters=8000, n_chains=6, burnin=1000,
                   nl=100, boost=8.0, jax_chains=None, verbose=True,
                   ctl_template=None, jax_kwargs=None, true_mig_rate=None):
    """Build/run pooled C and gphocs_tpu chains on the same simulated data;
    returns a list of per-parameter dicts with means, stds and the
    between-chain z score.  The committed conformance gate
    (tests/test_golden.py) asserts on these."""
    work = tempfile.mkdtemp(prefix="golden_")
    seq = os.path.join(work, "seqs.txt")
    tmpl = ctl_template or CTL_TEMPLATE

    ctl_text0 = tmpl.format(seq=seq, trace="t.out", iters=iters,
                            burnin=burnin, seed=1357)
    cfg = parse_control_text(ctl_text0)
    tree = build_poptree(cfg)
    # simulate from a higher-diversity parameter set so the data actually
    # identifies the parameters (the priors stay as configured)
    from gphocs_tpu.rng_host import HostRng
    from gphocs_tpu.sampler.init import sample_pop_parameters
    _rng = HostRng(nl + 1, 77)
    tp = sample_pop_parameters(tree, _rng)
    tp = tp._replace(theta=tp.theta * boost, tau=tp.tau * boost)
    if true_mig_rate is not None:
        # identifiable-m gate: simulate with a REAL migration rate so the
        # posterior concentrates and the between-chain SE can resolve a
        # ~1.5x bias (with m drawn from the heavy-tailed default prior
        # the true rate is ~0 and chain means ride prior excursions)
        import numpy as _np
        tp = tp._replace(mig_rate=_np.full_like(tp.mig_rate,
                                                true_mig_rate))
    true_params = simulate_seq_file(cfg, tree, seq, num_loci=nl,
                                    seq_len=1000, seed=77, params=tp)
    if verbose:
        print("true theta:", np.round(true_params.theta, 6))
        print("true tau:  ", np.round(true_params.tau, 6))

    # pool several independent short chains per implementation: the C
    # reference's incremental event chains corrupt on long runs with this
    # data (its own Fatal Error 0011 / drift checks), so short chains are
    # the stable regime; pooling also yields honest between-chain error.
    keep_c = []
    chain_means_c = []
    for ch in range(n_chains):
        ctl_c = os.path.join(work, f"c{ch}.ctl")
        trace_c = os.path.join(work, f"c-{ch}.out")
        with open(ctl_c, "w") as f:
            f.write(tmpl.format(seq=seq, trace=trace_c, iters=iters,
                                burnin=burnin, seed=1357 + 17 * ch))
        if verbose:
            print(f"running C chain {ch} ...")
        res = subprocess.run([binary, ctl_c], capture_output=True, text=True,
                             cwd=work, timeout=7200)
        if res.returncode != 0:
            print("C chain failed:", res.stdout[-400:], res.stderr[-200:])
            continue
        cols_c, rows_c = read_trace(trace_c)
        kc = rows_c[rows_c.shape[0] // 3:]
        keep_c.append(kc)
        chain_means_c.append(kc.mean(axis=0))
    keep_c = np.concatenate(keep_c)
    chain_means_c = np.asarray(chain_means_c)

    keep_j = []
    chain_means_j = []
    for ch in range(jax_chains or max(n_chains // 2, 2)):
        if verbose:
            print(f"running gphocs_tpu chain {ch} ...")
        cfg.mcmc.random_seed = 1357 + 17 * ch
        s = Sampler(cfg, seq_path=seq, **(jax_kwargs or {}))
        cols_j, rows_j = s.run()
        kj = rows_j[rows_j[:, 0] >= 0][rows_j.shape[0] // 3:]
        keep_j.append(kj)
        chain_means_j.append(kj.mean(axis=0))
    keep_j = np.concatenate(keep_j)
    chain_means_j = np.asarray(chain_means_j)


    results = []
    for k in range(1, len(cols_c)):
        name = cols_c[k]
        mc, sc = keep_c[:, k].mean(), keep_c[:, k].std()
        mj, sj = keep_j[:, k].mean(), keep_j[:, k].std()
        # between-chain standard errors
        se_c = chain_means_c[:, k].std(ddof=1) / np.sqrt(len(chain_means_c))
        se_j = chain_means_j[:, k].std(ddof=1) / np.sqrt(len(chain_means_j))
        se = np.sqrt(se_c**2 + se_j**2) + 1e-12
        z = (mc - mj) / se
        results.append(dict(param=name, c_mean=float(mc), jax_mean=float(mj),
                            c_std=float(sc), jax_std=float(sj),
                            se=float(se), z=float(z)))
    if verbose:
        print(f"{'param':<14} {'C mean':>12} {'jax mean':>12} {'C std':>10} "
              f"{'jax std':>10} {'z':>7}")
        for r in results:
            print(f"{r['param']:<14} {r['c_mean']:12.5f} "
                  f"{r['jax_mean']:12.5f} {r['c_std']:10.5f} "
                  f"{r['jax_std']:10.5f} {r['z']:7.2f}")
        print("workdir:", work)
    return dict(results=results, workdir=work, iters=iters,
                n_chains_c=len(chain_means_c),
                n_chains_jax=len(chain_means_j), num_loci=nl)


def main():
    binary = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    run_comparison(binary, iters=iters,
                   n_chains=int(os.environ.get("GC_CHAINS", "6")),
                   burnin=int(os.environ.get("GC_BURNIN", "1000")),
                   nl=int(os.environ.get("GC_LOCI", "100")),
                   boost=float(os.environ.get("GC_BOOST", "8")))


if __name__ == "__main__":
    main()


# BASELINE config 4 shape: ancient-DNA sample age on a current pop
# (reference UpdateSampleAge, src/GPhoCS.c:4006-4590).  Pop D carries an
# estimated ancient sample age; its age prior is the global tau-theta
# prior (src/MCMCcontrol.c:276-300).  no-mixing: the reference's mixing
# kernel scales estimated sample ages with neither prior nor Jacobian
# terms (src/GPhoCS.c:4722-4747), so with mixing the comparison would
# gate on a reference bug rather than on UpdateSampleAge.
CTL_SAMPLE_AGE = CTL_TEMPLATE.replace(
    "\t\tname\t\tD\n\t\tsamples\t\tfive d\n",
    "\t\tname\t\tD\n\t\tsamples\t\tfive d\n\t\tage\t\t0.00002\te\n"
).replace("\tfinetune-mixing\t\t0.003", "\tfinetune-mixing\t\t0.0")
assert "age\t\t0.00002" in CTL_SAMPLE_AGE

# VAR locus mutation rates (reference UpdateLocusRate,
# src/GPhoCS.c:4598-4674; initialization :1137-1178).
CTL_VAR_RATES = CTL_TEMPLATE.replace(
    "\tlocus-mut-rate      CONST",
    "\tlocus-mut-rate      VAR 1.0\n\tfinetune-locus-rate 0.3")
assert "VAR 1.0" in CTL_VAR_RATES
