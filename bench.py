"""Benchmark driver entry point.

Runs the standard workload (1000 loci x 1000bp, 4+3 pops, 1 migration
band — the bundled-sample-scale configuration, cf. BASELINE_MEASURED.json)
on the default JAX backend and prints ONE json line:

    {"metric": "mcmc_iterations_per_s", "value": N, "unit": "iters/s",
     "vs_baseline": N / C_SERIAL_BASELINE}

vs_baseline is against the measured serial C reference on the same
workload (see BASELINE_MEASURED.json; the C OpenMP build scaled
negatively on the measurement host).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_LOCI = int(os.environ.get("GPHOCS_BENCH_LOCI", "1000"))
WARMUP = 3
TIMED = int(os.environ.get("GPHOCS_BENCH_ITERS", "25"))


def _bench_data_path():
    path = f"/tmp/gphocs_bench_seqs_{NUM_LOCI}.txt"
    if not os.path.exists(path):
        from gphocs_tpu.config import parse_control_text
        from gphocs_tpu.io.simulate import simulate_seq_file
        from gphocs_tpu.model import build_poptree
        from tests.test_control import SAMPLE_CTL

        cfg = parse_control_text(SAMPLE_CTL)
        tree = build_poptree(cfg)
        simulate_seq_file(cfg, tree, path, num_loci=NUM_LOCI, seq_len=1000,
                          seed=20260817)
    return path


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.default_backend()
    # f64 on CPU (exact conformance); f32 on TPU (native speed)
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32

    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.sampler.driver import Sampler
    from tests.test_control import SAMPLE_CTL

    data = _bench_data_path()
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 111
    cfg.mcmc.start_mig = 0
    # production mode: loop-free counter-based RNG streams (statistically
    # equivalent update schedule; the legacy WH streams are the conformance
    # path and carry per-draw rejection while-loops that dominate latency)
    sampler = Sampler(cfg, seq_path=data, dtype=dtype, rng_mode="fast")
    sampler.initialize()

    sampler.step_chunk(TIMED, do_migrate=True)  # compile + warm up
    jax.block_until_ready(sampler.gen.age)

    t0 = time.time()
    sampler.step_chunk(TIMED, do_migrate=True)
    jax.block_until_ready(sampler.gen.age)
    dt = time.time() - t0

    iters_per_s = TIMED / dt
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    c_ref = base["c_serial_iters_per_s"] * (1000 / NUM_LOCI)
    model = _perf_model(sampler)
    flops_s = model["flops_per_iter"] * iters_per_s
    bytes_s = model["hbm_bytes_per_iter"] * iters_per_s
    # TPU v5e peaks: ~197 TFLOP/s bf16 MXU; the sampler is a VPU
    # (elementwise/reduce) workload — the honest compute ceiling is the
    # VPU: 8x128 lanes x 4 ops/cycle x 940 MHz ~= 3.85 TFLOP/s f32.
    # HBM: 819 GB/s.  (docs/DESIGN.md "Speed of light" analysis.)
    vpu_peak = 3.85e12
    hbm_peak = 819e9
    frac_vpu = flops_s / vpu_peak
    frac_hbm = bytes_s / hbm_peak
    if max(frac_vpu, frac_hbm) < 0.05:
        bound = "latency"   # kernel-launch / sweep-sequential bound
    elif frac_hbm > frac_vpu:
        bound = "hbm"
    else:
        bound = "vpu"
    print(json.dumps({
        "metric": "mcmc_iterations_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / c_ref, 3),
        "mfu": round(frac_vpu, 5),
        "hbm_frac": round(frac_hbm, 5),
        "roofline_bound": bound,
        "flops_per_iter": int(model["flops_per_iter"]),
        "hbm_bytes_per_iter": int(model["hbm_bytes_per_iter"]),
    }))


def _perf_model(sampler):
    """Analytic per-iteration FLOP + HBM-byte model of the production
    iteration (fused path), for the roofline fields in the bench line.

    Work inventory (counts from the kernel structure; constants are ops
    per element of the dominant tensor expressions):

      * node-age sweep: NI node steps, each refreshing the root path
        (~ceil(log2 S)+1 nodes) of the [CPWP] conditional block plus the
        root reduce — ~12 flops/element JC combine;
      * SPR sweep: N node steps x (segment-grid build [K, ] + walk +
        2-path refresh + root reduce);
      * mig-age sweep: M slots x PP pops x NSEG segment overlaps;
      * tau: n_anc pops x (full rebuild (S-1 trips x NI nodes x CPWP)
        + NSEG^2 pairwise stats x PP);
      * mixing + theta/mig-rate: one full rebuild + one stats pass.

    HBM traffic: the fused kernels stream the conditionals (the only
    large tensor) once in + once out per sweep; everything else is
    [L, N]-scale (~100x smaller).
    """
    L = sampler.num_loci
    S = sampler.tree.num_samples
    N = 2 * S - 1
    NI = S - 1
    P = sampler.seq.leaf_base.shape[2]
    CPWP = 4 * P
    M = sampler.gen.max_migs if hasattr(sampler, "gen") else 10
    PP = sampler.tree.num_pops
    NSEG = N + M
    import math
    path = math.ceil(math.log2(max(S, 2))) + 1
    combine = 12 * CPWP           # flops per node-conditional recompute
    root_red = 6 * CPWP
    gts = max(sampler.cfg.mcmc.genetree_samples, 1)

    node_age = NI * (path * combine + root_red + 6 * NSEG + 40)
    K = N + M + PP + 2 + 1        # SPR segment rows (B~1)
    spr = N * (2 * path * combine + root_red + 10 * K * PP + 14 * K + 60)
    mig_age = M * (PP * (3 * NSEG + 8) + 2 * NSEG + 30)
    n_anc = PP - sampler.tree.num_cur_pops
    rebuild = (S - 1) * NI * combine
    stats = PP * (7 * NSEG * NSEG + 4 * NSEG)
    tau = n_anc * (rebuild + root_red + stats + 8 * (N + M))
    mixing = rebuild + root_red + stats
    theta_mr = stats + 30 * PP
    flops_per_locus = (gts * (node_age + spr + mig_age)
                       + tau + mixing + theta_mr)

    cond_bytes = N * CPWP * 4
    # sweeps each read+write cond once; tau evaluates n_anc proposals and
    # selects; mixing rebuilds once; plus [L, N]-scale side tensors (~15%)
    sweeps = gts * 2 + gts * 2 + (n_anc + 1) * 2 + 2
    hbm_per_locus = 1.15 * sweeps * cond_bytes

    return dict(flops_per_iter=flops_per_locus * L,
                hbm_bytes_per_iter=hbm_per_locus * L)


if __name__ == "__main__":
    main()
