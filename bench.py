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
    print(json.dumps({
        "metric": "mcmc_iterations_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / c_ref, 3),
    }))


if __name__ == "__main__":
    main()
