"""Locus-count scaling sweep: it/s and loci*iters/s vs the serial C build.

Run on TPU.  Writes BENCH_SWEEP_r05.json at the repo root and prints a table.
The C reference is linear in loci (per-iteration work = sum over loci,
src/GPhoCS.c:2296 omp loops), so c_serial(L) = c_serial(1000) * 1000 / L;
the TPU build is latency-bound at these model sizes, so its per-iteration
time is nearly flat in L — the ratio to C grows ~linearly with L.

    GPHOCS_SWEEP_LOCI=1000,4000,10000,37000 python scripts/bench_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCI = [int(x) for x in os.environ.get(
    "GPHOCS_SWEEP_LOCI", "1000,4000,10000,37000").split(",")]
ITERS = int(os.environ.get("GPHOCS_SWEEP_ITERS", "16"))


def main():
    import jax
    import jax.numpy as jnp

    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.sampler.driver import Sampler
    from tests.test_control import SAMPLE_CTL

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE_MEASURED.json")) as f:
        base = json.load(f)
    c1000 = base["c_serial_iters_per_s"]

    rows = []
    for L in LOCI:
        path = f"/tmp/gphocs_bench_seqs_{L}.txt"
        if not os.path.exists(path):
            from gphocs_tpu.io.simulate import simulate_seq_file
            from gphocs_tpu.model import build_poptree

            cfg0 = parse_control_text(SAMPLE_CTL)
            tree = build_poptree(cfg0)
            t0 = time.time()
            simulate_seq_file(cfg0, tree, path, num_loci=L, seq_len=1000,
                              seed=20260817)
            print(f"simulated {L} loci in {time.time()-t0:.1f}s",
                  file=sys.stderr)
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = 111
        cfg.mcmc.start_mig = 0
        t0 = time.time()
        s = Sampler(cfg, seq_path=path, dtype=jnp.float32, rng_mode="fast")
        s.initialize()
        t_init = time.time() - t0
        t0 = time.time()
        s.step_chunk(ITERS, do_migrate=True)
        jax.block_until_ready(s.gen.age)
        t_compile = time.time() - t0
        t0 = time.time()
        s.step_chunk(ITERS, do_migrate=True)
        jax.block_until_ready(s.gen.age)
        dt = time.time() - t0
        ips = ITERS / dt
        c_ref = c1000 * 1000.0 / L
        rows.append(dict(loci=L, iters_per_s=round(ips, 3),
                         locus_iters_per_s=round(ips * L, 0),
                         c_serial_iters_per_s=round(c_ref, 3),
                         ratio_vs_c_serial=round(ips / c_ref, 2),
                         init_s=round(t_init, 1),
                         compile_s=round(t_compile, 1)))
        print(f"L={L:6d}  {ips:8.2f} it/s   C-serial {c_ref:7.2f} it/s   "
              f"ratio {ips / c_ref:7.2f}x   init {t_init:5.1f}s  "
              f"compile {t_compile:5.1f}s", file=sys.stderr, flush=True)

    out = dict(device=str(jax.devices()[0]), iters=ITERS, rows=rows,
               c_serial_note="c_serial(L) = measured 67 it/s at 1000 loci "
                             "scaled by 1000/L (C is linear in loci)")
    with open(os.path.join(root, "BENCH_SWEEP_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
