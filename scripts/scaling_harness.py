"""Mesh scaling-efficiency harness: it/s at 1, 2, 4, ... devices.

Runs the sharded sampler over a 1-D 'loci' mesh of every power-of-two
device count available and reports iterations/s + parallel efficiency.
On a real TPU pod slice the numbers are wall-clock meaningful; with
virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count=N)
they validate the partitioned execution path but share host cores, so
efficiency there measures XLA partitioning overhead, not hardware scaling
— the artifact records which mode produced it.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_harness.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCI = int(os.environ.get("GPHOCS_SCALE_LOCI", "512"))
ITERS = int(os.environ.get("GPHOCS_SCALE_ITERS", "8"))


def main():
    import jax
    import jax.numpy as jnp

    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.parallel.mesh import make_mesh
    from gphocs_tpu.sampler.driver import Sampler
    from tests.test_control import SAMPLE_CTL

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = f"/tmp/gphocs_scale_seqs_{LOCI}.txt"
    if not os.path.exists(path):
        from gphocs_tpu.io.simulate import simulate_seq_file
        from gphocs_tpu.model import build_poptree

        cfg0 = parse_control_text(SAMPLE_CTL)
        simulate_seq_file(cfg0, build_poptree(cfg0), path, num_loci=LOCI,
                          seq_len=500, seed=20260819)

    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rows = []
    base_ips = None
    for n in counts:
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = 17
        cfg.mcmc.start_mig = 0
        mesh = make_mesh(devices[:n]) if n > 1 else None
        dtype = jnp.float32 if jax.default_backend() != "cpu" \
            else jnp.float64
        s = Sampler(cfg, seq_path=path, dtype=dtype, rng_mode="fast",
                    mesh=mesh)
        s.initialize()
        s.step_chunk(ITERS, do_migrate=True)
        jax.block_until_ready(s.gen.age)
        t0 = time.time()
        s.step_chunk(ITERS, do_migrate=True)
        jax.block_until_ready(s.gen.age)
        ips = ITERS / (time.time() - t0)
        if base_ips is None:
            base_ips = ips
        eff = ips / (base_ips * n)
        rows.append(dict(devices=n, iters_per_s=round(ips, 3),
                         efficiency_vs_1dev=round(eff, 3)))
        print(f"devices={n:3d}  {ips:8.3f} it/s   efficiency {eff:6.2f}",
              file=sys.stderr, flush=True)

    out = dict(platform=jax.default_backend(),
               device0=str(devices[0]), loci=LOCI, iters=ITERS,
               virtual_cpu="host_platform_device_count" in
                           os.environ.get("XLA_FLAGS", ""),
               note=("virtual CPU devices share host cores: this validates "
                     "partitioned execution, not hardware scaling"),
               rows=rows)
    with open(os.path.join(root, "SCALING_r02.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
