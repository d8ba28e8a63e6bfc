"""Ragged-loci bench: bucketed vs dense padding (run on TPU).

Writes RAGGED_r03.json: padded pattern cells and per-iteration time for
the dense (pad-to-global-max) and bucketed samplers on the same ~10x
ragged dataset.  VERDICT item 4's 'done' artifact.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_LOCI = int(os.environ.get("GPHOCS_RAGGED_LOCI", "4000"))
ITERS = int(os.environ.get("GPHOCS_RAGGED_ITERS", "12"))
BUCKETS = int(os.environ.get("GPHOCS_RAGGED_BUCKETS", "4"))


def main():
    import jax
    import jax.numpy as jnp

    from gphocs_tpu.config import parse_control_text
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.model import build_poptree
    from gphocs_tpu.rng_host import HostRng
    from gphocs_tpu.sampler.driver import Sampler
    from gphocs_tpu.sampler.init import sample_pop_parameters
    from tests.test_control import SAMPLE_CTL

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    path = f"/tmp/gphocs_ragged_{NUM_LOCI}.txt"
    cfg0 = parse_control_text(SAMPLE_CTL)
    tree = build_poptree(cfg0)
    if not os.path.exists(path):
        rs = np.random.RandomState(3)
        lens = rs.choice([100, 200, 400, 1000, 4000], size=NUM_LOCI,
                         p=[0.4, 0.25, 0.2, 0.1, 0.05])
        tp = sample_pop_parameters(tree, HostRng(NUM_LOCI + 1, 7))
        tp = tp._replace(theta=tp.theta * 150, tau=tp.tau * 150)
        simulate_seq_file(cfg0, tree, path, num_loci=NUM_LOCI,
                          seq_len=lens, seed=13, params=tp)

    rows = []
    for buckets in (1, BUCKETS):
        cfg = parse_control_text(SAMPLE_CTL)
        cfg.mcmc.random_seed = 11
        cfg.mcmc.start_mig = 0
        s = Sampler(cfg, seq_path=path, dtype=dtype, rng_mode="fast",
                    buckets=buckets)
        s.initialize()
        if buckets > 1:
            cells = sum(int(sq.leaf_base.shape[0] * sq.leaf_base.shape[2])
                        for sq in s.seqs)
            caps = [int(sq.leaf_base.shape[2]) for sq in s.seqs]
        else:
            cells = int(s.seq.leaf_base.shape[0] * s.seq.leaf_base.shape[2])
            caps = [int(s.seq.leaf_base.shape[2])]
        s.step_chunk(ITERS, do_migrate=True)
        jax.block_until_ready(s.params.theta)
        t0 = time.time()
        s.step_chunk(ITERS, do_migrate=True)
        jax.block_until_ready(s.params.theta)
        dt = (time.time() - t0) / ITERS
        rows.append(dict(buckets=buckets, pattern_cells=cells,
                         bucket_pattern_caps=caps,
                         ms_per_iter=round(dt * 1e3, 3)))
        print(rows[-1], flush=True)

    dense, buck = rows
    out = dict(device=str(jax.devices()[0]), num_loci=NUM_LOCI,
               iters=ITERS, rows=rows,
               cells_ratio=round(buck["pattern_cells"]
                                 / dense["pattern_cells"], 3),
               time_ratio=round(buck["ms_per_iter"]
                                / dense["ms_per_iter"], 3))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "RAGGED_r03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
