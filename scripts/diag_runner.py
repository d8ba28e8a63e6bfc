"""Bias-bisect runner: run N gphocs_tpu chains of one configuration on the
shared golden dataset and dump per-chain posterior means to JSON.

Usage:
    JAX_PLATFORMS=... GPHOCS_FUSED=... python scripts/diag_runner.py \
        <name> <dtype f32|f64> <out.json> [n_chains] [iters]

The dataset (and control template) is exactly the golden-gate setup of
scripts/golden_compare.py (nl=80 loci, boost=8, seed 77), simulated once
into /tmp/gphocs_diag/seqs.txt and reused by every configuration so that
differences between configurations are attributable to the sampler alone.
"""
import json
import os
import sys

os.environ.setdefault("GPHOCS_GOLDEN_BACKEND", "keep")  # no platform override
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402

if __name__ == "__main__":
    name = sys.argv[1]
    dtype_s = sys.argv[2]
    out_path = sys.argv[3]
    n_chains = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 8000
else:
    name = dtype_s = out_path = None
    n_chains, iters = 0, 8000

if dtype_s == "f64":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from golden_compare import CTL_TEMPLATE  # noqa: E402
from gphocs_tpu.config import parse_control_text  # noqa: E402
from gphocs_tpu.model import build_poptree  # noqa: E402
from gphocs_tpu.sampler.driver import Sampler  # noqa: E402

NL = int(os.environ.get("GC_LOCI", "80"))
BURNIN = int(os.environ.get("GC_BURNIN", "1000"))
WORK = "/tmp/gphocs_diag"
SEQ = os.path.join(WORK, "seqs.txt")


def ensure_data():
    os.makedirs(WORK, exist_ok=True)
    if os.path.exists(SEQ):
        return
    from gphocs_tpu.io.simulate import simulate_seq_file
    from gphocs_tpu.rng_host import HostRng
    from gphocs_tpu.sampler.init import sample_pop_parameters

    ctl = CTL_TEMPLATE.format(seq=SEQ, trace="t.out", iters=iters,
                              burnin=BURNIN, seed=1357)
    cfg = parse_control_text(ctl)
    tree = build_poptree(cfg)
    _rng = HostRng(NL + 1, 77)
    tp = sample_pop_parameters(tree, _rng)
    tp = tp._replace(theta=tp.theta * 8.0, tau=tp.tau * 8.0)
    simulate_seq_file(cfg, tree, SEQ, num_loci=NL, seq_len=1000, seed=77,
                      params=tp)


def main():
    ensure_data()
    ctl = CTL_TEMPLATE.format(seq=SEQ, trace="t.out", iters=iters,
                              burnin=BURNIN, seed=1357)
    cfg = parse_control_text(ctl)
    dtype = jnp.float64 if dtype_s == "f64" else jnp.float32
    chains = []
    cols = None
    import time
    for ch in range(n_chains):
        cfg.mcmc.random_seed = 1357 + 17 * ch
        t0 = time.time()
        s = Sampler(cfg, seq_path=SEQ, dtype=dtype, rng_mode="fast")
        cols_j, rows_j = s.run()
        kj = rows_j[rows_j[:, 0] >= 0][rows_j.shape[0] // 3:]
        cols = cols_j
        chains.append(dict(mean=kj.mean(axis=0).tolist(),
                           std=kj.std(axis=0).tolist(),
                           n=int(kj.shape[0])))
        print(f"[{name}] chain {ch}: {time.time()-t0:.0f}s "
              f"fused={s.use_fused} backend={jax.default_backend()}",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(dict(name=name, cols=cols, chains=chains,
                       backend=jax.default_backend(), dtype=dtype_s,
                       fused=bool(s.use_fused), iters=iters, nl=NL), f)
    print(f"[{name}] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
