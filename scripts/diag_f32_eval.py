"""Is the f32 Full-ld-ln shift an evaluation artifact or a sampling bias?

Runs a fused f32 chain on the golden config, and every SNAP iterations
compares the carried f32 lnld_sum against a float64 numpy re-evaluation
(tests/reference_impl.pruning_reference) of the SAME states.

  * f64(states) approximately -113835 (the f64-chain level)  ->  pure
    evaluation artifact of f32 arithmetic;
  * f64(states) approximately equal to the carried f32 values ->  the f32
    chain genuinely samples genealogies with higher data likelihood.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from diag_runner import ensure_data, SEQ, BURNIN  # noqa: E402
from golden_compare import CTL_TEMPLATE  # noqa: E402
from gphocs_tpu.config import parse_control_text  # noqa: E402
from gphocs_tpu.sampler.driver import Sampler  # noqa: E402
from tests.reference_impl import pruning_reference  # noqa: E402


def lnld_f64(sampler):
    gen = jax.tree_util.tree_map(np.asarray, sampler.gen)
    seq = jax.tree_util.tree_map(np.asarray, sampler.seq)
    out = np.zeros(gen.age.shape[0])
    for l in range(gen.age.shape[0]):
        out[l] = pruning_reference(
            gen.father[l], gen.lson[l], gen.rson[l],
            gen.age[l].astype(np.float64), int(gen.root[l]),
            float(gen.mut_rate[l]), seq.leaf_base[l], seq.group_id[l],
            seq.group_count[l].astype(np.float64),
            seq.group_nphases[l].astype(np.float64), seq.pattern_valid[l])
    return out


def main():
    ensure_data()
    ctl = CTL_TEMPLATE.format(seq=SEQ, trace="t.out", iters=8000,
                              burnin=BURNIN, seed=1357)
    cfg = parse_control_text(ctl)
    cfg.mcmc.random_seed = 4242
    s = Sampler(cfg, seq_path=SEQ, dtype=jnp.float32, rng_mode="fast")
    # on CPU the XLA fast-f32 path is the (bitwise-tested) twin of the
    # fused kernels; the diagnostic is identical
    s.initialize()
    s._sample_mig_rates_device()
    SNAP = 500
    for k in range(10):
        s.step_chunk(SNAP, do_migrate=True)
        f32_sum = float(jnp.sum(s.lnld))
        f64 = lnld_f64(s)
        d = np.asarray(s.lnld, np.float64) - f64
        print(f"iter {(k+1)*SNAP:5d}: carried_f32={f32_sum:14.3f} "
              f"f64_eval={f64.sum():14.3f} diff_sum={d.sum():8.3f} "
              f"max|d|={np.abs(d).max():.4g}", flush=True)


if __name__ == "__main__":
    main()
