"""Find the first structurally-corrupt genealogy in a fast-RNG chain.

Usage: python scripts/diag_f32_corrupt.py [f32|f64] [spr_on=1] [na_on=1]

Steps the XLA fast-RNG chain (the bitwise-tested twin of the fused TPU
kernels) in small chunks, running the vectorized checkAll analogue after
each; prints the first iteration with violations and the violation
classes.  Disabling kernels (spr_on/na_on) isolates the culprit.
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

dtype_s = sys.argv[1] if len(sys.argv) > 1 else "f32"
spr_on = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
na_on = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
if dtype_s == "f64":
    jax.config.update("jax_enable_x64", True)

from diag_runner import ensure_data, SEQ, BURNIN  # noqa: E402
from golden_compare import CTL_TEMPLATE  # noqa: E402
from gphocs_tpu.config import parse_control_text  # noqa: E402
from gphocs_tpu.debugcheck import check_gen_state  # noqa: E402
from gphocs_tpu.sampler.driver import Sampler  # noqa: E402
from gphocs_tpu.sampler.step import mcmc_iteration  # noqa: E402


def main():
    ensure_data()
    ctl = CTL_TEMPLATE.format(seq=SEQ, trace="t.out", iters=8000,
                              burnin=BURNIN, seed=1357)
    cfg = parse_control_text(ctl)
    cfg.mcmc.random_seed = 4242
    dt = jnp.float32 if dtype_s == "f32" else jnp.float64
    s = Sampler(cfg, seq_path=SEQ, dtype=dt, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()
    it = 0
    CH = 25
    while it < 2000:
        (s.gen, s.params, s.lrng, s.grng, s.lnld, s.lnp, s.cond,
         st) = mcmc_iteration(
            s.gen, s.params, s.seq, s.lrng, s.grng, s.lnld, s.lnp,
            s.cond, s.ft, ctx=s.ctx,
            genetree_samples=CH * 0 + 1, do_migrate=True, do_mixing=True,
            num_pops=s.tree.num_pops, num_cur_pops=s.tree.num_cur_pops,
            sample_age_mask=(False,) * s.tree.num_cur_pops,
            spr_on=spr_on, coal_time_on=na_on,
            use_fused=False)
        it += 1
        if it % CH == 0 or it < 5:
            # atol scaled for f32 rounding; benign ulp-level window
            # violations are expected, cycles / gross violations are not
            errs = check_gen_state(s.gen, s.params, s.tree, atol=1e-5)
            # explicit cycle check: follow fathers from every node
            fa = np.asarray(s.gen.father)
            L, N = fa.shape
            cyc = []
            for l in range(L):
                for v in range(N):
                    seen, cur = set(), v
                    while cur >= 0 and cur not in seen:
                        seen.add(cur)
                        cur = fa[l, cur]
                    if cur >= 0:
                        cyc.append((l, v))
                        break
            print(f"iter {it:5d}: {len(errs)} violations, "
                  f"{len(cyc)} cyclic loci "
                  f"{[c[0] for c in cyc[:5]]}", flush=True)
            if errs:
                for e in errs[:8]:
                    print("   ", e, flush=True)
            if errs or cyc:
                print("FIRST CORRUPTION at iter", it)
                np.savez("/tmp/corrupt_state.npz",
                         **{k: np.asarray(v) for k, v in
                            s.gen._asdict().items()},
                         tau=np.asarray(s.params.tau))
                return


if __name__ == "__main__":
    main()
