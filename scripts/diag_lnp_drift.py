"""Which update family drifts the carried lnp in f32? Toggle kernels."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gphocs_tpu.config import parse_control_text
from gphocs_tpu.kernels.common import gen_log_prior
from gphocs_tpu.model import build_poptree
from gphocs_tpu.sampler.driver import Sampler
from gphocs_tpu.sampler.step import mcmc_iteration
from tests.test_control import SAMPLE_CTL


def run(flags):
    from gphocs_tpu.io.simulate import simulate_seq_file

    path = "/tmp/lnp_drift_seqs.txt"
    if not os.path.exists(path):
        cfg0 = parse_control_text(SAMPLE_CTL)
        simulate_seq_file(cfg0, build_poptree(cfg0), path, num_loci=40,
                          seq_len=300, seed=7)
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 4242
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float32, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()
    kw = dict(genetree_samples=1, do_migrate=True, do_mixing=True,
              num_pops=s.tree.num_pops, num_cur_pops=s.tree.num_cur_pops,
              sample_age_mask=(False,) * s.tree.num_cur_pops,
              use_fused=False)
    kw.update(flags)
    for _ in range(100):
        (s.gen, s.params, s.lrng, s.grng, s.lnld, s.lnp, s.cond,
         _st) = mcmc_iteration(s.gen, s.params, s.seq, s.lrng, s.grng,
                               s.lnld, s.lnp, s.cond, s.ft, ctx=s.ctx, **kw)
    lnp2 = gen_log_prior(s.gen, s.params, s.ctx)
    d = np.abs(np.asarray(s.lnp - lnp2))
    nmig = int(jnp.sum(s.gen.mig_branch >= 0))
    print(f"{str(flags):<60} max|dlnp|={d.max():.5g} (migs={nmig})",
          flush=True)


if __name__ == "__main__" and os.environ.get("DEEP"):
    deep_mode = True
elif __name__ == "__main__":
    run(dict())
    run(dict(do_mixing=False))
    run(dict(theta_on=False))
    run(dict(mig_rate_on=False))
    run(dict(tau_on=False))
    run(dict(mig_time_on=False))
    run(dict(theta_on=False, mig_rate_on=False, do_mixing=False,
             tau_on=False))


def deep():
    from gphocs_tpu.io.simulate import simulate_seq_file

    path = "/tmp/lnp_drift_seqs.txt"
    cfg = parse_control_text(SAMPLE_CTL)
    cfg.mcmc.random_seed = 4242
    cfg.mcmc.start_mig = 0
    s = Sampler(cfg, seq_path=path, dtype=jnp.float32, rng_mode="fast")
    s.initialize()
    s._sample_mig_rates_device()
    kw = dict(genetree_samples=1, do_migrate=True, do_mixing=False,
              num_pops=s.tree.num_pops, num_cur_pops=s.tree.num_cur_pops,
              sample_age_mask=(False,) * s.tree.num_cur_pops,
              use_fused=False, theta_on=False, mig_rate_on=False,
              tau_on=False)
    for it in range(100):
        (s.gen, s.params, s.lrng, s.grng, s.lnld, s.lnp, s.cond,
         _st) = mcmc_iteration(s.gen, s.params, s.seq, s.lrng, s.grng,
                               s.lnld, s.lnp, s.cond, s.ft, ctx=s.ctx, **kw)
        lnp_plain = gen_log_prior(s.gen, s.params, s.ctx)
        lnp_jit = jax.jit(gen_log_prior)(s.gen, s.params, s.ctx)
        d1 = float(jnp.max(jnp.abs(s.lnp - lnp_plain)))
        d2 = float(jnp.max(jnp.abs(lnp_jit - lnp_plain)))
        if d1 > 1e-3 or it == 99:
            li = int(jnp.argmax(jnp.abs(s.lnp - lnp_plain)))
            print(f"it {it}: carried-vs-plain={d1:.5g} jit-vs-plain={d2:.5g}"
                  f" worst locus {li}: carried={float(s.lnp[li]):.6f} "
                  f"plain={float(lnp_plain[li]):.6f}", flush=True)
            if d1 > 1e-3:
                # pop labels vs windows of the worst locus
                import numpy as np
                age = np.asarray(s.gen.age[li])
                npp = np.asarray(s.gen.node_pop[li])
                tau = np.asarray(s.params.tau)
                print("  age:", age, "\n  pop:", npp, "\n  tau:", tau,
                      flush=True)
                break


if __name__ == "__main__" and os.environ.get("DEEP"):
    deep()
