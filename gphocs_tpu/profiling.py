"""Per-kernel timing — the analogue of the reference's method timers
(RECORD_METHOD_TIMES, src/MultiCoreUtils.h:30 + src/utils.c:233-326,
printMethodTimes).

`kernel_times(sampler, reps)` times each update family in isolation on the
sampler's current state (jit-compiled, block_until_ready), returning a
{name: seconds} dict.  The JAX profiler can be layered on top for full
traces: run under `jax.profiler.trace(logdir)`.
"""

from __future__ import annotations

import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp


def kernel_times(sampler, reps: int = 3) -> Dict[str, float]:
    from gphocs_tpu.kernels.common import full_stats, gen_log_prior
    from gphocs_tpu.kernels.mig_age import update_mig_ages
    from gphocs_tpu.kernels.mixing import update_mixing
    from gphocs_tpu.kernels.node_age import update_internal_node_ages
    from gphocs_tpu.kernels.scalar_params import update_thetas
    from gphocs_tpu.kernels.spr import update_spr
    from gphocs_tpu.kernels.tau import update_taus
    from gphocs_tpu.ops.pruning import data_log_likelihood

    s = sampler
    ft = s.ft
    stats = full_stats(s.gen, s.params, s.ctx)
    tree = s.tree
    cond = s.cond

    cases = {
        "pruning": (jax.jit(data_log_likelihood), (s.gen, s.seq)),
        "full_stats": (jax.jit(full_stats), (s.gen, s.params, s.ctx)),
        "node_age": (jax.jit(update_internal_node_ages),
                     (s.gen, s.params, s.seq, s.lrng, s.ctx, ft.coal_time,
                      s.lnld, s.lnp, cond)),
        "spr": (jax.jit(update_spr),
                (s.gen, s.params, s.seq, s.lrng, s.ctx, s.lnld, cond)),
        "theta": (jax.jit(update_thetas),
                  (s.gen, s.params, s.grng, s.ctx, ft.theta, s.lnp, stats)),
        "tau": (jax.jit(functools.partial(
            update_taus, num_pops=tree.num_pops,
            num_cur_pops=tree.num_cur_pops)),
            (s.gen, s.params, s.seq, s.grng, s.ctx, ft.taus, s.lnld, s.lnp,
             cond)),
        "mixing": (jax.jit(functools.partial(
            update_mixing, num_cur_pops=tree.num_cur_pops)),
            (s.gen, s.params, s.seq, s.grng, s.ctx, ft.mixing, s.lnld,
             s.lnp, cond, stats)),
    }
    if tree.num_bands > 0:
        cases["mig_age"] = (jax.jit(update_mig_ages),
                            (s.gen, s.params, s.lrng, s.ctx, ft.mig_time,
                             s.lnp))
    out = {}
    for name, (fn, args) in cases.items():
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
            jax.block_until_ready(r)
        out[name] = (time.time() - t0) / reps
    return out


def print_kernel_times(sampler, reps: int = 3):
    times = kernel_times(sampler, reps)
    total = sum(times.values())
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{name:<12} {t * 1e3:9.2f} ms  {100 * t / total:5.1f}%")
    return times
