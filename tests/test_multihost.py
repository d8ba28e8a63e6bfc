"""Multi-process (jax.distributed) evidence: the loci-mesh sampler runs
across process boundaries and agrees with the single-process result.

Two subprocesses each expose 2 virtual CPU devices (4 global devices);
both initialize jax.distributed, build the global 'loci' mesh, shard the
state and run one full MCMC iteration.  The replicated outputs (parameter
vector + summed likelihoods) must be bit-identical across the two
processes (one global SPMD program) and match a single-process 4-device
run to reduction-order rounding (f64).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["GPHOCS_REPO"])
import jax
pid = int(os.environ["GPHOCS_PROC"])
nproc = int(os.environ["GPHOCS_NPROC"])
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=os.environ["GPHOCS_COORD"],
        num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
import __graft_entry__ as g
from gphocs_tpu.kernels.common import gen_log_prior
from gphocs_tpu.ops.pruning import data_log_likelihood
from gphocs_tpu.ops.likelihood_cache import full_build
from gphocs_tpu.parallel.mesh import make_mesh, replicated, shard_sampler_state
from gphocs_tpu.sampler.step import Finetunes, mcmc_iteration

devices = jax.devices()
assert len(devices) == 4, devices
mesh = make_mesh(devices)
num_loci = 16
cfg, tree, ctx, gen, params, seq, lrng, grng = g._tiny_setup(
    num_loci, dtype=jnp.float64)
lnld = data_log_likelihood(gen, seq)
lnp = gen_log_prior(gen, params, ctx)
gen, seq, lrng, lnld, lnp, params, grng = shard_sampler_state(
    mesh, gen, seq, lrng, lnld, lnp, params, grng)
ctx = jax.device_put(ctx, replicated(mesh))
cond = full_build(gen, seq)
dtype = gen.age.dtype
ft = Finetunes(
    coal_time=jnp.asarray(0.01, dtype), mig_time=jnp.asarray(0.3, dtype),
    theta=jnp.asarray(0.04, dtype), mig_rate=jnp.asarray(0.02, dtype),
    mixing=jnp.asarray(0.003, dtype), locus_rate=jnp.asarray(0.3, dtype),
    admix=jnp.asarray(0.05, dtype),
    taus=jnp.asarray([8e-7] * tree.num_pops, dtype))
ft = jax.device_put(ft, replicated(mesh))
out = mcmc_iteration(
    gen, params, seq, lrng, grng, lnld, lnp, cond, ft, ctx=ctx,
    genetree_samples=1, do_migrate=True, do_mixing=True,
    num_pops=tree.num_pops, num_cur_pops=tree.num_cur_pops,
    sample_age_mask=(False,) * tree.num_cur_pops)
params_out, stats = out[1], out[-1]
# replicated outputs are fully addressable on every process
vals = np.concatenate([np.asarray(params_out.theta, np.float64),
                       np.asarray(params_out.tau, np.float64),
                       [float(stats.lnld_sum), float(stats.lnp_sum)]])
print("RESULT", pid, " ".join(f"{v:.17g}" for v in vals), flush=True)
"""


def _clean_env(extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["GPHOCS_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.update(extra)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out: str):
    m = re.search(r"RESULT (\d+) (.*)", out)
    assert m, out[-2000:]
    return int(m.group(1)), np.array([float(x) for x in m.group(2).split()])


@pytest.mark.timeout(900)
def test_two_process_distributed_matches_single():
    script = os.path.join("/tmp", "gphocs_mh_worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = _clean_env({
            "GPHOCS_PROC": str(pid), "GPHOCS_NPROC": "2",
            "GPHOCS_COORD": f"127.0.0.1:{port}",
        })
        procs.append(subprocess.Popen(
            [sys.executable, script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=800)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    pid0, v0 = _parse(outs[0])
    pid1, v1 = _parse(outs[1])
    assert {pid0, pid1} == {0, 1}
    # the two processes compute one global program: bit-identical outputs
    np.testing.assert_array_equal(v0, v1)

    # single-process 4-device reference
    env = _clean_env({"GPHOCS_PROC": "0", "GPHOCS_NPROC": "1",
                      "XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
    res = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=800)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    _, vref = _parse(res.stdout)
    # cross-process collectives may reduce in a different order than the
    # single-process ones; f64 makes that rounding negligible relative to
    # any accept-decision threshold
    np.testing.assert_allclose(v0, vref, rtol=1e-9, atol=1e-12)
