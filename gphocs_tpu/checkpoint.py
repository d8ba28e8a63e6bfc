"""Checkpoint / resume.

The reference has no resume capability: a killed run keeps its flushed
trace but all sampler state is lost (SURVEY §5; the trace flush at
src/GPhoCS.c:1769 is the only persistence).  Here the complete sampler
state — genealogy tensors, parameters, both RNG streams, finetunes and
iteration counter — serializes to a single .npz, so runs resume exactly
(the state is the full Markov state; the resumed chain is bit-identical
to an uninterrupted one).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gphocs_tpu import rng as R
from gphocs_tpu.state import GenState, Params

_FORMAT_VERSION = 1


def save_checkpoint(sampler, path: str, iteration: int):
    """Serialize the sampler's dynamic state."""
    arrays = {}
    for name, val in sampler.gen._asdict().items():
        arrays[f"gen_{name}"] = np.asarray(val)
    for name, val in sampler.params._asdict().items():
        arrays[f"params_{name}"] = np.asarray(val)
    from gphocs_tpu.rng_fast import FastRngState

    for pfx, st in (("lrng", sampler.lrng), ("grng", sampler.grng)):
        if isinstance(st, FastRngState):
            arrays[f"{pfx}_key"] = np.asarray(st.key)
            arrays[f"{pfx}_ctr"] = np.asarray(st.ctr)
        else:
            arrays[f"{pfx}_x"] = np.asarray(st.x)
            arrays[f"{pfx}_y"] = np.asarray(st.y)
            arrays[f"{pfx}_z"] = np.asarray(st.z)
    arrays["lnld"] = np.asarray(sampler.lnld)
    arrays["lnp"] = np.asarray(sampler.lnp)
    # carried conditionals: derivable from (gen, seq) but saved verbatim so
    # a resumed chain is bit-identical to an uninterrupted one (a rebuild
    # may differ in the last ulp from the incrementally-maintained values)
    arrays["cond"] = np.asarray(sampler.cond)
    arrays["iteration"] = np.asarray(iteration)
    arrays["rate_var"] = np.asarray(sampler.rate_var)
    arrays["format_version"] = np.asarray(_FORMAT_VERSION)
    ft = {k: np.asarray([v.value, v.lo, v.hi])
          for k, v in sampler.ft_search.items()}
    for k, v in ft.items():
        arrays[f"ft_{k}"] = v
    arrays["ft_taus"] = np.asarray(
        [[t.value, t.lo, t.hi] for t in sampler.ft_taus])
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(sampler, path: str) -> int:
    """Restore state into an initialized sampler; returns the iteration to
    resume from."""
    import jax.numpy as jnp

    data = np.load(path)
    assert int(data["format_version"]) == _FORMAT_VERSION
    cast = lambda a: jnp.asarray(a)  # noqa: E731
    sampler.gen = GenState(**{
        name: cast(data[f"gen_{name}"]) for name in GenState._fields})
    sampler.params = Params(**{
        name: cast(data[f"params_{name}"]) for name in Params._fields})
    from gphocs_tpu.rng_fast import FastRngState

    def _load_rng(pfx):
        if f"{pfx}_key" in data:
            return FastRngState(key=cast(data[f"{pfx}_key"]),
                                ctr=cast(data[f"{pfx}_ctr"]))
        return R.RngState(x=cast(data[f"{pfx}_x"]),
                          y=cast(data[f"{pfx}_y"]),
                          z=cast(data[f"{pfx}_z"]))

    sampler.lrng = _load_rng("lrng")
    sampler.grng = _load_rng("grng")
    sampler.lnld = cast(data["lnld"])
    sampler.lnp = cast(data["lnp"])
    if "cond" in data:
        sampler.cond = cast(data["cond"])
    else:  # older checkpoints: rebuild from the genealogy + data
        from gphocs_tpu.ops.likelihood_cache import full_build

        sampler.cond = full_build(sampler.gen, sampler.seq)
    sampler.rate_var = float(data["rate_var"])
    for k, tracker in sampler.ft_search.items():
        v = data[f"ft_{k}"]
        tracker.value, tracker.lo, tracker.hi = map(float, v)
    for t, row in zip(sampler.ft_taus, data["ft_taus"]):
        t.value, t.lo, t.hi = map(float, row)
    sampler._update_ft_device()
    return int(data["iteration"])
