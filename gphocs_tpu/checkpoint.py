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

_FORMAT_VERSION = 2  # v2: conditionals carry the x4-per-node rescale


def save_checkpoint(sampler, path: str, iteration: int):
    """Serialize the sampler's dynamic state.

    Bucketed samplers (pattern-axis bucketing, sampler/bucketed.py) hold
    per-bucket state tuples; these serialize per bucket so a bucketed run
    resumes bit-identically too."""
    from gphocs_tpu.rng_fast import FastRngState

    arrays = {}
    buckets = getattr(sampler, "buckets", 1)
    arrays["n_buckets"] = np.asarray(buckets)
    if buckets > 1:
        for k in range(buckets):
            for name, val in sampler.gens[k]._asdict().items():
                arrays[f"b{k}_gen_{name}"] = np.asarray(val)
            arrays[f"b{k}_lrng_key"] = np.asarray(sampler.lrngs[k].key)
            arrays[f"b{k}_lrng_ctr"] = np.asarray(sampler.lrngs[k].ctr)
            arrays[f"b{k}_lnld"] = np.asarray(sampler.lnlds[k])
            arrays[f"b{k}_lnp"] = np.asarray(sampler.lnps[k])
            arrays[f"b{k}_cond"] = np.asarray(sampler.conds[k])
    else:
        for name, val in sampler.gen._asdict().items():
            arrays[f"gen_{name}"] = np.asarray(val)
        arrays["lnld"] = np.asarray(sampler.lnld)
        arrays["lnp"] = np.asarray(sampler.lnp)
        # carried conditionals: derivable from (gen, seq) but saved
        # verbatim so a resumed chain is bit-identical to an
        # uninterrupted one (a rebuild may differ in the last ulp from
        # the incrementally-maintained values)
        arrays["cond"] = np.asarray(sampler.cond)
    for name, val in sampler.params._asdict().items():
        arrays[f"params_{name}"] = np.asarray(val)

    rngs = [("grng", sampler.grng)]
    if buckets == 1:
        rngs.insert(0, ("lrng", sampler.lrng))
    for pfx, st in rngs:
        if isinstance(st, FastRngState):
            arrays[f"{pfx}_key"] = np.asarray(st.key)
            arrays[f"{pfx}_ctr"] = np.asarray(st.ctr)
        else:
            arrays[f"{pfx}_x"] = np.asarray(st.x)
            arrays[f"{pfx}_y"] = np.asarray(st.y)
            arrays[f"{pfx}_z"] = np.asarray(st.z)
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
    from gphocs_tpu.rng_fast import FastRngState

    def _load_rng(pfx):
        if f"{pfx}_key" in data:
            return FastRngState(key=cast(data[f"{pfx}_key"]),
                                ctr=cast(data[f"{pfx}_ctr"]))
        return R.RngState(x=cast(data[f"{pfx}_x"]),
                          y=cast(data[f"{pfx}_y"]),
                          z=cast(data[f"{pfx}_z"]))

    n_buckets = int(data["n_buckets"]) if "n_buckets" in data else 1
    sampler_buckets = getattr(sampler, "buckets", 1)
    if sampler_buckets != n_buckets:
        raise ValueError(
            f"checkpoint bucket count ({n_buckets}) does not match the "
            f"sampler ({sampler_buckets}); a non-bucketed checkpoint cannot "
            "resume a bucketed run (and vice versa)")
    sampler.params = Params(**{
        name: cast(data[f"params_{name}"]) for name in Params._fields})
    sampler.grng = _load_rng("grng")
    if n_buckets > 1:
        import jax.numpy as _jnp

        gens, lrngs, lnlds, lnps, conds = [], [], [], [], []
        for k in range(n_buckets):
            gens.append(GenState(**{
                name: cast(data[f"b{k}_gen_{name}"])
                for name in GenState._fields}))
            lrngs.append(FastRngState(key=cast(data[f"b{k}_lrng_key"]),
                                      ctr=cast(data[f"b{k}_lrng_ctr"])))
            lnlds.append(cast(data[f"b{k}_lnld"]))
            lnps.append(cast(data[f"b{k}_lnp"]))
            conds.append(cast(data[f"b{k}_cond"]))
        sampler.gens = tuple(gens)
        sampler.lrngs = tuple(lrngs)
        sampler.lnlds = tuple(lnlds)
        sampler.lnps = tuple(lnps)
        sampler.conds = tuple(conds)
        sampler.lnld = _jnp.concatenate(lnlds)
        sampler.lnp = _jnp.concatenate(lnps)
        sampler.cond = None
        sampler.rate_var = float(data["rate_var"])
        for k, tracker in sampler.ft_search.items():
            v = data[f"ft_{k}"]
            tracker.value, tracker.lo, tracker.hi = map(float, v)
        for t, row in zip(sampler.ft_taus, data["ft_taus"]):
            t.value, t.lo, t.hi = map(float, row)
        sampler._update_ft_device()
        return int(data["iteration"])
    sampler.gen = GenState(**{
        name: cast(data[f"gen_{name}"]) for name in GenState._fields})
    sampler.lrng = _load_rng("lrng")
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
