"""Counter-based per-locus RNG streams (production fast path).

The legacy streams (rng.py) replicate the reference's Wichmann-Hill AS183
state machine bit-for-bit, including its *sequential* quirks: Marsaglia
polar normals need a rejection `while_loop`, and masked lanes must not
advance.  Inside a jit-compiled MH sweep those while-loops dominate the
step latency on TPU (each trip is a dispatch-depth round).

This module provides a drop-in *statistical* replacement: a stateless
counter-based generator (splitmix/murmur3-style finalizer over
key[lane] ^ hash(counter)) where every draw is a fixed, loop-free bundle
of integer ops, and normals come from Box-Muller (no rejection).  The
consumption ORDER therefore differs from the reference — this is the
documented production deviation; the legacy mode remains the conformance
path (docs/DESIGN.md).  Quality: the double-fmix32 construction passes the
empirical moment/correlation tests in tests/test_rng.py::test_fast_rng_*
and is far stronger than the 15-bit AS183 it replaces.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FastRngState(NamedTuple):
    """Per-lane keys + a shared draw counter; advancing = ctr + 1."""

    key: jnp.ndarray   # [K] uint32
    ctr: jnp.ndarray   # [] uint32


_GOLDEN = jnp.uint32(0x9E3779B9)


def _fmix32(z: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: a full-avalanche 32-bit mix."""
    z = z ^ (z >> jnp.uint32(16))
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> jnp.uint32(13))
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> jnp.uint32(16))
    return z


def init_fast(num_slots: int, seed: int) -> FastRngState:
    key = jax.random.key(seed)
    bits = jax.random.bits(key, (num_slots,), dtype=jnp.uint32)
    # ensure distinct lanes even under adversarial bit collisions
    lane = jnp.arange(num_slots, dtype=jnp.uint32)
    return FastRngState(key=_fmix32(bits ^ _fmix32(lane * _GOLDEN)),
                        ctr=jnp.zeros((), jnp.uint32))


def _real_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _bits_to_unit(x: jnp.ndarray, dt) -> jnp.ndarray:
    """uint32 bits -> U(0,1) of dtype dt, never exactly 0 or 1.

    f32 path: exponent-bitcast construction ((x >> 9) | 0x3F800000 is a
    float in [1, 2); shift to the open interval by the exact-by-Sterbenz
    subtraction f - (1 - 2^-24)).  This form exists because Mosaic (the
    Pallas TPU compiler) has no uint32->f32 convert — the fused sweep
    kernels (ops/sweeps_pallas.py) reproduce it bit-for-bit.
    f64 path: midpoint lattice (x + 0.5) / 2^32.
    """
    if dt == jnp.float32 or jnp.dtype(dt) == jnp.dtype(jnp.float32):
        f = jax.lax.bitcast_convert_type(
            (x >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32)
        return f - jnp.float32(1.0 - 2.0 ** -24)
    return (x.astype(dt) + 0.5) * (2.0 ** -32)


def _raw_u(state: FastRngState, offset: int) -> jnp.ndarray:
    """U(0,1) for every lane at counter position ctr+offset (stateless)."""
    c = state.ctr + jnp.uint32(offset)
    x = _fmix32(state.key ^ _fmix32(c * _GOLDEN))
    return _bits_to_unit(x, _real_dtype())


def _bump(state: FastRngState, n: int) -> FastRngState:
    return state._replace(ctr=state.ctr + jnp.uint32(n))


def rndu(state: FastRngState, mask) -> Tuple[jnp.ndarray, FastRngState]:
    return _raw_u(state, 1), _bump(state, 1)


def rndnormal(state: FastRngState, mask) -> Tuple[jnp.ndarray, FastRngState]:
    """Standard normal via Box-Muller — loop-free."""
    u1 = _raw_u(state, 1)
    u2 = _raw_u(state, 2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2), _bump(state, 2)


# mixture-kernel constants (reference src/utils.c:437-441: m2s2 = 8)
_M2N = float(jnp.sqrt(8.0 / 9.0))
_S2N = float(jnp.sqrt(1.0 / 9.0))


def rnd2normal8(state: FastRngState, mask
                ) -> Tuple[jnp.ndarray, FastRngState]:
    n, state = rndnormal(state, mask)
    zval = _M2N + n * _S2N
    u = _raw_u(state, 1)
    state = _bump(state, 1)
    return jnp.where(u < 0.5, zval, -zval), state


def rndexp(state: FastRngState, mask, mean
           ) -> Tuple[jnp.ndarray, FastRngState]:
    u, state = rndu(state, mask)
    return -mean * jnp.log(u), state


def _raw_u_batch(state: FastRngState, n: int, offset: int) -> jnp.ndarray:
    """[n] uniforms from lane 0 at counter positions ctr+offset+0..n-1."""
    c = state.ctr + jnp.uint32(offset) + jnp.arange(n, dtype=jnp.uint32)
    x = _fmix32(state.key[0] ^ _fmix32(c * _GOLDEN))
    return _bits_to_unit(x, _real_dtype())


def batch_u(state: FastRngState, n: int) -> Tuple[jnp.ndarray, FastRngState]:
    """[n] U(0,1) draws from the (scalar) general stream in one step."""
    return _raw_u_batch(state, n, 1), _bump(state, n)


def batch_2normal8(state: FastRngState, n: int
                   ) -> Tuple[jnp.ndarray, FastRngState]:
    """[n] mixture-kernel draws from the general stream in one step."""
    u1 = _raw_u_batch(state, n, 1)
    u2 = _raw_u_batch(state, n, 1 + n)
    u3 = _raw_u_batch(state, n, 1 + 2 * n)
    nrm = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    zval = _M2N + nrm * _S2N
    return jnp.where(u3 < 0.5, zval, -zval), _bump(state, 3 * n)
