"""Vectorized per-locus RNG streams.

The reference keeps one Wichmann-Hill AS183 stream per locus plus one
"general" stream for global moves (reference: src/utils.c:400-617,
src/utils.h:33-66).  Random-walk proposals use `finetune * rnd2normal8()`,
a mixture of two normals N(+-m, s^2) with m^2+s^2=1, m^2/s^2=8
(reference: src/utils.c:482-495).

This module reimplements those streams as a single batched state of shape
[K] (K = num_loci + 1; the last slot is the general stream, mirroring
RAND_GENERAL_SLOT of src/utils.h:34) using uint32 arithmetic identical to
the C code — including its quirks:

  * all slots are seeded IDENTICALLY (reference src/utils.c:411-447
    initializes every slot with the same x=11, y=23, z=170*(seed%178)+137);
    streams diverge only through data-dependent consumption.  We replicate
    this in "legacy" mode for golden-trace conformance; `init_decorrelated`
    provides properly de-correlated per-locus seeds for production runs.
  * the AS183 update omits the classic negative-value correction and relies
    on unsigned wraparound (reference src/utils.c:504-517).

Every draw routine takes a boolean `mask` so that only active lanes consume
randomness — necessary to reproduce the C code's per-locus consumption
order (e.g. the MH accept draw is only consumed when lnacceptance < 0,
short-circuit at src/GPhoCS.c:2383).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gphocs_tpu.rng_fast import FastRngState
from gphocs_tpu import rng_fast as _fast


class RngState(NamedTuple):
    """Batched Wichmann-Hill state; each field has shape [K], dtype uint32."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


# Mixture-kernel constants (reference src/utils.c:437-441: m2s2=8).
_M2N = float(jnp.sqrt(8.0 / 9.0))
_S2N = float(jnp.sqrt(1.0 / 9.0))


def init_legacy(num_slots: int, seed: int) -> RngState:
    """Seed all slots identically, as the reference does (src/utils.c:411)."""
    seed = int(seed) & 0xFFFFFFFF
    z = (170 * (seed % 178) + 137) & 0xFFFFFFFF
    u32 = jnp.uint32
    return RngState(
        x=jnp.full((num_slots,), 11, dtype=u32),
        y=jnp.full((num_slots,), 23, dtype=u32),
        z=jnp.full((num_slots,), z, dtype=u32),
    )


def init_decorrelated(num_slots: int, seed: int) -> RngState:
    """Properly de-correlated per-slot streams (production mode).

    Derives per-slot (x, y, z) from jax.random bits; keeps the same WH
    update so downstream consumption logic is identical.
    """
    key = jax.random.key(seed)
    bits = jax.random.randint(
        key, (3, num_slots), minval=1, maxval=30000, dtype=jnp.int32
    ).astype(jnp.uint32)
    return RngState(x=bits[0], y=bits[1], z=bits[2])


def _wh_step(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray):
    """One AS183 step in uint32 arithmetic (reference src/utils.c:504-513)."""
    x = (jnp.uint32(171) * (x % jnp.uint32(177))
         - jnp.uint32(2) * (x // jnp.uint32(177)))
    y = (jnp.uint32(172) * (y % jnp.uint32(176))
         - jnp.uint32(35) * (y // jnp.uint32(176)))
    z = (jnp.uint32(170) * (z % jnp.uint32(178))
         - jnp.uint32(63) * (z // jnp.uint32(178)))
    return x, y, z


def _div(x: jnp.ndarray, d: float) -> jnp.ndarray:
    """f64 division with two Newton corrections.

    XLA CPU lowers f64 division to a reciprocal multiply with ~5e-9 relative
    error, which is far from IEEE correctly-rounded and breaks golden-stream
    parity with the C reference.  Two refinement steps bring the result back
    to <=1 ulp of the true quotient.
    """
    q = lax.optimization_barrier(x / d)
    q = lax.optimization_barrier(q + (x - q * d) / d)
    q = q + (x - q * d) / d
    return q


def rndu(state: RngState, mask: jnp.ndarray) -> Tuple[jnp.ndarray, RngState]:
    """U(0,1) draw on masked lanes; unmasked lanes do not advance.

    Returns (u [K] float64, new_state).  Matches reference rndu()
    including the `r - (int)r` fold (values are always >= 0 here).
    """
    if isinstance(state, FastRngState):
        return _fast.rndu(state, mask)
    nx, ny, nz = _wh_step(state.x, state.y, state.z)
    x = jnp.where(mask, nx, state.x)
    y = jnp.where(mask, ny, state.y)
    z = jnp.where(mask, nz, state.z)
    f = jnp.float64
    r = (_div(x.astype(f), 30269.0) + _div(y.astype(f), 30307.0)
         + _div(z.astype(f), 30323.0))
    r = r - jnp.trunc(r)
    return r, RngState(x, y, z)


def rndnormal(state: RngState, mask: jnp.ndarray) -> Tuple[jnp.ndarray, RngState]:
    """Standard normal via the Marsaglia-Bray polar method with per-lane
    rejection (reference src/utils.c:459-477).  Lanes still rejecting keep
    consuming pairs of uniforms; accepted/unmasked lanes stop."""
    if isinstance(state, FastRngState):
        return _fast.rndnormal(state, mask)

    def cond(carry):
        _, _, done = carry
        return jnp.any(mask & ~done)

    def body(carry):
        st, val, done = carry
        active = mask & ~done
        u, st = rndu(st, active)
        v, st = rndu(st, active)
        u = 2.0 * u - 1.0
        v = 2.0 * v - 1.0
        s = u * u + v * v
        ok = (s > 0.0) & (s < 1.0)
        s_safe = jnp.where(ok, s, 0.5)
        draw = u * jnp.sqrt(-2.0 * jnp.log(s_safe) / s_safe)
        val = jnp.where(active & ok, draw, val)
        done = done | (active & ok)
        return st, val, done

    init = (state, jnp.zeros(state.x.shape, jnp.float64), ~mask)
    state, val, _ = lax.while_loop(cond, body, init)
    return val, state


def rnd2normal8(state: RngState, mask: jnp.ndarray) -> Tuple[jnp.ndarray, RngState]:
    """Mixture-of-two-normals proposal kernel (reference src/utils.c:482-495)."""
    if isinstance(state, FastRngState):
        return _fast.rnd2normal8(state, mask)
    n, state = rndnormal(state, mask)
    zval = _M2N + n * _S2N
    u, state = rndu(state, mask)
    zval = jnp.where(u < 0.5, zval, -zval)
    return zval, state


def rndexp(state: RngState, mask: jnp.ndarray, mean: jnp.ndarray
           ) -> Tuple[jnp.ndarray, RngState]:
    """Exponential with given mean (reference src/utils.h:27)."""
    if isinstance(state, FastRngState):
        return _fast.rndexp(state, mask, mean)
    u, state = rndu(state, mask)
    return -mean * jnp.log(u), state


def general_draw_u(state: RngState, active=True) -> Tuple[jnp.ndarray, RngState]:
    """Scalar U(0,1) from a size-1 (general) stream."""
    n = (state.key if isinstance(state, FastRngState) else state.x).shape[0]
    m = jnp.full((n,), active, bool)
    u, state = rndu(state, m)
    return u[0], state


def general_draw_2normal8(state: RngState, active=True
                          ) -> Tuple[jnp.ndarray, RngState]:
    """Scalar rnd2normal8 from a size-1 (general) stream."""
    n = (state.key if isinstance(state, FastRngState) else state.x).shape[0]
    m = jnp.full((n,), active, bool)
    zval, state = rnd2normal8(state, m)
    return zval[0], state
