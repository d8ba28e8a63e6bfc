"""Small numeric utilities shared across kernels."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Safety slack used by the reference's reflect() (src/utils.c:337).
_REFLECT_SLACK = 1e-9


def reflect(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reflect x into the open interval (a, b), elementwise.

    Faithful vectorization of reference src/utils.c:333-398: shrink the
    interval by a slack of 1e-9 on both sides, return the midpoint if it
    becomes empty, fold by the doubled interval, and apply a final
    alternating-reflection fixup loop for numerical stragglers.
    """
    a = a + _REFLECT_SLACK
    b = b - _REFLECT_SLACK
    empty = b <= a
    # guard values so the arithmetic below stays finite on empty lanes
    a_s = jnp.where(empty, 0.0, a)
    b_s = jnp.where(empty, 1.0, b)
    inside = (x < b_s) & (x > a_s)

    xnew = jnp.where(x <= a_s, 2.0 * a_s - x, x)
    dbl = 2.0 * (b_s - a_s)
    xnew = xnew - dbl * jnp.floor((xnew - a_s) / dbl)
    xnew = jnp.where(xnew >= b_s, 2.0 * b_s - xnew, xnew)

    def cond(v):
        return jnp.any(~empty & ~inside & ((v <= a_s) | (v >= b_s)))

    def body(v):
        v = jnp.where(v >= b_s, 2.0 * b_s - v, v)
        v = jnp.where(v <= a_s, 2.0 * a_s - v, v)
        return v

    xnew = lax.while_loop(cond, body, xnew)
    return jnp.where(empty, (a + b) / 2.0, jnp.where(inside, x, xnew))


def log_gamma_density(alpha, beta, val):
    """log Gamma(alpha, beta) density (reference src/GPhoCS.c:860-866)."""
    logp = jnp.where(alpha != 1.0, -lax.lgamma(alpha), 0.0)
    return logp + alpha * jnp.log(beta) + (alpha - 1.0) * jnp.log(val) - beta * val
