"""Robustifiers (reference: `scan2mesh/robustifiers.py:33-139`), JAX-native.

These operate on *signed squared* quantities coming out of the mesh-distance
ops and return least-squares-ready residual values.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def signed_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(|x|) * sign(x), with zero (not NaN/Inf) gradient at x = 0.

    Reference `SignedSqrt` (robustifiers.py:45-58) zeroes the derivative at 0
    explicitly; the epsilon-guarded form reproduces that without custom VJPs.
    """
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x) + _EPS)


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robustifier on a signed squared distance.

    gmof(x, s) = signed_sqrt( s^2 * x^2 / (s^2 + x^2) * sign(x) )
    (reference GMOf = SignedSqrt(GMOfInternal), robustifiers.py:33-96).
    """
    sq = x * x
    inner = (sigma * sigma) * sq / (sigma * sigma + sq) * jnp.sign(x)
    return signed_sqrt(inner)


def gmof_normalized(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Normalized Geman-McClure, output in [-1, 1] (robustifiers.py:97-139)."""
    sq = x * x
    inner = sq / (sigma * sigma + sq) * jnp.sign(x)
    return signed_sqrt(inner)
