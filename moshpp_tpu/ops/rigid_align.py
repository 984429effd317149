"""Weighted Kabsch/Arun rigid alignment (reference:
`rigid_transformations.py:39-83`), jittable.

The reference NaN-guards missing observations by copying source points over
them (rigid_transformations.py:52); here missing markers are handled with a
weight vector, which is exact rather than a hack and vmaps over frames.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

_EPS = 1e-12


def kabsch(src: jnp.ndarray, dst: jnp.ndarray,
           weights: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares rigid transform: R @ src + t ~= dst.

    Args:
      src, dst: (N, 3) point sets.
      weights: optional (N,) nonnegative weights (0 = ignore the pair).

    Returns: (R (3,3), t (3,)); proper rotation (det +1, reflection fixed).
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    w = weights[:, None]
    wsum = jnp.sum(weights) + _EPS
    src_mean = jnp.sum(src * w, axis=0) / wsum
    dst_mean = jnp.sum(dst * w, axis=0) / wsum
    a = src - src_mean
    b = dst - dst_mean

    c = (a * w).T @ b  # (3, 3) covariance, src -> dst
    u, s, vt = jnp.linalg.svd(c, full_matrices=False)
    det = jnp.linalg.det(vt.T @ u.T)
    d = jnp.array([1.0, 1.0, 0.0], src.dtype) + jnp.array([0.0, 0.0, 1.0], src.dtype) * det
    rot = (vt.T * d[None, :]) @ u.T
    t = dst_mean - rot @ src_mean
    return rot, t
