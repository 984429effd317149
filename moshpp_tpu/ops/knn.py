"""Brute-force k-nearest-neighbour queries as dense TPU ops.

Replaces the reference's sklearn kd-trees (`transformed_lm.py:73`,
`chmosh.py:422-431`): at MoSh scales (<= ~10.5k vertices x ~150 queries) a
dense distance matrix + top_k is faster on an MXU than any tree, and it is
jit/vmap-differentiation friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _sq_dists(queries: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    # |q - p|^2 = |q|^2 - 2 q.p + |p|^2 ; the q.p term rides the MXU
    qq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    pp = jnp.sum(points * points, axis=-1)
    return qq - 2.0 * (queries @ points.T) + pp[None, :]


def knn(queries: jnp.ndarray, points: jnp.ndarray, k: int,
        exclude_mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points for each query.

    Args:
      queries: (Q, 3); points: (P, 3).
      exclude_mask: optional (P,) bool — True entries are never returned
        (used to drop SMPL-X eyeball vertices, reference transformed_lm.py:49).

    Returns:
      (indices (Q, k) int32, sq_dists (Q, k)) sorted ascending by distance.
    """
    d = _sq_dists(queries, points)
    if exclude_mask is not None:
        d = jnp.where(exclude_mask[None, :], jnp.inf, d)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d


def nearest_vertex(queries: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Index of the single nearest point per query (kd-tree snap replacement,
    reference chmosh.py:422-431)."""
    return jnp.argmin(_sq_dists(queries, points), axis=-1)
