"""Triangle/vertex normals (reference: `scan2mesh/ch_vert_normals.py`).

Vertex normals are area-weighted accumulations of incident face cross
products (the reference's faces-by-vertex sparse matmul,
ch_vert_normals.py:104-128) expressed as a segment_sum — fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)


def face_cross(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized face normals (2x face area), (F, 3)."""
    a = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - a
    e2 = verts[faces[:, 2]] - a
    return jnp.cross(e1, e2)


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    return _normalize(face_cross(verts, faces))


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals, (V, 3), unit length."""
    fc = face_cross(verts, faces)
    acc = jnp.zeros_like(verts)
    for c in range(3):
        acc = acc.at[faces[:, c]].add(fc)
    return _normalize(acc)
