"""Latent-marker local-frame transport (reference: `transformed_lm.py:45-162`).

A latent marker is stored as three projection coefficients onto a local
orthonormal frame built from its nearest canonical-body vertices; the same
frame recomputed on a *posed* body reconstructs the marker riding the skin.

  frame anchor  v0 = verts[c0]
  e1 = verts[c1] - v0,  e2 = verts[c2] - v0
  f1 = e1/|e1|, f2 = e1xe2/|e1xe2|, f3 = f1xf2
  coeffs = [(m - v0).f1, (m - v0).f2, (m - v0).f3]
  reconstruct(posed) = v0' + c1 f1' + c2 f2' + c3 f3'

Degenerate (collinear) neighbour triples fall back to the next nearest
neighbour — the reference does this with a global retry loop
(transformed_lm.py:95-100); here it is a branch-free per-marker first-valid
selection, identical in the non-degenerate case and strictly finer-grained
otherwise.

Neighbour indices are integers: gradients flow through vertex positions and
coefficients only (matching chumpy, which treats `closest` as data).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from moshpp_tpu.ops.knn import knn

_EPS = 1e-12
_DEGENERATE_CROSS_SQ = 1e-16


class MarkerFrameIndices(NamedTuple):
    """Per-marker vertex triple defining its local frame. (M, 3) int32."""
    c0: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray

    @property
    def stacked(self) -> jnp.ndarray:
        return jnp.stack([self.c0, self.c1, self.c2], axis=1)


def _normalize(x):
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + _EPS)


def _frames(verts: jnp.ndarray, idx: MarkerFrameIndices):
    v0 = verts[idx.c0]
    e1 = verts[idx.c1] - v0
    e2 = verts[idx.c2] - v0
    f1 = _normalize(e1)
    f2 = _normalize(jnp.cross(e1, e2))
    f3 = jnp.cross(f1, f2)
    return v0, f1, f2, f3


def select_frame_indices(can_verts: jnp.ndarray,
                         markers_latent: jnp.ndarray,
                         k: int = 8,
                         exclude_mask: Optional[jnp.ndarray] = None) -> MarkerFrameIndices:
    """Choose the frame vertex triple per marker from its k nearest vertices.

    c0, c1 are the two nearest; c2 is the nearest remaining neighbour whose
    edge is not collinear with e1 (transformed_lm.py:88-100 semantics).
    """
    nn_idx, _ = knn(markers_latent, can_verts, k=k, exclude_mask=exclude_mask)
    c0, c1 = nn_idx[:, 0], nn_idx[:, 1]
    v0 = can_verts[c0]
    e1 = can_verts[c1] - v0
    cand = can_verts[nn_idx[:, 2:]] - v0[:, None, :]        # (M, k-2, 3)
    cross = jnp.cross(e1[:, None, :], cand)
    ok = jnp.sum(cross * cross, axis=-1) > _DEGENERATE_CROSS_SQ  # (M, k-2)
    first_ok = jnp.argmax(ok, axis=-1)                       # 0 if none ok -> c2 = 3rd NN
    c2 = jnp.take_along_axis(nn_idx[:, 2:], first_ok[:, None], axis=1)[:, 0]
    return MarkerFrameIndices(c0=c0, c1=c1, c2=c2)


def marker_coeffs(can_verts: jnp.ndarray,
                  markers_latent: jnp.ndarray,
                  idx: MarkerFrameIndices) -> jnp.ndarray:
    """Projection coefficients (M, 3) of markers onto their local frames."""
    v0, f1, f2, f3 = _frames(can_verts, idx)
    diff = markers_latent - v0
    return jnp.stack(
        [jnp.sum(diff * f, axis=-1) for f in (f1, f2, f3)], axis=1)


def reconstruct_markers(posed_verts: jnp.ndarray,
                        idx: MarkerFrameIndices,
                        coeffs: jnp.ndarray) -> jnp.ndarray:
    """Marker positions (M, 3) on a posed body (TransformedLms,
    transformed_lm.py:120-162)."""
    v0, f1, f2, f3 = _frames(posed_verts, idx)
    return (v0 + coeffs[:, 0:1] * f1 + coeffs[:, 1:2] * f2 + coeffs[:, 2:3] * f3)


def transport_markers(can_verts: jnp.ndarray,
                      markers_latent: jnp.ndarray,
                      posed_verts: jnp.ndarray,
                      idx: MarkerFrameIndices) -> jnp.ndarray:
    """coeffs-on-canonical then reconstruct-on-posed in one call.

    This is the full TransformedCoeffs -> TransformedLms chain used in
    stage-i, where both the canonical body (via betas) and the latent marker
    positions are optimization variables (chmosh.py:182-191).
    """
    coeffs = marker_coeffs(can_verts, markers_latent, idx)
    return reconstruct_markers(posed_verts, idx, coeffs)
