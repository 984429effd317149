"""Scan<->mesh distance objectives (reference:
`scan2mesh/mesh_distance_main.py:37-227`).

`sample_from_mesh` reproduces the reference's samplers as index/barycentric
tables (instead of sparse point2sample matrices): vertices,
uniformly-from-vertices, edge-midpoints, uniformly-at-random. The distance
objectives return least-squares residual vectors:

  scan_to_mesh(scan_pts -> mesh)   distances from sampled scan points
  mesh_to_scan(mesh verts -> scan) distances from sampled mesh points
  pts_to_mesh                      identity sampler (the stage-i surf term)
  clamped_signed_pts_to_mesh       clamp(signed_d, a_min, a_max)

All use the vectorized closest-point machinery in `ops/point_mesh.py` (the
CGAL/Cython replacement) with optional Geman-McClure robustification.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.ops.point_mesh import (nearest_on_mesh,
                                       signed_point_to_mesh_distance)
from moshpp_tpu.ops.robustifiers import signed_sqrt


class MeshSampler(NamedTuple):
    """Points = sum_k bary[:, k] * verts[vert_ids[:, k]] — a static gather
    (the dense-tensor form of the reference's sparse point2sample)."""
    vert_ids: np.ndarray   # (S, 3) int
    bary: np.ndarray       # (S, 3)

    def sample(self, verts: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("skc,sk->sc", verts[self.vert_ids], jnp.asarray(self.bary))

    @property
    def num_samples(self) -> int:
        return self.vert_ids.shape[0]


def sample_from_mesh(verts: np.ndarray, faces: Optional[np.ndarray] = None,
                     sample_type: str = "uniformly-from-vertices",
                     num_samples: int = 10000,
                     vertex_indices_to_sample: Optional[np.ndarray] = None,
                     seed: int = 0) -> MeshSampler:
    rng = np.random.default_rng(seed)
    V = verts.shape[0]

    def from_vids(vids):
        ids = np.stack([vids, vids, vids], axis=1)
        bary = np.tile(np.array([[1.0, 0.0, 0.0]]), (len(vids), 1))
        return MeshSampler(vert_ids=ids, bary=bary)

    if sample_type == "vertices":
        vids = (np.arange(V) if vertex_indices_to_sample is None
                else np.asarray(vertex_indices_to_sample))
        return from_vids(vids)
    if sample_type == "uniformly-from-vertices":
        vids = rng.permutation(V)[: int(min(num_samples, V))]
        return from_vids(vids)
    if sample_type == "edge-midpoints":
        assert faces is not None
        f = np.asarray(faces)
        ids = np.concatenate([f[:, [0, 1, 2]], f[:, [1, 2, 0]], f[:, [2, 0, 1]]])
        bary = np.tile(np.array([[0.5, 0.5, 0.0]]), (len(ids), 1))
        return MeshSampler(vert_ids=ids, bary=bary)
    if sample_type == "uniformly-at-random":
        assert faces is not None
        f = np.asarray(faces)
        a, b, c = verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]]
        areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        tri = rng.choice(len(f), size=int(num_samples), p=areas / areas.sum())
        r = rng.random((int(num_samples), 2))
        flip = r.sum(1) > 1
        r[flip] = 1 - r[flip]
        bary = np.stack([1 - r[:, 0] - r[:, 1], r[:, 0], r[:, 1]], axis=1)
        return MeshSampler(vert_ids=f[tri], bary=bary)
    raise ValueError(f"unknown sample_type: {sample_type}")


def _distance_residual(points, ref_verts, ref_faces, rho, normalize, signed,
                       prefilter_k):
    n = points.shape[0]
    norm_const = jnp.sqrt(float(n)) if normalize else 1.0
    if signed:
        d = signed_point_to_mesh_distance(points, ref_verts, ref_faces,
                                          prefilter_k=prefilter_k)
        sq_signed = jnp.sign(d) * d * d
        return signed_sqrt(rho(sq_signed)) / norm_const
    near = nearest_on_mesh(points, ref_verts, ref_faces, prefilter_k=prefilter_k)
    return jnp.sqrt(rho(near.sq_dist) + 1e-12) / norm_const


def scan_to_mesh(scan_points: jnp.ndarray, mesh_verts: jnp.ndarray,
                 mesh_faces, rho: Callable = lambda x: x,
                 sampler: Optional[MeshSampler] = None,
                 normalize: bool = True, signed: bool = False,
                 prefilter_k: Optional[int] = 64) -> jnp.ndarray:
    """Residuals of (sampled) scan points against a mesh
    (ScanToMesh, mesh_distance_main.py:107-132)."""
    pts = sampler.sample(scan_points) if sampler is not None else scan_points
    return _distance_residual(pts, mesh_verts, mesh_faces, rho, normalize,
                              signed, prefilter_k)


def mesh_to_scan(mesh_verts: jnp.ndarray, scan_verts: jnp.ndarray,
                 scan_faces, sampler: Optional[MeshSampler] = None,
                 rho: Callable = lambda x: x, normalize: bool = True,
                 signed: bool = False,
                 prefilter_k: Optional[int] = 64) -> jnp.ndarray:
    """Residuals of (sampled) mesh points against a scan
    (MeshToScan, mesh_distance_main.py:135-157)."""
    pts = sampler.sample(mesh_verts) if sampler is not None else mesh_verts
    return _distance_residual(pts, scan_verts, scan_faces, rho, normalize,
                              signed, prefilter_k)


def pts_to_mesh(sample_verts: jnp.ndarray, reference_verts: jnp.ndarray,
                reference_faces, rho: Callable = lambda x: x,
                normalize: bool = True, signed: bool = False,
                prefilter_k: Optional[int] = 64) -> jnp.ndarray:
    """Identity-sampler point set vs mesh (PtsToMesh,
    mesh_distance_main.py:160-184) — the stage-i surface term's op."""
    return _distance_residual(sample_verts, reference_verts, reference_faces,
                              rho, normalize, signed, prefilter_k)


def clamped_signed_pts_to_mesh(sample_verts: jnp.ndarray,
                               reference_verts: jnp.ndarray,
                               reference_faces, a_min: float, a_max: float,
                               prefilter_k: Optional[int] = 64) -> jnp.ndarray:
    """Signed distance clamped to [a_min, a_max]; gradients vanish outside the
    band, matching ClampedSignedPtsToMesh (mesh_distance_main.py:187-217)."""
    d = signed_point_to_mesh_distance(sample_verts, reference_verts,
                                      reference_faces, prefilter_k=prefilter_k)
    return jnp.clip(d, a_min, a_max)
