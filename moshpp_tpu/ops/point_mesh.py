"""Differentiable point-to-mesh (signed) distance, pure XLA.

Replaces the reference's native stack — CGAL AABB tree nearest queries
(`scan2mesh/mesh_distance_main.py:321-395`) + Cython/Eigen/OpenMP analytic
distance Jacobians (`mesh_distance/sample2meshdist.pyx`, `.h`) — with a
vectorized clamped-barycentric closest-point computation:

* nearest primitive search = dense distance over all (or centroid-prefiltered
  top-k) triangles + argmin: at MoSh scales (~150 points x ~14k-21k faces)
  this is a trivial amount of VPU work and beats tree traversal on TPU;
* part classification (interior / edge / vertex, sample2meshdist.h:195-206)
  falls out of the barycentric zero-pattern;
* derivatives come from jax.grad through the (piecewise-smooth) projection —
  equal to the reference's fixed-part analytic Jacobians within each region;
* the sign convention matches mesh_distance_main.py:266-297: direction from
  the face normal (interior), the vertex normal (vertex), or the sum of the
  two edge-endpoint vertex normals (edge).

All divisions are epsilon-guarded with the double-where pattern so no NaN
leaks into gradients from inactive branches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from moshpp_tpu.ops.surface import face_cross, vertex_normals

_EPS = 1e-12
_PART_EPS = 1e-7


def _safe_div(num, den):
    ok = jnp.abs(den) > _EPS
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def closest_point_on_triangles(points: jnp.ndarray,
                               tri_a: jnp.ndarray,
                               tri_b: jnp.ndarray,
                               tri_c: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coords (..., 3) of the closest point on each triangle.

    Broadcasts over leading dims: points and tri_{a,b,c} must have matching
    leading shapes (..., 3). Ericson's region method, branch-free.
    """
    ab = tri_b - tri_a
    ac = tri_c - tri_a
    ap = points - tri_a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = points - tri_b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = points - tri_c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    zeros = jnp.zeros_like(d1)
    ones = jnp.ones_like(d1)

    def bary(u, v, w):
        return jnp.stack([u, v, w], axis=-1)

    # interior
    denom = va + vb + vc
    v_in = _safe_div(vb, denom)
    w_in = _safe_div(vc, denom)
    out = bary(1.0 - v_in - w_in, v_in, w_in)

    # edge bc region
    in_bc = ((d4 - d3) >= 0) & ((d5 - d6) >= 0) & (va <= 0)
    w_bc = _safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    out = jnp.where(in_bc[..., None], bary(zeros, 1.0 - w_bc, w_bc), out)

    # edge ac region
    in_ac = (d2 >= 0) & (d6 <= 0) & (vb <= 0)
    w_ac = _safe_div(d2, d2 - d6)
    out = jnp.where(in_ac[..., None], bary(1.0 - w_ac, zeros, w_ac), out)

    # edge ab region
    in_ab = (d1 >= 0) & (d3 <= 0) & (vc <= 0)
    v_ab = _safe_div(d1, d1 - d3)
    out = jnp.where(in_ab[..., None], bary(1.0 - v_ab, v_ab, zeros), out)

    # vertex regions (checked last => highest priority)
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    out = jnp.where(in_c[..., None], bary(zeros, zeros, ones), out)
    out = jnp.where(in_b[..., None], bary(zeros, ones, zeros), out)
    out = jnp.where(in_a[..., None], bary(ones, zeros, zeros), out)
    return out


class NearestPrimitive(NamedTuple):
    """Nearest-surface query result for a batch of points (all (P,)-leading)."""
    tri_idx: jnp.ndarray     # (P,) int32 nearest triangle
    bary: jnp.ndarray        # (P, 3) clamped barycentric coords on it
    point: jnp.ndarray       # (P, 3) closest surface point
    sq_dist: jnp.ndarray     # (P,)


def nearest_on_mesh(points: jnp.ndarray,
                    verts: jnp.ndarray,
                    faces: jnp.ndarray,
                    prefilter_k: Optional[int] = 64) -> NearestPrimitive:
    """Nearest point on a triangle mesh per query point.

    `prefilter_k`: exact closest-point is evaluated only on the top-k faces
    by centroid distance (None = all faces). k ~ 64 is exact for all practical
    meshes here (a face closer than the best centroid-ranked 64 would need
    pathological sliver geometry).

    Integer outputs carry no gradient; `point` and `sq_dist` are
    differentiable wrt `points` and `verts`.
    """
    a_all = verts[faces[:, 0]]
    b_all = verts[faces[:, 1]]
    c_all = verts[faces[:, 2]]

    if prefilter_k is not None and prefilter_k < faces.shape[0]:
        centroids = (a_all + b_all + c_all) / 3.0
        pp = jnp.sum(centroids * centroids, axis=-1)
        d_cent = pp[None, :] - 2.0 * (points @ centroids.T)
        _, cand = jax.lax.top_k(-d_cent, prefilter_k)           # (P, k)
        a = a_all[cand]
        b = b_all[cand]
        c = c_all[cand]
        pts = points[:, None, :]
        bary = closest_point_on_triangles(pts, a, b, c)         # (P, k, 3)
        cp = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
        sq = jnp.sum((pts - cp) ** 2, axis=-1)                  # (P, k)
        best = jnp.argmin(sq, axis=-1)
        pidx = jnp.arange(points.shape[0])
        return NearestPrimitive(
            tri_idx=cand[pidx, best],
            bary=bary[pidx, best],
            point=cp[pidx, best],
            sq_dist=sq[pidx, best],
        )

    pts = points[:, None, :]
    bary = closest_point_on_triangles(pts, a_all[None], b_all[None], c_all[None])
    cp = (bary[..., 0:1] * a_all[None] + bary[..., 1:2] * b_all[None]
          + bary[..., 2:3] * c_all[None])
    sq = jnp.sum((pts - cp) ** 2, axis=-1)
    best = jnp.argmin(sq, axis=-1)
    pidx = jnp.arange(points.shape[0])
    return NearestPrimitive(tri_idx=best, bary=bary[pidx, best],
                            point=cp[pidx, best], sq_dist=sq[pidx, best])


def point_to_mesh_distance(points: jnp.ndarray, verts: jnp.ndarray,
                           faces: jnp.ndarray,
                           prefilter_k: Optional[int] = 64) -> jnp.ndarray:
    """Unsigned distances (P,) from points to the mesh surface."""
    near = nearest_on_mesh(points, verts, faces, prefilter_k)
    return jnp.sqrt(near.sq_dist + _EPS)


def signed_point_to_mesh_distance(points: jnp.ndarray, verts: jnp.ndarray,
                                  faces: jnp.ndarray,
                                  prefilter_k: Optional[int] = 64) -> jnp.ndarray:
    """Signed distances (P,): positive outside (along local normals).

    Sign = sign( (p - closest).n ) with n the part-matched normal
    (mesh_distance_main.py:266-297). Equivalent least-squares residual to the
    reference's SignedSqrt(signed squared distance) composition
    (PtsToMesh with rho=identity, signed=True — chmosh.py:69-80).
    """
    near = nearest_on_mesh(points, verts, faces, prefilter_k)
    fn = face_cross(verts, faces)          # unnormalized face normals
    vn = vertex_normals(verts, faces)
    tri = faces[near.tri_idx]              # (P, 3) corner vids

    on_corner = near.bary > _PART_EPS      # (P, 3) which corners support cp
    interior = jnp.all(on_corner, axis=-1)
    # edge/vertex: sum of supporting corners' vertex normals; interior: face n
    corner_n = jnp.einsum("pc,pcx->px", on_corner.astype(verts.dtype), vn[tri])
    normal = jnp.where(interior[:, None], fn[near.tri_idx], corner_n)

    diff = points - near.point
    sign = jnp.sign(jnp.sum(diff * jax.lax.stop_gradient(normal), axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return sign * jnp.sqrt(near.sq_dist + _EPS)
