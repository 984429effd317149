"""Unit tests for the differentiable geometry ops, against independent numpy
references and finite differences (mirroring the intent of the reference's
exported point-primitive test functions, sample2meshdist.pyx:154-175)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.ops import (
    rodrigues, rodrigues_inverse, kabsch, face_normals, vertex_normals,
    knn, nearest_vertex, gmof, signed_sqrt,
    closest_point_on_triangles, point_to_mesh_distance,
    signed_point_to_mesh_distance,
)
from moshpp_tpu.ops.marker_transform import (
    select_frame_indices, marker_coeffs, reconstruct_markers)
from moshpp_tpu.models.synthetic import icosphere


def _np_rodrigues(rv):
    theta = np.linalg.norm(rv)
    if theta < 1e-12:
        return np.eye(3)
    k = rv / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class TestRodrigues:
    def test_matches_numpy_reference(self, rng):
        rv = rng.normal(size=(50, 3)) * 2.0
        got = np.asarray(rodrigues(jnp.asarray(rv)))
        for i in range(50):
            np.testing.assert_allclose(got[i], _np_rodrigues(rv[i]), atol=1e-5)

    def test_zero_angle_identity_and_grad_finite(self):
        r = rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-6)
        g = jax.jacfwd(rodrigues)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        # d R / d rv at 0 is the skew generator set
        expected = np.zeros((3, 3, 3))
        for a in range(3):
            e = np.zeros(3); e[a] = 1
            K = np.array([[0, -e[2], e[1]], [e[2], 0, -e[0]], [-e[1], e[0], 0]])
            expected[:, :, a] = K
        np.testing.assert_allclose(np.asarray(g), expected, atol=1e-3)

    def test_roundtrip(self, rng):
        rv = rng.normal(size=(30, 3))
        rv = rv / np.linalg.norm(rv, axis=1, keepdims=True) * rng.uniform(0.01, 3.0, (30, 1))
        back = np.asarray(rodrigues_inverse(rodrigues(jnp.asarray(rv))))
        np.testing.assert_allclose(back, rv, atol=1e-4)


class TestKabsch:
    def test_recovers_exact_transform(self, rng):
        src = rng.normal(size=(20, 3))
        R_true = _np_rodrigues(np.array([0.3, -1.2, 0.8]))
        t_true = np.array([0.5, -0.2, 1.0])
        dst = src @ R_true.T + t_true
        R, t = kabsch(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)

    def test_weights_ignore_outliers(self, rng):
        src = rng.normal(size=(20, 3))
        R_true = _np_rodrigues(np.array([0.1, 0.4, -0.2]))
        dst = src @ R_true.T
        dst_corrupt = dst.copy()
        dst_corrupt[0] = 100.0
        w = np.ones(20); w[0] = 0.0
        R, t = kabsch(jnp.asarray(src), jnp.asarray(dst_corrupt), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-5)

    def test_reflection_fixed(self, rng):
        src = rng.normal(size=(10, 3))
        dst = src.copy()
        dst[:, 2] *= -1  # mirrored — best proper rotation still has det +1
        R, _ = kabsch(jnp.asarray(src), jnp.asarray(dst))
        assert np.linalg.det(np.asarray(R)) > 0.99


class TestNormalsAndKnn:
    def test_sphere_normals_radial(self):
        v, f = icosphere(2)
        vn = np.asarray(vertex_normals(jnp.asarray(v), jnp.asarray(f)))
        cos = np.sum(vn * v, axis=1)
        assert np.all(cos > 0.99)

    def test_knn_matches_numpy(self, rng):
        pts = rng.normal(size=(200, 3))
        q = rng.normal(size=(7, 3))
        idx, d = knn(jnp.asarray(q), jnp.asarray(pts), k=5)
        full = np.linalg.norm(q[:, None] - pts[None], axis=-1) ** 2
        expect = np.argsort(full, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(idx), expect)

    def test_knn_exclude_mask(self, rng):
        pts = rng.normal(size=(50, 3))
        q = pts[:3] + 1e-4
        mask = np.zeros(50, bool); mask[:3] = True
        idx, _ = knn(jnp.asarray(q), jnp.asarray(pts), k=3, exclude_mask=jnp.asarray(mask))
        assert not np.any(np.isin(np.asarray(idx), [0, 1, 2]))

    def test_nearest_vertex(self, rng):
        pts = rng.normal(size=(100, 3))
        q = pts[17] + 1e-5
        assert int(nearest_vertex(jnp.asarray(q[None]), jnp.asarray(pts))[0]) == 17


def _brute_closest(p, a, b, c, n=400):
    # dense barycentric sampling reference
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u)
    m = uu + vv <= 1.0
    uu, vv = uu[m], vv[m]
    pts = (1 - uu - vv)[:, None] * a + uu[:, None] * b + vv[:, None] * c
    d = np.linalg.norm(pts - p, axis=1)
    return d.min()


class TestPointMesh:
    def test_closest_point_vs_brute(self, rng):
        for _ in range(12):
            tri = rng.normal(size=(3, 3))
            p = rng.normal(size=(3,)) * 1.5
            bary = np.asarray(closest_point_on_triangles(
                jnp.asarray(p), jnp.asarray(tri[0]), jnp.asarray(tri[1]), jnp.asarray(tri[2])))
            cp = bary @ tri
            d = np.linalg.norm(cp - p)
            d_ref = _brute_closest(p, *tri)
            assert d <= d_ref + 2e-3
            assert np.all(bary >= -1e-6) and abs(bary.sum() - 1) < 1e-5

    def test_sphere_distance_analytic(self, rng):
        v, f = icosphere(4)
        pts = rng.normal(size=(40, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        radii = rng.uniform(0.3, 2.0, size=(40, 1))
        pts = pts * radii
        d = np.asarray(point_to_mesh_distance(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f)))
        # icosphere(4) approximates the unit sphere to ~1e-3
        np.testing.assert_allclose(d, np.abs(radii[:, 0] - 1.0), atol=5e-3)

    def test_signed_distance_sign(self, rng):
        v, f = icosphere(3)
        dirs = rng.normal(size=(20, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        outside = dirs * 1.5
        inside = dirs * 0.5
        d_out = np.asarray(signed_point_to_mesh_distance(jnp.asarray(outside), jnp.asarray(v), jnp.asarray(f)))
        d_in = np.asarray(signed_point_to_mesh_distance(jnp.asarray(inside), jnp.asarray(v), jnp.asarray(f)))
        assert np.all(d_out > 0)
        assert np.all(d_in < 0)

    def test_prefilter_matches_exhaustive(self, rng):
        v, f = icosphere(3)
        pts = rng.normal(size=(25, 3)) * 1.2
        d_pref = np.asarray(point_to_mesh_distance(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f), prefilter_k=32))
        d_full = np.asarray(point_to_mesh_distance(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f), prefilter_k=None))
        np.testing.assert_allclose(d_pref, d_full, atol=1e-6)

    def test_distance_gradient_finite_diff(self, rng):
        v, f = icosphere(2)
        pts = rng.normal(size=(3, 3)) * 1.3

        def loss(p):
            return jnp.sum(point_to_mesh_distance(p, jnp.asarray(v), jnp.asarray(f)) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(pts)))
        eps = 1e-4
        for i in range(2):
            for c in range(3):
                pp = pts.copy(); pp[i, c] += eps
                pm = pts.copy(); pm[i, c] -= eps
                fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (2 * eps)
                np.testing.assert_allclose(g[i, c], fd, atol=1e-2, rtol=1e-2)


class TestMarkerTransform:
    def test_roundtrip_on_same_body(self, rng):
        v, f = icosphere(3)
        vids = rng.choice(len(v), 12, replace=False)
        markers = v[vids] * 1.02  # slightly off-surface
        idx = select_frame_indices(jnp.asarray(v), jnp.asarray(markers))
        coeffs = marker_coeffs(jnp.asarray(v), jnp.asarray(markers), idx)
        rec = np.asarray(reconstruct_markers(jnp.asarray(v), idx, coeffs))
        np.testing.assert_allclose(rec, markers, atol=1e-5)

    def test_equivariant_under_rigid_motion(self, rng):
        v, f = icosphere(3)
        vids = rng.choice(len(v), 10, replace=False)
        markers = v[vids] * 1.05
        idx = select_frame_indices(jnp.asarray(v), jnp.asarray(markers))
        coeffs = marker_coeffs(jnp.asarray(v), jnp.asarray(markers), idx)
        R = _np_rodrigues(np.array([0.4, 0.9, -0.3]))
        t = np.array([1.0, 2.0, 3.0])
        v_posed = v @ R.T + t
        rec = np.asarray(reconstruct_markers(jnp.asarray(v_posed), idx, coeffs))
        np.testing.assert_allclose(rec, markers @ R.T + t, atol=1e-5)


class TestRobustifiers:
    def test_signed_sqrt(self):
        x = jnp.asarray([-4.0, 0.0, 9.0])
        np.testing.assert_allclose(np.asarray(signed_sqrt(x)), [-2, 0, 3], atol=1e-4)
        g = jax.grad(lambda v: signed_sqrt(v).sum())(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_gmof_bounded_by_sigma(self):
        x = jnp.linspace(-100, 100, 201)
        r = np.asarray(gmof(x, sigma=2.0))
        assert np.all(np.abs(r) <= 2.0 + 1e-5)
        # small-x behavior: gmof(x) ~ sign(x)*|x| for |x| << sigma
        small = np.asarray(gmof(jnp.asarray([0.01]), sigma=2.0))
        np.testing.assert_allclose(small, [0.01], rtol=0.05, atol=1e-3)


class TestSlerp:
    def test_quat_roundtrip(self, rng):
        from moshpp_tpu.ops.rodrigues import (axis_angle_to_quat,
                                              quat_to_axis_angle)
        aa = jnp.asarray(rng.normal(size=(20, 3)) * 1.2, jnp.float32)
        back = np.asarray(quat_to_axis_angle(axis_angle_to_quat(aa)))
        np.testing.assert_allclose(back, np.asarray(aa), atol=1e-5)

    def test_slerp_endpoints_and_geodesic(self, rng):
        from moshpp_tpu.ops.rodrigues import slerp_axis_angle, rodrigues
        a = jnp.asarray(rng.normal(size=(5, 3)) * 0.8, jnp.float32)
        b = jnp.asarray(rng.normal(size=(5, 3)) * 0.8, jnp.float32)
        np.testing.assert_allclose(np.asarray(slerp_axis_angle(a, b, 0.0)),
                                   np.asarray(a), atol=1e-5)
        # endpoint b: same rotation (possibly different aa representative)
        Rb = np.asarray(rodrigues(b))
        R1 = np.asarray(rodrigues(slerp_axis_angle(a, b, 1.0)))
        np.testing.assert_allclose(R1, Rb, atol=1e-5)

    def test_slerp_large_rotation_beats_lerp(self):
        """170-degree z-rotation: slerp midpoint is the 85-degree rotation;
        lerp of axis-angle through a flipped axis is badly wrong."""
        from moshpp_tpu.ops.rodrigues import slerp_axis_angle, rodrigues
        a = jnp.asarray([0.0, 0.0, 0.1], jnp.float32)
        b = jnp.asarray([0.0, 0.0, 0.1 + np.deg2rad(170)], jnp.float32)
        mid = slerp_axis_angle(a, b, 0.5)
        expect = np.asarray([0.0, 0.0, 0.1 + np.deg2rad(85)], np.float32)
        np.testing.assert_allclose(np.asarray(mid), expect, atol=1e-4)
