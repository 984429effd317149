"""The solver's speed-critical custom derivative paths must match plain
autodiff of the naive formulation exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.models.body_model import _pose_blend
from moshpp_tpu.ops.rodrigues import rodrigues
from moshpp_tpu.priors import make_gmm_prior, gmm_prior_residual

# solver-compile-heavy: excluded from the fast pre-commit gate
# (pytest -m 'not slow'); the full suite remains the CI bar
pytestmark = pytest.mark.slow


def _naive_pose_blend(posedirs, fullpose):
    rot = rodrigues(fullpose.reshape(-1, 3))
    feat = (rot[1:] - jnp.eye(3, dtype=rot.dtype)).reshape(-1)
    return jnp.einsum("vcp,p->vc", posedirs, feat)


class TestPoseBlendJVP:
    def test_primal_matches_naive(self, rng):
        m = make_synthetic_model("smplh", num_verts=300, seed=2, dof_per_hand=6)
        fp = jnp.asarray(rng.normal(size=(m.fullpose_dof,)) * 0.4, jnp.float32)
        a = np.asarray(_pose_blend(m.posedirs, fp))
        b = np.asarray(_naive_pose_blend(m.posedirs, fp))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_jacobian_matches_naive(self, rng):
        m = make_synthetic_model("smpl", num_verts=200, seed=3)
        pd = m.posedirs[:40]
        fp = jnp.asarray(rng.normal(size=(m.fullpose_dof,)) * 0.5, jnp.float32)
        J_custom = np.asarray(jax.jacfwd(lambda p: _pose_blend(pd, p))(fp))
        J_naive = np.asarray(jax.jacfwd(lambda p: _naive_pose_blend(pd, p))(fp))
        np.testing.assert_allclose(J_custom, J_naive, atol=2e-5)

    def test_lbs_jacobian_matches_finite_diff(self, rng):
        m = make_synthetic_model("smplh", num_verts=250, seed=4,
                                 dof_per_hand=6).subset(np.arange(25))
        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)) * 0.3, jnp.float32)
        betas = jnp.zeros(m.num_betas)
        trans = jnp.zeros(3)

        f = lambda p: lbs_forward(m, p, betas, trans)
        J = np.asarray(jax.jacfwd(f)(pose))
        eps = 1e-3
        for i in [0, 5, 33, m.pose_dof - 1]:
            pp = pose.at[i].add(eps)
            pm = pose.at[i].add(-eps)
            fd = (np.asarray(f(pp)) - np.asarray(f(pm))) / (2 * eps)
            np.testing.assert_allclose(J[..., i], fd, atol=5e-3)


class TestSparseSkinning:
    def test_matches_dense(self, rng):
        import dataclasses
        m = make_synthetic_model("smplh", num_verts=300, seed=5, dof_per_hand=6)
        dense = dataclasses.replace(m, skin_k=0)
        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)) * 0.4, jnp.float32)
        betas = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
        trans = jnp.asarray([0.1, 0.2, 0.3])
        v_sparse = np.asarray(lbs_forward(m, pose, betas, trans))
        v_dense = np.asarray(lbs_forward(dense, pose, betas, trans))
        np.testing.assert_allclose(v_sparse, v_dense, atol=1e-6)


class TestGMMSelectedTangent:
    def test_gradient_matches_dense_formulation(self, rng):
        prior = make_gmm_prior(dim=12, num_components=5, seed=6)
        x = jnp.asarray(rng.normal(size=(12,)), jnp.float32)

        def dense_residual(x):
            diff = x[None, :] - prior.means
            r = jnp.sqrt(0.5) * jnp.einsum("kd,kde->ke", diff, prior.chols)
            en = jnp.sum(r * r, -1) + prior.sqrt_neg_log_w ** 2
            k = jax.lax.stop_gradient(jnp.argmin(en))
            return jnp.concatenate([r[k], prior.sqrt_neg_log_w[k][None]])

        np.testing.assert_allclose(np.asarray(gmm_prior_residual(prior, x)),
                                   np.asarray(dense_residual(x)), atol=1e-6)
        J1 = np.asarray(jax.jacfwd(lambda v: gmm_prior_residual(prior, v))(x))
        J2 = np.asarray(jax.jacfwd(dense_residual)(x))
        np.testing.assert_allclose(J1, J2, atol=1e-6)


class TestAnalyticLBSJacobian:
    """The closed-form stage-ii Jacobian (ops/lbs_jacobian.py) must match
    plain jacfwd of the forward chain to float32 accuracy, for every model
    family it serves."""

    @pytest.mark.parametrize("model_type,dof_per_hand",
                             [("smpl", 0), ("smplh", 12), ("smplx", 6),
                              ("mano", 12), ("animal_horse", 0)])
    def test_verts_jacobian_matches_jacfwd(self, rng, model_type, dof_per_hand):
        from moshpp_tpu.ops.lbs_jacobian import lbs_verts_and_jacobian

        kw = {"dof_per_hand": dof_per_hand} if dof_per_hand else {}
        m = make_synthetic_model(model_type, num_verts=200, seed=7, **kw)
        m = m.subset(np.arange(0, 180, 6))  # vertex-subsetted, like the solver
        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)) * 0.4, jnp.float32)
        betas = jnp.asarray(rng.normal(size=(m.num_betas,)) * 0.3, jnp.float32)
        trans = jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32)

        verts, J = lbs_verts_and_jacobian(m, pose, betas, trans)
        ref_verts = lbs_forward(m, pose, betas, trans)
        np.testing.assert_allclose(np.asarray(verts), np.asarray(ref_verts),
                                   atol=1e-6)

        def fwd(x):
            return lbs_forward(m, x[3:], betas, x[:3])
        x = jnp.concatenate([trans, pose])
        J_ref = np.asarray(jax.jacfwd(fwd)(x))
        np.testing.assert_allclose(np.asarray(J), J_ref, atol=3e-5)

    def test_markers_jacobian_matches_jacfwd(self, rng):
        from moshpp_tpu.ops.lbs_jacobian import (lbs_verts_and_jacobian,
                                                 markers_and_jacobian)
        from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                                     reconstruct_markers,
                                                     select_frame_indices)

        m = make_synthetic_model("smplh", num_verts=300, seed=8, dof_per_hand=6)
        betas = jnp.asarray(rng.normal(size=16) * 0.3, jnp.float32)
        can_v = m.v_template + jnp.einsum("vcb,b->vc", m.shapedirs[..., :16],
                                          betas)
        vids = rng.choice(can_v.shape[0], 12, replace=False)
        latents = can_v[jnp.asarray(vids)] + 0.01
        idx = select_frame_indices(can_v, latents)
        coeffs = marker_coeffs(can_v, latents, idx)

        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)) * 0.4, jnp.float32)
        trans = jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32)
        x = jnp.concatenate([trans, pose])

        verts, Jv = lbs_verts_and_jacobian(m, pose, betas, trans)
        sim, Jm = markers_and_jacobian(verts, Jv, idx, coeffs)

        def fwd(xx):
            v = lbs_forward(m, xx[3:], betas, xx[:3])
            return reconstruct_markers(v, idx, coeffs)

        np.testing.assert_allclose(np.asarray(sim), np.asarray(fwd(x)),
                                   atol=1e-6)
        J_ref = np.asarray(jax.jacfwd(fwd)(x))
        np.testing.assert_allclose(np.asarray(Jm), J_ref, atol=3e-5)

    def test_vmaps_over_frames(self, rng):
        from moshpp_tpu.ops.lbs_jacobian import lbs_verts_and_jacobian

        m = make_synthetic_model("smpl", num_verts=150, seed=9)
        betas = jnp.zeros(16)
        poses = jnp.asarray(rng.normal(size=(4, m.pose_dof)) * 0.3, jnp.float32)
        trans = jnp.asarray(rng.normal(size=(4, 3)) * 0.1, jnp.float32)
        out = jax.vmap(lambda p, t: lbs_verts_and_jacobian(m, p, betas, t))(
            poses, trans)
        assert out.verts.shape == (4, m.v_template.shape[0], 3)
        assert out.jac.shape == (4, m.v_template.shape[0], 3, 3 + m.pose_dof)
        single = lbs_verts_and_jacobian(m, poses[1], betas, trans[1])
        np.testing.assert_allclose(np.asarray(out.jac[1]),
                                   np.asarray(single.jac), atol=1e-6)
