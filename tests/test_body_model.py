"""Body model tests: LBS forward vs an independently written numpy reference,
subset-forward exactness, hand-PCA expansion, jacobian sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import (
    SurfaceModel, make_synthetic_model, lbs_forward, fullpose_from_pose,
    forward_kinematics)
from moshpp_tpu.models.synthetic import save_synthetic_npz
from moshpp_tpu.io.model_loader import load_surface_model


def _np_rodrigues(rv):
    theta = np.linalg.norm(rv)
    if theta < 1e-12:
        return np.eye(3)
    k = rv / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _np_lbs(model, fullpose, betas, trans):
    """Straight-line numpy LBS (independent of the JAX implementation)."""
    nb = len(betas)
    v_shaped = np.asarray(model.v_template) + np.asarray(model.shapedirs)[..., :nb] @ betas
    joints = np.asarray(model.joint_template) + np.asarray(model.joint_shapedirs)[..., :nb] @ betas
    J = len(model.parents)
    rots = np.stack([_np_rodrigues(fullpose[3 * j:3 * j + 3]) for j in range(J)])
    pose_feat = (rots[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + np.asarray(model.posedirs) @ pose_feat

    G = np.zeros((J, 4, 4))
    G[0, :3, :3] = rots[0]; G[0, :3, 3] = joints[0]; G[0, 3, 3] = 1
    for k in range(1, J):
        local = np.eye(4)
        local[:3, :3] = rots[k]
        local[:3, 3] = joints[k] - joints[model.parents[k]]
        G[k] = G[model.parents[k]] @ local
    A = G.copy()
    for k in range(J):
        A[k, :3, 3] -= G[k, :3, :3] @ joints[k]
    W = np.asarray(model.weights)
    T = np.einsum("vj,jab->vab", W, A)
    verts = np.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3] + trans
    return verts


@pytest.fixture(scope="module")
def smplh_model():
    return make_synthetic_model("smplh", num_verts=600, seed=1)


class TestLBSForward:
    def test_matches_numpy_reference(self, smplh_model, rng):
        m = smplh_model
        pose = rng.normal(size=(m.pose_dof,)) * 0.3
        betas = rng.normal(size=(m.num_betas,)) * 1.0
        trans = rng.normal(size=(3,))
        fullpose = np.asarray(fullpose_from_pose(m, jnp.asarray(pose, jnp.float32)))
        got = np.asarray(lbs_forward(m, jnp.asarray(pose, jnp.float32),
                                     jnp.asarray(betas, jnp.float32),
                                     jnp.asarray(trans, jnp.float32)))
        want = _np_lbs(m, fullpose, betas.astype(np.float32), trans)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_zero_pose_is_shaped_template(self, smplh_model):
        m = smplh_model
        # zero hand-PCA still adds hands_mean rotations; zero the mean too
        import dataclasses
        m0 = dataclasses.replace(m, hands_mean=jnp.zeros_like(m.hands_mean))
        v = np.asarray(lbs_forward(m0, jnp.zeros(m.pose_dof), jnp.zeros(m.num_betas), jnp.zeros(3)))
        np.testing.assert_allclose(v, np.asarray(m.v_template), atol=1e-5)

    def test_subset_matches_full(self, smplh_model, rng):
        m = smplh_model
        vids = rng.choice(m.v_template.shape[0], 40, replace=False)
        sub = m.subset(vids)
        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)) * 0.4, jnp.float32)
        betas = jnp.asarray(rng.normal(size=(m.num_betas,)), jnp.float32)
        trans = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
        full = np.asarray(lbs_forward(m, pose, betas, trans))[vids]
        part = np.asarray(lbs_forward(sub, pose, betas, trans))
        np.testing.assert_allclose(part, full, atol=1e-6)

    def test_global_translation(self, smplh_model):
        m = smplh_model
        p = jnp.zeros(m.pose_dof)
        b = jnp.zeros(m.num_betas)
        v0 = np.asarray(lbs_forward(m, p, b, jnp.zeros(3)))
        v1 = np.asarray(lbs_forward(m, p, b, jnp.asarray([1.0, 2.0, 3.0])))
        np.testing.assert_allclose(
            v1 - v0, np.broadcast_to([1.0, 2.0, 3.0], v0.shape), atol=1e-6)

    def test_root_rotation_about_root_joint(self, smplh_model):
        # rotating only the root rotates the body rigidly about joint 0
        m = smplh_model
        pose = jnp.zeros(m.pose_dof).at[0].set(0.7)
        b = jnp.zeros(m.num_betas)
        v = np.asarray(lbs_forward(m, pose, b, jnp.zeros(3)))
        v0 = np.asarray(lbs_forward(m, jnp.zeros(m.pose_dof), b, jnp.zeros(3)))
        j0 = np.asarray(m.joint_template[0])
        R = _np_rodrigues(np.array([0.7, 0, 0]))
        np.testing.assert_allclose(v, (v0 - j0) @ R.T + j0, atol=1e-4)

    def test_jacfwd_finite(self, smplh_model):
        m = smplh_model
        f = lambda p: lbs_forward(m.subset(np.arange(20)), p, jnp.zeros(m.num_betas), jnp.zeros(3))
        J = np.asarray(jax.jacfwd(f)(jnp.zeros(m.pose_dof)))
        assert J.shape == (20, 3, m.pose_dof)
        assert np.all(np.isfinite(J))
        assert np.abs(J).max() > 0

    def test_vmap_over_frames(self, smplh_model, rng):
        m = smplh_model.subset(np.arange(30))
        poses = jnp.asarray(rng.normal(size=(5, m.pose_dof)) * 0.2, jnp.float32)
        betas = jnp.zeros(m.num_betas)
        trans = jnp.zeros((5, 3))
        batched = jax.vmap(lambda p, t: lbs_forward(m, p, betas, t))(poses, trans)
        for i in range(5):
            one = lbs_forward(m, poses[i], betas, trans[i])
            np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(one), atol=1e-6)


class TestHandPCA:
    def test_fullpose_layout(self, smplh_model, rng):
        m = smplh_model
        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)), jnp.float32)
        fp = np.asarray(fullpose_from_pose(m, pose))
        assert fp.shape == (m.fullpose_dof,)
        np.testing.assert_allclose(fp[:66], np.asarray(pose[:66]), atol=1e-6)
        want_hands = np.asarray(m.hands_mean) + np.asarray(pose[66:]) @ np.asarray(m.hands_components)
        np.testing.assert_allclose(fp[66:], want_hands, atol=1e-5)

    def test_mano(self, rng):
        m = make_synthetic_model("mano", num_verts=300, seed=2, dof_per_hand=6)
        assert m.pose_dof == 9
        assert m.fullpose_dof == 48
        v = lbs_forward(m, jnp.asarray(rng.normal(size=(9,)) * 0.1, jnp.float32),
                        jnp.zeros(m.num_betas), jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(v)))


class TestModelFamilies:
    @pytest.mark.parametrize("mt", ["smpl", "smplh", "smplx", "mano",
                                    "animal_horse", "animal_dog"])
    def test_forward_all_families(self, mt, rng):
        m = make_synthetic_model(mt, num_verts=300, seed=3)
        pose = jnp.asarray(rng.normal(size=(m.pose_dof,)) * 0.1, jnp.float32)
        v = lbs_forward(m, pose, jnp.zeros(m.num_betas), jnp.zeros(3))
        assert v.shape == (m.v_template.shape[0], 3)
        assert np.all(np.isfinite(np.asarray(v)))


class TestLoader:
    def test_npz_roundtrip(self, smplh_model, tmp_path, rng):
        path = str(tmp_path / "model.npz")
        save_synthetic_npz(smplh_model, path)
        loaded = load_surface_model(path, num_betas=smplh_model.num_betas,
                                    dof_per_hand=smplh_model.dof_per_hand)
        assert loaded.model_type == "smplh"
        assert loaded.parents == smplh_model.parents
        pose = jnp.asarray(rng.normal(size=(smplh_model.pose_dof,)) * 0.3, jnp.float32)
        v1 = np.asarray(lbs_forward(smplh_model, pose, jnp.zeros(16), jnp.zeros(3)))
        v2 = np.asarray(lbs_forward(loaded, pose, jnp.zeros(16), jnp.zeros(3)))
        np.testing.assert_allclose(v1, v2, atol=1e-6)

    def test_pkl_with_chumpy_shim(self, tmp_path, rng):
        # official SMPL pkls embed chumpy arrays; emulate that structure with
        # a stub chumpy module so pickling writes real `chumpy.Ch` references
        import pickle, sys, types
        ch_mod = types.ModuleType("chumpy")

        class Ch:
            def __init__(self, x):
                self.x = np.asarray(x)

        Ch.__module__ = "chumpy"
        Ch.__qualname__ = "Ch"
        ch_mod.Ch = Ch
        sys.modules["chumpy"] = ch_mod
        try:
            self._run_pkl_roundtrip(tmp_path, Ch)
        finally:
            del sys.modules["chumpy"]

    def _run_pkl_roundtrip(self, tmp_path, Ch):
        import pickle
        sm = make_synthetic_model("smpl", num_verts=200, seed=4)
        V = sm.v_template.shape[0]
        d = dict(
            v_template=Ch(np.asarray(sm.v_template)),
            shapedirs=Ch(np.asarray(sm.shapedirs)),
            posedirs=np.asarray(sm.posedirs),
            weights=np.asarray(sm.weights),
            J_regressor=np.eye(len(sm.parents), V),
            f=np.asarray(sm.faces),
            kintree_table=np.vstack([
                np.array([p if p >= 0 else 2**32 - 1 for p in sm.parents]),
                np.arange(len(sm.parents))]),
        )
        path = str(tmp_path / "model.pkl")
        with open(path, "wb") as fh:
            pickle.dump(d, fh)
        loaded = load_surface_model(path, num_betas=16)
        assert loaded.model_type == "smpl"
        np.testing.assert_allclose(np.asarray(loaded.v_template),
                                   np.asarray(sm.v_template), atol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded.joint_template),
                                   np.asarray(sm.v_template)[:len(sm.parents)], atol=1e-6)
