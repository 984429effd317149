"""DMPL splice, animal priors, head-marker correlation, dynamics solve."""

import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.models.synthetic import save_synthetic_npz
from moshpp_tpu.io.model_loader import load_surface_model
from moshpp_tpu.ops.marker_transform import (marker_coeffs, reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.pipeline.stageii import (StageIIOptions, mosh_stageii_solve,
                                         prepare_stageii_problem)
from moshpp_tpu.priors.mahalanobis import (MahalanobisPrior,
                                           horse_joint_angle_residual,
                                           mahalanobis_residual)

# solver-compile-heavy: excluded from the fast pre-commit gate
# (pytest -m 'not slow'); the full suite remains the CI bar
pytestmark = pytest.mark.slow


class TestDMPL:
    def test_loader_splices_columns(self, tmp_path, rng):
        # smpl (no hand-PCA mean): zero pose = identity rotations, so the
        # dmpl column displacement appears verbatim in the vertices
        m = make_synthetic_model("smpl", num_verts=300, seed=5, num_betas=16,
                                 num_shape_dirs=16)
        path = str(tmp_path / "m.npz")
        save_synthetic_npz(m, path)
        V = m.v_template.shape[0]
        eig = rng.normal(size=(V, 3, 8)).astype(np.float32) * 0.01
        dmpl_path = str(tmp_path / "dmpl.pkl")
        with open(dmpl_path, "wb") as f:
            pickle.dump({"eigvec": eig}, f)

        loaded = load_surface_model(path, num_betas=16, dmpl_fname=dmpl_path,
                                    num_dmpls=8)
        assert loaded.num_shape_dirs == 24
        np.testing.assert_allclose(np.asarray(loaded.shapedirs)[..., 16:24],
                                   eig, atol=1e-7)
        # dmpl coefficients displace vertices
        b = jnp.zeros(24).at[16].set(1.0)
        v1 = lbs_forward(loaded, jnp.zeros(loaded.pose_dof), b, jnp.zeros(3))
        v0 = lbs_forward(loaded, jnp.zeros(loaded.pose_dof), jnp.zeros(24), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(v1 - v0), eig[..., 0], atol=1e-5)

    def test_dynamics_solve_recovers_dmpls(self, rng):
        m = make_synthetic_model("smpl", num_verts=400, seed=6, num_betas=16,
                                 num_shape_dirs=24)
        # truth with nonzero dmpl coefficients (columns 16:24)
        M, F = 14, 6
        vids = rng.choice(400, M, replace=False)
        betas16 = (rng.normal(size=16) * 0.3).astype(np.float32)
        dmpls = (rng.normal(size=(F, 8)) * 0.5).astype(np.float32)
        can_v = np.asarray(m.v_template) + np.einsum(
            "vcb,b->vc", np.asarray(m.shapedirs)[..., :16], betas16)
        latents = can_v[vids]
        idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
        poses = (rng.normal(size=(F, m.pose_dof)) * 0.1).astype(np.float32)
        trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

        def sim(p, t, d):
            fb = jnp.concatenate([jnp.asarray(betas16), d])
            return reconstruct_markers(lbs_forward(m, p, fb, t), idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans),
                                       jnp.asarray(dmpls)))
        # 14 markers under-determine 66 pose + 8 dmpl dofs; as in any real
        # solve, the pose prior regularizes (smpl body prior is 69-dim)
        from moshpp_tpu.priors import make_gmm_prior
        prior = make_gmm_prior(dim=69, num_components=3, seed=9, scale=0.3)
        opts = StageIIOptions(maxiter=40, smoothing_sweeps=1,
                              optimize_dynamics=True, num_dmpls=8)
        prob = prepare_stageii_problem(m, betas16, latents, opts=opts)
        res = mosh_stageii_solve(prob, opts, obs, np.ones((F, M), bool),
                                 prior=prior, model_type="smpl")
        assert res.extra.shape == (F, 8)
        err_mm = np.asarray(res.data_err) * 1000
        assert err_mm.mean() < 3.5, f"dmpl solve err {err_mm.mean():.2f} mm"


class TestAnimalPriors:
    def test_horse_prior_callable_in_solver(self, rng):
        from moshpp_tpu.solver import DoglegOptions, dogleg_solve

        D = 81
        prior = MahalanobisPrior(mean=jnp.zeros(D), prec=jnp.eye(D) * 2.0)

        def prior_fn(pose_body):
            return jnp.concatenate([
                mahalanobis_residual(prior, pose_body),
                2.0 * horse_joint_angle_residual(pose_body)])

        target = jnp.asarray(rng.normal(size=D) * 0.1, jnp.float32)

        def r(x):
            return jnp.concatenate([5.0 * (x - target), 0.5 * prior_fn(x)])

        res = dogleg_solve(r, jnp.zeros(D), DoglegOptions(maxiter=60))
        # the exp joint-angle penalty biases the 12 leg dofs ~ -0.04 each on
        # top of the Mahalanobis shrinkage
        assert np.linalg.norm(np.asarray(res.x) - np.asarray(target)) < 0.35
        assert float(res.cost) < float(jnp.sum(r(jnp.zeros(D)) ** 2))

    def test_horse_model_stageii(self, rng):
        m = make_synthetic_model("animal_horse", num_verts=400, seed=7)
        M, F = 12, 4
        vids = rng.choice(400, M, replace=False)
        latents = np.asarray(m.v_template)[vids]
        idx = select_frame_indices(jnp.asarray(m.v_template), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(m.v_template), jnp.asarray(latents), idx)
        poses = (rng.normal(size=(F, m.pose_dof)) * 0.08).astype(np.float32)
        poses[:, 84:] = 0.0  # tail/mouth/ear dofs are frozen by the solver
        trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

        def sim(p, t):
            return reconstruct_markers(
                lbs_forward(m, p, jnp.zeros(m.num_betas), t), idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
        # with 12 markers the 81-dof pose is under-determined — the prior
        # (as in any real horse solve) regularizes the normal equations
        prior = MahalanobisPrior(mean=jnp.zeros(81), prec=jnp.eye(81))

        def prior_fn(pose_body):
            return jnp.concatenate([
                mahalanobis_residual(prior, pose_body),
                2.0 * horse_joint_angle_residual(pose_body)])

        opts = StageIIOptions(maxiter=40, smoothing_sweeps=0)
        prob = prepare_stageii_problem(m, np.zeros(16, np.float32), latents,
                                       opts=opts)
        res = mosh_stageii_solve(prob, opts, obs, np.ones((F, M), bool),
                                 prior=prior_fn, model_type="animal_horse")
        err_mm = np.asarray(res.data_err) * 1000
        assert err_mm.mean() < 2.5


    def test_dog_model_stageii_with_dog_prior(self, rng, tmp_path):
        """End-to-end dog solve: animal_dog model + the 31-joint max-mixture
        dog prior loaded through head._load_pose_prior's routing
        (dog_body_prior.py:47-58 parity)."""
        import pickle
        from moshpp_tpu.priors.mahalanobis import DOG_POSE_IDS
        from moshpp_tpu.pipeline.head import MoSh

        m = make_synthetic_model("animal_dog", num_verts=400, seed=9)
        M, F = 14, 4
        vids = rng.choice(400, M, replace=False)
        latents = np.asarray(m.v_template)[vids]
        idx = select_frame_indices(jnp.asarray(m.v_template), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(m.v_template), jnp.asarray(latents), idx)
        poses = np.zeros((F, m.pose_dof), np.float32)
        poses[:, DOG_POSE_IDS] = rng.normal(size=(F, len(DOG_POSE_IDS))).astype(np.float32) * 0.08
        poses[:, :3] = rng.normal(size=(F, 3)) * 0.2
        trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

        def sim(p, t):
            return reconstruct_markers(
                lbs_forward(m, p, jnp.zeros(m.num_betas), t), idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))

        # write a reference-format dog prior pkl and load it via the head path
        D = len(DOG_POSE_IDS)
        covs = np.stack([np.eye(D) * 0.5 for _ in range(2)])
        prior_fname = str(tmp_path / "dog_prior.pkl")
        with open(prior_fname, "wb") as f:
            pickle.dump({"gmm_means": np.zeros((2, D)), "gmm_covs": covs,
                         "gmm_weights": np.asarray([0.6, 0.4])}, f)
        head = MoSh.__new__(MoSh)
        head.cfg = {"moshpp.pose_body_prior_fname": prior_fname}
        prior = head._load_pose_prior("animal_dog")
        from moshpp_tpu.priors.gmm import MaxMixturePrior
        assert isinstance(prior, MaxMixturePrior) and prior.dim == D

        opts = StageIIOptions(maxiter=40, smoothing_sweeps=0)
        prob = prepare_stageii_problem(m, np.zeros(16, np.float32), latents,
                                       opts=opts)
        res = mosh_stageii_solve(prob, opts, obs, np.ones((F, M), bool),
                                 prior=prior, model_type="animal_dog")
        err_mm = np.asarray(res.data_err) * 1000
        assert err_mm.mean() < 2.5, f"dog solve err {err_mm.mean():.2f} mm"


class TestHeadCorr:
    def test_stagei_accepts_head_corr(self, rng):
        from moshpp_tpu.pipeline.stagei import StageIOptions, mosh_stagei_solve
        from moshpp_tpu.ops.surface import vertex_normals

        m = make_synthetic_model("smpl", num_verts=300, seed=8)
        M, F = 10, 3
        vids = rng.choice(300, M, replace=False)
        can_v = np.asarray(m.v_template)
        vn = np.asarray(vertex_normals(jnp.asarray(can_v), m.faces))
        latents = can_v[vids] + vn[vids] * 0.0095
        idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
        poses = (rng.normal(size=(F, m.pose_dof)) * 0.05).astype(np.float32)
        trans = (rng.normal(size=(F, 3)) * 0.05).astype(np.float32)

        def sim(p, t):
            return reconstruct_markers(
                lbs_forward(m, p, jnp.zeros(16), t), idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
        head_ids = np.array([0, 1, 2, 3])
        corr = np.eye(4) - 0.25  # coupled anchors
        res = mosh_stagei_solve(
            m, obs, np.ones((F, M), bool), [f"L{i}" for i in range(M)],
            vids, np.full(M, 0.0095, np.float32), {"body": np.ones(M, bool)},
            opts=StageIOptions(maxiter=25, num_betas=16),
            prior=None, head_corr=(corr, head_ids))
        assert np.isfinite(res.errs["data_mean_m"])


class TestSmplxFace:
    def test_stageii_with_expressions(self, rng):
        """SMPL-X solve with jaw + expression dofs (BASELINE config 4)."""
        m = make_synthetic_model("smplx", num_verts=500, seed=14,
                                 num_betas=16, num_shape_dirs=26,
                                 dof_per_hand=6)
        M, F = 16, 4
        vids = rng.choice(500, M, replace=False)
        betas16 = (rng.normal(size=16) * 0.3).astype(np.float32)
        exprs = (rng.normal(size=(F, 10)) * 0.4).astype(np.float32)
        can_v = np.asarray(m.v_template) + np.einsum(
            "vcb,b->vc", np.asarray(m.shapedirs)[..., :16], betas16)
        latents = can_v[vids]
        idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
        poses = (rng.normal(size=(F, m.pose_dof)) * 0.08).astype(np.float32)
        trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

        def sim(p, t, e):
            fb = jnp.concatenate([jnp.asarray(betas16), e])  # expr at cols 16:26
            return reconstruct_markers(lbs_forward(m, p, fb, t), idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans),
                                       jnp.asarray(exprs)))
        from moshpp_tpu.priors import make_gmm_prior
        prior = make_gmm_prior(dim=63, num_components=3, seed=15, scale=0.3)
        opts = StageIIOptions(maxiter=40, smoothing_sweeps=1,
                              optimize_face=True, optimize_fingers=True,
                              num_expressions=10, expr_start=16)
        prob = prepare_stageii_problem(m, betas16, latents, opts=opts)
        res = mosh_stageii_solve(prob, opts, obs, np.ones((F, M), bool),
                                 prior=prior, model_type="smplx")
        assert res.extra.shape == (F, 10)
        assert res.fullpose.shape == (F, 165)
        err_mm = np.asarray(res.data_err) * 1000
        assert err_mm.mean() < 3.5, f"smplx face solve err {err_mm.mean():.2f} mm"

    def test_stageii_wide_expressions_tiled(self, rng):
        """E=20 > INLINE_MAX_EXTRAS: the solve rides the tiled streaming
        kernel path end-to-end (the production smplx config is E=80,
        reference support_data/conf/moshpp_conf.yaml:30 — same path, this
        width keeps the CPU-interpret test tractable)."""
        from moshpp_tpu.ops.pallas_marker_jac import INLINE_MAX_EXTRAS
        E = 20
        assert E > INLINE_MAX_EXTRAS
        m = make_synthetic_model("smplx", num_verts=500, seed=14,
                                 num_betas=16, num_shape_dirs=16 + E,
                                 dof_per_hand=6)
        M, F = 16, 4
        vids = rng.choice(500, M, replace=False)
        betas16 = (rng.normal(size=16) * 0.3).astype(np.float32)
        exprs = (rng.normal(size=(F, E)) * 0.4).astype(np.float32)
        can_v = np.asarray(m.v_template) + np.einsum(
            "vcb,b->vc", np.asarray(m.shapedirs)[..., :16], betas16)
        latents = can_v[vids]
        idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
        poses = (rng.normal(size=(F, m.pose_dof)) * 0.08).astype(np.float32)
        trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

        def sim(p, t, e):
            fb = jnp.concatenate([jnp.asarray(betas16), e])
            return reconstruct_markers(lbs_forward(m, p, fb, t), idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans),
                                       jnp.asarray(exprs)))
        from moshpp_tpu.priors import make_gmm_prior
        prior = make_gmm_prior(dim=63, num_components=3, seed=15, scale=0.3)
        opts = StageIIOptions(maxiter=40, smoothing_sweeps=1,
                              optimize_face=True, optimize_fingers=True,
                              num_expressions=E, expr_start=16)
        prob = prepare_stageii_problem(m, betas16, latents, opts=opts)
        assert prob.pallas_tables is not None
        assert prob.pallas_tables.n_extra == E   # no XLA fallback anymore
        res = mosh_stageii_solve(prob, opts, obs, np.ones((F, M), bool),
                                 prior=prior, model_type="smplx")
        assert res.extra.shape == (F, E)
        err_mm = np.asarray(res.data_err) * 1000
        assert err_mm.mean() < 3.5, f"tiled solve err {err_mm.mean():.2f} mm"


class TestMatMocap:
    def test_mat_roundtrip(self, tmp_path, rng):
        import scipy.io
        from moshpp_tpu.io.mocap import MocapSession
        pts = rng.normal(size=(6, 3, 3)) * 100
        labels = np.array(["AA", "BB", "CC"], dtype=object)
        scipy.io.savemat(str(tmp_path / "m.mat"),
                         {"Markers": pts, "Labels": labels.reshape(1, -1)})
        s = MocapSession(str(tmp_path / "m.mat"), mocap_unit="cm")
        assert s.labels == ["AA", "BB", "CC"]
        np.testing.assert_allclose(s.markers, pts / 100.0, atol=1e-9)


class TestGraftEntry:
    def test_entry_and_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert np.all(np.isfinite(np.asarray(out)))
        if len(jax.devices()) >= 4:
            g.dryrun_multichip(4)


class TestSubjectPriorCache:
    def test_generic_fallback_and_subject_fit(self, rng):
        from moshpp_tpu.priors.gm_prior import SubjectPriorCache
        D = 6
        samples = rng.normal(size=(40, D)).astype(np.float64)
        names = ([f"alice_take{i}" for i in range(20)]
                 + [f"bob_take{i}" for i in range(18)]
                 + ["carol_only", "carol_extra"])
        cache = SubjectPriorCache(samples, names, use_sklearn=False)
        alice = cache["Alice"]          # case-insensitive, >= 3 samples
        assert alice is not cache["Generic"]
        assert alice is cache["Alice"]  # cached
        # carol has < 3 samples -> Generic fallback
        assert cache["carol"] is cache["Generic"]
        from moshpp_tpu.priors.mahalanobis import mahalanobis_residual
        r = np.asarray(mahalanobis_residual(
            alice, jnp.asarray(samples[0], jnp.float32)))
        assert r.shape == (D,) and np.isfinite(r).all()
