"""End-to-end solver-convergence tests on synthetic mocap: generate markers
from known model parameters via the forward model, then recover them
(SURVEY.md §4 test strategy). The north-star acceptance bar is the
~millimeter marker residual."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.ops.marker_transform import (marker_coeffs, reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import (StageIIOptions, StageIIResult,
                                         mosh_stageii_solve,
                                         prepare_stageii_problem)
from moshpp_tpu.pipeline.stagei import StageIOptions, mosh_stagei_solve
from moshpp_tpu.priors import make_gmm_prior

# solver-compile-heavy: excluded from the fast pre-commit gate
# (pytest -m 'not slow'); the full suite remains the CI bar
pytestmark = pytest.mark.slow


def _make_truth(model, num_markers, num_frames, rng, pose_scale=0.15,
                betas_scale=0.5):
    """Ground-truth subject + motion + simulated markers."""
    V = model.v_template.shape[0]
    vids = rng.choice(V, num_markers, replace=False)
    betas_true = (rng.normal(size=model.num_betas) * betas_scale).astype(np.float32)

    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :model.num_betas], betas_true)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents_true = can_v[vids] + vn[vids] * 0.0095

    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents_true))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents_true), idx)

    # smooth random-walk poses + drifting translation
    P = model.pose_dof
    poses = np.zeros((num_frames, P), np.float32)
    steps = rng.normal(size=(num_frames, P)).astype(np.float32) * pose_scale * 0.3
    poses[0] = rng.normal(size=P).astype(np.float32) * pose_scale
    for t in range(1, num_frames):
        poses[t] = 0.95 * poses[t - 1] + steps[t]
    trans = np.cumsum(rng.normal(size=(num_frames, 3)).astype(np.float32) * 0.01,
                      axis=0) + np.array([0.2, -0.1, 0.5], np.float32)

    def sim(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas_true), t)
        return reconstruct_markers(verts, idx, coeffs)

    obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
    return dict(vids=vids, betas=betas_true, latents=latents_true,
                poses=poses, trans=trans, obs=obs)


@pytest.fixture(scope="module")
def model():
    return make_synthetic_model("smplh", num_verts=400, seed=11, dof_per_hand=6)


@pytest.fixture(scope="module")
def prior():
    return make_gmm_prior(dim=63, num_components=4, seed=1, scale=0.3)


class TestFastSpin:
    def test_fast_root_spin_recovered(self, model, prior, rng):
        """A fast continuous root spin: between stride-8 anchors the body
        rotates 120 deg, where linear axis-angle interpolation of warm
        starts degrades — the slerp anchor interpolation
        (ops/rodrigues.slerp_axis_angle) must keep recovery <= 1 mm."""
        F, M = 32, 16
        truth = _make_truth(model, num_markers=M, num_frames=F, rng=rng,
                            pose_scale=0.1)
        # overwrite the root with a fast continuous spin about +z
        P = model.pose_dof
        poses = truth["poses"].copy()
        # 15 deg/frame = 1800 deg/s at 120 fps (5x the 360 deg/s spec bar);
        # the stride-8 anchor gap is then a 120-degree rotation — squarely in
        # the regime where linear axis-angle warm starts land badly
        w = 2.0 * np.pi / 24.0
        poses[:, 0:3] = 0.0
        poses[:, 2] = ((np.arange(F) * w + np.pi) % (2 * np.pi)) - np.pi
        idx = select_frame_indices(
            jnp.asarray(np.asarray(model.v_template) + np.einsum(
                "vcb,b->vc", np.asarray(model.shapedirs)[..., :model.num_betas],
                truth["betas"])),
            jnp.asarray(truth["latents"]))
        coeffs = marker_coeffs(jnp.asarray(
            np.asarray(model.v_template) + np.einsum(
                "vcb,b->vc", np.asarray(model.shapedirs)[..., :model.num_betas],
                truth["betas"])), jnp.asarray(truth["latents"]), idx)

        def sim(p, t):
            verts = lbs_forward(model, p, jnp.asarray(truth["betas"]), t)
            return reconstruct_markers(verts, idx, coeffs)

        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses),
                                       jnp.asarray(truth["trans"])))
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        opts = StageIIOptions(maxiter=80, smoothing_sweeps=1, anchor_stride=8)
        res = mosh_stageii_solve(prob, opts, obs, np.ones((F, M), bool),
                                 prior=prior, model_type="smplh")
        err_mm = float(np.mean(np.asarray(res.data_err))) * 1000.0
        assert err_mm <= 1.0, f"fast-spin recovery {err_mm:.3f} mm"


class TestStageII:
    def test_recovers_markers_below_1mm(self, model, prior, rng):
        truth = _make_truth(model, num_markers=16, num_frames=12, rng=rng)
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        opts = StageIIOptions(maxiter=60, smoothing_sweeps=1, anchor_stride=4)
        mask = np.ones((12, 16), bool)
        res = mosh_stageii_solve(prob, opts, truth["obs"], mask, prior=prior)
        err_mm = np.asarray(res.data_err) * 1000.0
        assert err_mm.mean() < 1.0, f"mean marker err {err_mm.mean():.3f} mm"
        # parameters can trade off (root-rotation/translation gauge) while
        # markers match exactly; translation must still be in the ballpark
        assert np.abs(np.asarray(res.trans) - truth["trans"]).max() < 0.3

    def test_missing_markers_handled(self, model, prior, rng):
        truth = _make_truth(model, num_markers=16, num_frames=8, rng=rng)
        mask = np.ones((8, 16), bool)
        mask[2, :6] = False       # drop six markers in one frame
        mask[5, 10:] = False
        obs = truth["obs"].copy()
        obs[~mask] = 0.0
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        res = mosh_stageii_solve(prob, StageIIOptions(maxiter=40, smoothing_sweeps=1),
                                 obs, mask, prior=prior)
        err_mm = np.asarray(res.data_err) * 1000.0
        assert err_mm.mean() < 2.0

    def test_result_shapes(self, model, prior, rng):
        truth = _make_truth(model, num_markers=10, num_frames=5, rng=rng)
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        res = mosh_stageii_solve(prob, StageIIOptions(maxiter=10, smoothing_sweeps=0),
                                 truth["obs"], np.ones((5, 10), bool), prior=prior)
        assert res.trans.shape == (5, 3)
        assert res.pose.shape == (5, model.pose_dof)
        assert res.fullpose.shape == (5, model.fullpose_dof)
        assert res.markers_sim.shape == (5, 10, 3)


class TestStageI:
    def test_recovers_shape_and_markers(self, model, prior, rng):
        M, F = 14, 5
        truth = _make_truth(model, num_markers=M, num_frames=F, rng=rng,
                            pose_scale=0.1, betas_scale=0.4)
        labels = [f"L{i}" for i in range(M)]
        opts = StageIOptions(maxiter=40, num_betas=model.num_betas)
        res = mosh_stagei_solve(
            model,
            frames_obs=truth["obs"],
            frames_mask=np.ones((F, M), bool),
            latent_labels=labels,
            layout_vids=truth["vids"],       # layout points at the true vids
            m2b=np.full(M, 0.0095, np.float32),
            type_masks={"body": np.ones(M, bool)},
            opts=opts,
            prior=prior,
        )
        err_mm = res.errs["data_mean_m"] * 1000.0
        assert err_mm < 4.0, f"stage-i data residual {err_mm:.2f} mm"
        # exact latent/shape parameters are gauge-free (markers pin the
        # surface, not the parametrization); they must stay in the ballpark
        lat_err = np.linalg.norm(res.markers_latent - truth["latents"], axis=1)
        assert np.median(lat_err) < 0.10
        assert set(res.markers_latent_vids.keys()) == set(labels)


class TestStageIBatched:
    def test_batched_matches_single(self, model, prior, rng):
        """Batched stage-i (subject axis as a TPU batch axis) must deliver
        the same functional outputs as per-subject solves: matching data
        residuals and latent placements. Exact parameters are gauge-free on
        tiny synthetic problems, so the bar is output quality, not
        parameter identity."""
        from moshpp_tpu.pipeline.stagei import mosh_stagei_solve_batched

        M, F, S = 14, 5, 2
        # subjects share the marker layout (vids), differ in shape + motion
        base = _make_truth(model, num_markers=M, num_frames=F, rng=rng,
                           pose_scale=0.1, betas_scale=0.4)
        truths = [base]
        V = model.v_template.shape[0]
        for s in range(1, S):
            t = _make_truth(model, num_markers=M, num_frames=F, rng=rng,
                            pose_scale=0.1, betas_scale=0.4)
            t["vids"] = base["vids"]
            # re-derive latents/obs for the shared vids
            can_v = np.asarray(model.v_template) + np.einsum(
                "vcb,b->vc", np.asarray(model.shapedirs)[..., :model.num_betas],
                t["betas"])
            vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
            t["latents"] = can_v[base["vids"]] + vn[base["vids"]] * 0.0095
            idx = select_frame_indices(jnp.asarray(can_v),
                                       jnp.asarray(t["latents"]))
            coeffs = marker_coeffs(jnp.asarray(can_v),
                                   jnp.asarray(t["latents"]), idx)

            def sim(p, tr):
                verts = lbs_forward(model, p, jnp.asarray(t["betas"]), tr)
                return reconstruct_markers(verts, idx, coeffs)

            t["obs"] = np.asarray(jax.vmap(sim)(jnp.asarray(t["poses"]),
                                                jnp.asarray(t["trans"])))
            truths.append(t)

        labels = [f"L{i}" for i in range(M)]
        kw = dict(latent_labels=labels, layout_vids=base["vids"],
                  m2b=np.full(M, 0.0095, np.float32),
                  type_masks={"body": np.ones(M, bool)},
                  opts=StageIOptions(maxiter=40, num_betas=model.num_betas),
                  prior=prior)

        obs = np.stack([t["obs"] for t in truths])
        res_b = mosh_stagei_solve_batched(
            model, obs, np.ones((S, F, M), bool), **kw)
        assert len(res_b) == S
        for s in range(S):
            res_1 = mosh_stagei_solve(model, truths[s]["obs"],
                                      np.ones((F, M), bool), **kw)
            err_b = res_b[s].errs["data_mean_m"] * 1000.0
            err_1 = res_1.errs["data_mean_m"] * 1000.0
            # same functional quality as the single-subject solve
            assert err_b < max(2.0 * err_1, 4.0), (err_b, err_1)
            lat_err = np.linalg.norm(
                res_b[s].markers_latent - truths[s]["latents"], axis=1)
            assert np.median(lat_err) < 0.10


class TestChunkedSolve:
    def test_chunked_matches_unchunked(self, model, prior, rng):
        """Long sequences solve in overlapping chunks; the halo must make
        seam frames agree with the single-batch solve up to solver noise."""
        from moshpp_tpu.pipeline.stageii import _solve_chunked  # noqa: F401

        F, M = 48, 16
        truth = _make_truth(model, num_markers=M, num_frames=F, rng=rng)
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        mask = np.ones((F, M), bool)
        base = dict(maxiter=60, smoothing_sweeps=1, anchor_stride=4)

        res_full = mosh_stageii_solve(
            prob, StageIIOptions(**base, chunk_frames=0),
            truth["obs"], mask, prior=prior)
        res_chunk = mosh_stageii_solve(
            prob, StageIIOptions(**base, chunk_frames=16, chunk_halo=8),
            truth["obs"], mask, prior=prior)

        for f in StageIIResult._fields:
            assert np.asarray(getattr(res_chunk, f)).shape == \
                np.asarray(getattr(res_full, f)).shape, f

        err_full = np.asarray(res_full.data_err) * 1000.0
        err_chunk = np.asarray(res_chunk.data_err) * 1000.0
        # same convergence quality as the single-batch solve (absolute error
        # is seed-dependent; equivalence is the contract here)
        assert abs(err_chunk.mean() - err_full.mean()) < 0.05
        # marker trajectories agree across every seam (mm-level: different
        # batch shapes change reduction order + compaction grouping)
        dev_mm = 1000.0 * np.abs(
            np.asarray(res_chunk.markers_sim) - np.asarray(res_full.markers_sim))
        assert dev_mm.max() < 1.0, f"max seam deviation {dev_mm.max():.3f} mm"

    def test_chunk_checkpoint_resume(self, model, prior, rng, tmp_path,
                                     monkeypatch):
        """Chunk checkpointing: a rerun skips completed chunks, a crash
        mid-sequence resumes at the first unsolved chunk with identical
        results, and a stale checkpoint (changed inputs/options) re-solves."""
        from moshpp_tpu.pipeline import stageii as sii

        F, M = 24, 12
        truth = _make_truth(model, num_markers=M, num_frames=F, rng=rng)
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        mask = np.ones((F, M), bool)
        ckpt = str(tmp_path / "ckpt")
        base = dict(maxiter=30, smoothing_sweeps=1, anchor_stride=4,
                    chunk_frames=12, chunk_halo=4, checkpoint_dir=ckpt)

        inner_calls = []
        real_solve = sii.mosh_stageii_solve

        def counting_solve(prob, opts, *a, **kw):
            if opts.chunk_frames == 0:  # inner per-chunk call
                inner_calls.append(1)
            return real_solve(prob, opts, *a, **kw)

        monkeypatch.setattr(sii, "mosh_stageii_solve", counting_solve)

        opts = StageIIOptions(**base)
        res1, rep1 = counting_solve(prob, opts, truth["obs"], mask,
                                    prior=prior, return_report=True)
        assert len(inner_calls) == 2  # F=24 / C=12 chunks, all solved
        files = sorted(p.name for p in (tmp_path / "ckpt").iterdir())
        assert files == ["chunk_000000000.npz", "chunk_000000012.npz"]

        # full rerun: everything cached, zero solver calls, identical output
        inner_calls.clear()
        res2, rep2 = counting_solve(prob, opts, truth["obs"], mask,
                                    prior=prior, return_report=True)
        assert len(inner_calls) == 0
        for f in StageIIResult._fields:
            np.testing.assert_array_equal(np.asarray(getattr(res1, f)),
                                          np.asarray(getattr(res2, f)), err_msg=f)
        np.testing.assert_array_equal(rep1.energies_after, rep2.energies_after)
        np.testing.assert_array_equal(rep1.iterations, rep2.iterations)

        # crash simulation: second chunk lost -> exactly one chunk re-solves
        (tmp_path / "ckpt" / "chunk_000000012.npz").unlink()
        inner_calls.clear()
        res3 = counting_solve(prob, opts, truth["obs"], mask, prior=prior)
        assert len(inner_calls) == 1
        np.testing.assert_array_equal(np.asarray(res1.trans),
                                      np.asarray(res3.trans))

        # stale checkpoints: changed inputs fail the fingerprint compare
        inner_calls.clear()
        counting_solve(prob, opts, truth["obs"] + 1e-6, mask, prior=prior)
        assert len(inner_calls) == 2

    def test_chunked_report_merging(self, model, prior, rng):
        F, M = 24, 12
        truth = _make_truth(model, num_markers=M, num_frames=F, rng=rng)
        prob = prepare_stageii_problem(model, truth["betas"], truth["latents"])
        mask = np.ones((F, M), bool)
        res, report = mosh_stageii_solve(
            prob, StageIIOptions(maxiter=30, smoothing_sweeps=1,
                                 anchor_stride=4, chunk_frames=12,
                                 chunk_halo=4),
            truth["obs"], mask, prior=prior, return_report=True)
        assert np.asarray(res.trans).shape == (F, 3)
        assert np.isfinite(report.energies_after).all()
        assert report.iterations.shape == (len(report.phase_names),)
        assert "polish" in report.format_table()
