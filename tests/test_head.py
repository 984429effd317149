"""Integration tests: config system, frame picker, jobs filter, and the full
MoSh head pipeline (stage-i -> stage-ii -> pkl caching -> AMASS export) on a
synthetic subject."""

import json
import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.config.config import prepare_cfg
from moshpp_tpu.io.mocap import write_mocap_c3d
from moshpp_tpu.markers.layout import marker_layout_write
from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.models.synthetic import save_synthetic_npz
from moshpp_tpu.ops.marker_transform import (marker_coeffs, reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.frame_picker import (frames_to_arrays,
                                              load_marker_sessions_random_strict)
from moshpp_tpu.pipeline.head import MoSh, run_moshpp_once
from moshpp_tpu.pipeline.jobs import universal_mosh_jobs_filter
from moshpp_tpu.priors.gmm import save_gmm_prior_pkl


class TestConfig:
    def test_base_merge_and_dotlist(self, tmp_path):
        cfg = prepare_cfg(**{
            "mocap.fname": "/data/MyDS/Session1/walk 01.c3d",
            "dirs.work_base_dir": str(tmp_path),
            "dirs.support_base_dir": "/support",
            "surface_model.gender": "neutral",
        })
        assert cfg["mocap.ds_name"] == "MyDS"
        assert cfg["mocap.session_name"] == "Session1"
        assert cfg["mocap.basename"] == "walk01"
        assert cfg["surface_model.type"] == "smplx"
        assert cfg["dirs.stageii_fname"].endswith("MyDS/Session1/walk01_stageii.pkl")
        assert cfg["opt_weights.smplx.stageii_wt_data"] == 400

    def test_dict_override_beats_dotlist(self):
        cfg = prepare_cfg(dict_cfg={"surface_model": {"type": "smplh"}},
                          **{"surface_model.type": "mano",
                             "mocap.fname": "/a/b/c/d.c3d",
                             "surface_model.gender": "male"})
        assert cfg["surface_model.type"] == "smplh"

    def test_gender_from_sidecar(self, tmp_path):
        d = tmp_path / "DS" / "S1"
        d.mkdir(parents=True)
        (d / "settings.json").write_text(json.dumps({"gender": "female"}))
        cfg = prepare_cfg(**{"mocap.fname": str(d / "seq.c3d"),
                             "dirs.work_base_dir": str(tmp_path),
                             "dirs.support_base_dir": "/support"})
        assert cfg["surface_model.gender"] == "female"

    def test_weight_alias_tables(self):
        cfg = prepare_cfg(**{"mocap.fname": "/a/b/c.c3d",
                             "surface_model.gender": "neutral",
                             "surface_model.type": "smplh"})
        assert cfg["opt_weights.smpl.stagei_wt_data"] == 75.0

    def test_bracket_indirection(self):
        # OmegaConf-style ${table[${key}]} used by SOMA cfg files
        # (reference moshpp_conf.yaml:97)
        cfg = prepare_cfg(**{
            "mocap.fname": "/a/b/c.c3d",
            "surface_model.gender": "neutral",
            "surface_model.type": "smplh",
            "opt_settings.weights_type": "smplh",
            "opt_settings.weights": "${opt_weights[${opt_settings.weights_type}]}",
        })
        w = cfg["opt_settings.weights"]
        assert w["stagei_wt_poseB"] == cfg["opt_weights.smplh.stagei_wt_poseB"]
        assert cfg["opt_weights[smplh].stageii_wt_data"] == 400


@pytest.fixture(scope="module")
def synth_world(tmp_path_factory):
    """A synthetic 'world': model npz, pose prior pkl, 3 mocap c3ds with
    ground-truth motion, directory conventions the config resolvers expect."""
    root = tmp_path_factory.mktemp("world")
    rng = np.random.default_rng(7)
    model = make_synthetic_model("smplh", num_verts=320, seed=21, dof_per_hand=6)

    support = root / "support" / "smplh"
    support.mkdir(parents=True)
    model_fname = str(support / "model.npz")
    save_synthetic_npz(model, model_fname)

    # prior moments in the reference pkl dict convention
    means = rng.normal(size=(3, 63)) * 0.05
    covs = np.stack([0.09 * np.eye(63) for _ in range(3)])
    save_gmm_prior_pkl({"means": means, "covars": covs,
                        "weights": np.ones(3) / 3},
                       str(support / "pose_body_prior.pkl"))

    # ground-truth subject
    M = 14
    vids = rng.choice(320, M, replace=False)
    betas = rng.normal(size=16).astype(np.float32) * 0.3
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
    labels = [f"MK{i:02d}" for i in range(M)]

    sess = root / "work_mocap" / "SynthDS" / "Subject0"
    sess.mkdir(parents=True)
    (sess / "settings.json").write_text(json.dumps({"gender": "neutral"}))

    def sim(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas), t)
        return reconstruct_markers(verts, idx, coeffs)

    seq_fnames = []
    for s in range(2):
        F = 18
        poses = np.zeros((F, model.pose_dof), np.float32)
        poses[0] = rng.normal(size=model.pose_dof) * 0.12
        for t in range(1, F):
            poses[t] = 0.95 * poses[t - 1] + rng.normal(size=model.pose_dof).astype(np.float32) * 0.03
        trans = np.cumsum(rng.normal(size=(F, 3)) * 0.008, 0).astype(np.float32)
        obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
        fname = str(sess / f"seq{s}.c3d")
        write_mocap_c3d(obs, labels, fname, frame_rate=60)
        seq_fnames.append(fname)

    # layout with the true vids (synthetic vids aren't in the real database)
    layout_fname = str(root / "work" / "SynthDS_smplh.json")
    os.makedirs(os.path.dirname(layout_fname), exist_ok=True)
    marker_layout_write({
        "marker_vids": dict(zip(labels, [int(v) for v in vids])),
        "marker_type_mask": {"body": np.ones(M, bool)},
        "m2b_distance": {"body": 0.0095},
        "surface_model_type": "smplh",
    }, layout_fname)

    return dict(root=root, model_fname=model_fname, labels=labels,
                seq_fnames=seq_fnames, layout_fname=layout_fname,
                support=str(root / "support"), work=str(root / "work"))


def _base_overrides(w):
    return {
        "mocap.fname": w["seq_fnames"][0],
        "dirs.work_base_dir": w["work"],
        "dirs.support_base_dir": w["support"],
        "dirs.marker_layout.fname": w["layout_fname"],
        "surface_model.type": "smplh",
        "surface_model.fname": w["model_fname"],
        "surface_model.num_betas": 16,
        "surface_model.dof_per_hand": 6,
        "moshpp.pose_hand_prior_fname": None,
        "moshpp.stagei_frame_picker.num_frames": 3,
        "moshpp.stagei_frame_picker.least_avail_markers": 0.5,
        "opt_settings.maxiter": 25,
        "opt_settings.smoothing_sweeps": 1,
        "mocap.end_fidx": 8,
    }


class TestFramePicker:
    def test_random_strict(self, synth_world):
        frames, names = load_marker_sessions_random_strict(
            synth_world["seq_fnames"], mocap_unit="mm", num_frames=4, seed=1,
            least_avail_markers=0.5)
        assert len(frames) == 4
        obs, mask = frames_to_arrays(frames, synth_world["labels"])
        assert obs.shape == (4, 14, 3)
        assert mask.all()


class TestMoShHead:
    @pytest.mark.slow
    def test_full_pipeline_and_cache(self, synth_world):
        w = synth_world
        mp = run_moshpp_once(_base_overrides(w))
        assert os.path.exists(mp.stagei_fname)
        assert os.path.exists(mp.stageii_fname)
        # optimized layout dumped next to stage-i pkl
        assert os.path.exists(mp.stagei_fname.replace(".pkl", ".json"))

        with open(mp.stageii_fname, "rb") as f:
            data = pickle.load(f)
        for key in ("trans", "fullpose", "betas", "markers_latent",
                    "latent_labels", "markers_latent_vids", "marker_meta",
                    "stagei_debug_details", "stageii_debug_details"):
            assert key in data, key
        assert data["fullpose"].shape[1] == 156  # smplh fullpose
        err = data["stageii_debug_details"]["stageii_errs"]["data_mean_m"]
        assert float(np.mean(err)) * 1000 < 10.0  # mm, loose integration bar

        # second run must hit the caches (no recompute)
        mp2 = MoSh(dict_cfg=_base_overrides(w))
        mp2.mosh_stagei()
        mp2.mosh_stageii()
        assert mp2.stagei_data is not None and mp2.stageii_data is not None

    @pytest.mark.slow    # runs the cached pipeline; full solve on a cold cache
    def test_amass_export(self, synth_world, tmp_path):
        w = synth_world
        mp = MoSh(dict_cfg=_base_overrides(w))
        mp.mosh_stagei()
        mp.mosh_stageii()
        out_npz = str(tmp_path / "amass" / "seq0_stageii.npz")
        out = MoSh.load_as_amass_npz(mp.stageii_fname, stageii_npz_fname=out_npz,
                                     include_markers=True)
        assert os.path.exists(out_npz)
        d = np.load(out_npz, allow_pickle=True)
        assert str(d["surface_model_type"]) == "smplh"
        assert d["poses"].shape[1] == 156
        assert d["trans"].shape == (8, 3)
        assert "pose_body" in d and d["pose_body"].shape[1] == 63
        assert "pose_hand" in d
        assert out["num_markers"] == 14
        # stage-i npz written alongside
        assert os.path.exists(os.path.join(os.path.dirname(out_npz),
                                           "neutral_stagei.npz"))


class TestLegacyAmass:
    def _legacy_pkl(self, tmp_path, with_vtemplate=False):
        """Synthesize a legacy-schema (py2-era) stage-ii pickle
        (mosh_head.py:342-441 input contract)."""
        rng = np.random.default_rng(3)
        F, M = 12, 9
        data = {
            "ps": {"gender": "female", "fitting_model": "smplh",
                   "betas": None, "num_betas": 10,
                   "use_dynamics": True, "num_dmpls": 8,
                   "optimize_face": False, "num_expr": 0,
                   "mrk_settings_fname": None},
            "mocap_framerate": 120.0,
            "mocap_timelength": F / 120.0,
            "shape_est_lmrks": rng.normal(size=(M, 3)).astype(np.float32),
            "shape_est_lmlabels": [f"M{i}" for i in range(M)],
            "shape_debug_details": {
                "shape_est_lmrks_vids": rng.integers(0, 6890, M)},
            "shape_est_betas": rng.normal(size=16).astype(np.float32),
            "pose_est_trans": rng.normal(size=(F, 3)).astype(np.float32),
            "pose_est_fullposes": rng.normal(size=(F, 156)).astype(np.float32),
            "pose_est_dmpls": rng.normal(size=(F, 8)).astype(np.float32),
        }
        if with_vtemplate:
            from moshpp_tpu.io.ply import write_ply
            v = rng.normal(size=(20, 3)).astype(np.float32)
            f = np.asarray([[0, 1, 2]], np.int32)
            ply = str(tmp_path / "vtemplate.ply")
            write_ply(ply, v, f)
            data["vtemplate_fname"] = ply
        fname = str(tmp_path / "legacy_stageii.pkl")
        with open(fname, "wb") as fh:
            pickle.dump(data, fh, protocol=2)
        return fname, data

    def test_legacy_roundtrip(self, tmp_path):
        fname, src = self._legacy_pkl(tmp_path)
        out_npz = str(tmp_path / "out" / "legacy_stageii.npz")
        out = MoSh.load_as_amass_npz_legacy(fname, stageii_npz_fname=out_npz)
        assert out["gender"] == "female"
        assert out["surface_model_type"] == "smplh"
        np.testing.assert_allclose(out["poses"], src["pose_est_fullposes"])
        np.testing.assert_allclose(out["betas"],
                                   src["shape_est_betas"][:10])
        assert out["num_betas"] == 10
        np.testing.assert_allclose(out["dmpls"], src["pose_est_dmpls"])
        assert out["pose_body"].shape == (12, 63)
        assert out["pose_hand"].shape == (12, 90)
        d = np.load(out_npz, allow_pickle=True)
        assert d["mocap_frame_rate"] == 120.0
        # stage-i shape npz written alongside with the legacy gender name
        stagei = os.path.join(os.path.dirname(out_npz), "female_stagei.npz")
        assert os.path.exists(stagei)
        d1 = np.load(stagei, allow_pickle=True)
        assert "betas" in d1 and "trans" not in d1

    def test_legacy_vtemplate_suppresses_betas(self, tmp_path):
        fname, src = self._legacy_pkl(tmp_path, with_vtemplate=True)
        out = MoSh.load_as_amass_npz_legacy(fname)
        assert "betas" not in out
        assert out["v_template"].shape == (20, 3)


class TestJobsFilter:
    def test_dedup_and_skip(self, synth_world):
        w = synth_world
        jobs = [dict(_base_overrides(w)),
                {**_base_overrides(w), "mocap.fname": w["seq_fnames"][1]}]
        # plant seq0's stage-ii output (self-sufficient: don't depend on the
        # slow full-pipeline test having populated the work cache)
        done = MoSh(dict_cfg=jobs[0]).stageii_fname
        os.makedirs(os.path.dirname(done), exist_ok=True)
        if not os.path.exists(done):
            with open(done, "wb") as f:
                f.write(b"stub")
        filtered = universal_mosh_jobs_filter(jobs)
        # stage-ii for seq0 exists -> dropped; seq1 runs
        fnames = [j["mocap.fname"] for j in filtered]
        assert w["seq_fnames"][0] not in fnames
        assert w["seq_fnames"][1] in fnames
