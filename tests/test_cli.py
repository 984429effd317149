"""CLI (`python -m moshpp_tpu`) tests — wiring + IO subcommands.

The reference has no CLI (library-only, mosh_head.py:584-606); this is an
addition, so the tests pin our own contract: override parsing, config
mapping, and the export/info subcommands end-to-end on synthetic data.
"""

import json
import pickle

import numpy as np
import pytest

from moshpp_tpu import cli
from moshpp_tpu.io.mocap import write_mocap_c3d


def test_parse_overrides_yaml_typing():
    out = cli._parse_overrides([
        "opt_settings.maxiter=50",
        "mocap.ds_rate=2",
        "moshpp.optimize_betas=false",
        "surface_model.type=smplx",
        "moshpp.pose_hand_prior_fname=null",
        "opt_settings.e_3=0.01",
    ])
    assert out["opt_settings.maxiter"] == 50
    assert out["mocap.ds_rate"] == 2
    assert out["moshpp.optimize_betas"] is False
    assert out["surface_model.type"] == "smplx"
    assert out["moshpp.pose_hand_prior_fname"] is None
    assert out["opt_settings.e_3"] == pytest.approx(0.01)
    with pytest.raises(SystemExit):
        cli._parse_overrides(["no_equals_sign"])


def test_run_maps_flags_to_cfg(monkeypatch):
    seen = {}

    class _FakeMoSh:
        stagei_fname = "/w/x_stagei.pkl"
        stageii_data = None

    def fake_run(cfg):
        seen.update(cfg)
        return _FakeMoSh()

    import moshpp_tpu.pipeline.head as head
    monkeypatch.setattr(head, "run_moshpp_once", fake_run)
    rc = cli.main([
        "run", "/d/DS/S1/seq.c3d", "--work-dir", "/w", "--support-dir", "/s",
        "--model-type", "smplx", "--stagei-only",
        "-o", "opt_settings.maxiter=7", "-o", "mocap.ds_rate=3",
    ])
    assert rc == 0
    assert seen["mocap.fname"] == "/d/DS/S1/seq.c3d"
    assert seen["dirs.work_base_dir"] == "/w"
    assert seen["dirs.support_base_dir"] == "/s"
    assert seen["surface_model.type"] == "smplx"
    assert seen["runtime.stagei_only"] is True
    assert seen["opt_settings.maxiter"] == 7
    assert seen["mocap.ds_rate"] == 3


def test_info_subcommand(tmp_path, capsys):
    rng = np.random.default_rng(3)
    F, M = 25, 6
    markers = rng.normal(size=(F, M, 3)).astype(np.float32) * 0.4
    markers[5:9, 2] = np.nan                     # a dropout window
    labels = [f"MK{i}" for i in range(M)]
    fname = str(tmp_path / "seq.c3d")
    write_mocap_c3d(markers, labels, fname, frame_rate=60)

    rc = cli.main(["info", fname, "--labels"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["num_frames"] == F
    assert info["num_markers"] == M
    assert info["frame_rate"] == 60.0
    assert info["time_length_s"] == pytest.approx(F / 60.0)
    assert info["labels"] == labels
    assert 0.5 < info["mean_marker_availability"] < 1.0


def _tiny_stageii_pkl(tmp_path):
    F, M = 10, 5
    rng = np.random.default_rng(0)
    data = {
        "markers_latent": rng.normal(size=(M, 3)).astype(np.float32),
        "latent_labels": [f"MK{i}" for i in range(M)],
        "markers_latent_vids": np.arange(M),
        "trans": rng.normal(size=(F, 3)).astype(np.float32),
        "fullpose": rng.normal(size=(F, 156)).astype(np.float32) * 0.1,
        "betas": rng.normal(size=16).astype(np.float32),
        "stagei_debug_details": {},
        "stageii_debug_details": {
            "mocap_frame_rate": 120.0,
            "mocap_time_length": F / 120.0,
            "cfg": {
                "surface_model": {"gender": "neutral", "type": "smplh",
                                  "num_betas": 16, "fname": "model.npz"},
                "moshpp": {"optimize_betas": True, "optimize_dynamics": False,
                           "optimize_face": False},
            },
        },
    }
    fname = str(tmp_path / "seq_stageii.pkl")
    with open(fname, "wb") as f:
        pickle.dump(data, f)
    return fname


def test_export_subcommand(tmp_path, capsys):
    pkl = _tiny_stageii_pkl(tmp_path)
    out_npz = str(tmp_path / "seq.npz")
    rc = cli.main(["export", pkl, "-O", out_npz])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    npz = np.load(out_npz, allow_pickle=True)
    assert npz["poses"].shape == (10, 156)
    assert npz["trans"].shape == (10, 3)
    assert npz["betas"].shape == (16,)
    assert npz["pose_body"].shape == (10, 63)
    assert str(npz["surface_model_type"]) == "smplh"
    # the shape-only stage-i npz sibling is written too
    assert (tmp_path / "neutral_stagei.npz").exists()


def test_module_entrypoint_help():
    import subprocess
    import sys
    r = subprocess.run([sys.executable, "-m", "moshpp_tpu", "--help"],
                       capture_output=True, text=True,
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": "/root/repo", "HOME": "/root"},
                       timeout=120)
    assert r.returncode == 0
    assert "run" in r.stdout and "export" in r.stdout and "info" in r.stdout


def test_view_subcommand(tmp_path, capsys):
    rng = np.random.default_rng(5)
    markers = rng.normal(size=(12, 4, 3)).astype(np.float32) * 0.3
    fname = str(tmp_path / "clip.c3d")
    write_mocap_c3d(markers, ["A", "B", "C", "D"], fname, frame_rate=120)
    out = str(tmp_path / "clip.html")
    rc = cli.main(["view", fname, "-O", out])
    assert rc == 0
    html = open(out).read()
    assert "<canvas" in html and '"labels"' in html


def test_layout_subcommand(tmp_path, capsys):
    """layout dumps the optimized stage-i layout JSON; the PLY/C3D
    inspection artifacts need the model file, exercised in test_head."""
    rng = np.random.default_rng(6)
    M = 5
    stagei = {
        "markers_latent": rng.normal(size=(M, 3)).astype(np.float32),
        "latent_labels": [f"MK{i}" for i in range(M)],
        "markers_latent_vids": np.arange(M),
        "betas": rng.normal(size=16).astype(np.float32),
        "marker_meta": {
            "marker_vids": {f"MK{i}": i for i in range(M)},
            "marker_type_mask": {"body": np.ones(M, bool)},
            "m2b_distance": {"body": 0.0095},
            "surface_model_type": "smplh",
        },
        "stagei_debug_details": {
            "cfg": {"surface_model": {"fname": "/nonexistent/model.npz",
                                      "type": "smplh", "num_betas": 16}},
        },
    }
    pkl = str(tmp_path / "subj_stagei.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(stagei, f)
    out = str(tmp_path / "layout.json")
    rc = cli.main(["layout", pkl, "-O", out])
    assert rc == 0
    meta = json.load(open(out))
    assert "markersets" in meta or "marker_vids" in str(meta)
