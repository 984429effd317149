"""Marker database, layout merge/remap/randomize, and visualization exports."""

import json
import os

import numpy as np
import pytest

from moshpp_tpu.markers import (all_marker_vids, general_labels_map,
                                marker_labels_to_marker_layout,
                                marker_layout_load, marker_layout_write,
                                marker_meta_filter, marker_meta_smplh2smplx,
                                marker_meta_smplx2smplh, merge_marker_layouts,
                                marker_type_labels, smplh2smplx_vids)
from moshpp_tpu.markers.layout import layout_arrays
from moshpp_tpu.markers.vids import smplx_eyeball_mask


class TestDatabases:
    def test_tables_populated(self):
        assert len(all_marker_vids["smpl"]) > 150
        assert len(all_marker_vids["smplx"]) > 200
        assert all_marker_vids["smplh"]["ARIEL"] == all_marker_vids["smpl"]["ARIEL"]
        assert general_labels_map["HEAD_TOP"] == "ARIEL"
        assert "RWRA" in marker_type_labels["wrist"]

    def test_vid_ranges(self):
        assert max(all_marker_vids["smpl"].values()) < 6890
        assert max(all_marker_vids["smplx"].values()) < 10475

    def test_smplh2smplx_roundtrip_sanity(self):
        vids = [10, 500, 3000, 6889]
        out = smplh2smplx_vids(vids)
        assert all(0 <= v < 10475 for v in out)
        assert smplh2smplx_vids(10) == out[0]

    def test_eyeball_mask(self):
        m = smplx_eyeball_mask(10475)
        assert m.sum() == 1092 and m[9383] and not m[9382]
        assert smplx_eyeball_mask(6890).sum() == 0


class TestAutogenAndLayout:
    def test_autogen_from_vendor_labels(self, tmp_path):
        fname = str(tmp_path / "layout.json")
        meta = marker_labels_to_marker_layout(
            ["HEAD_TOP", "L_ANKLE", "RWRA", "C7", "NOSUCHLABEL"],
            fname, "smplh")
        loaded = marker_layout_load(fname, labels_map=general_labels_map)
        assert "ARIEL" in loaded["marker_vids"]   # alias applied
        assert "LANK" in loaded["marker_vids"]
        assert "NOSUCHLABEL" not in loaded["marker_vids"]
        assert loaded["surface_model_type"] == "smplh"
        arrays = layout_arrays(loaded)
        assert arrays["vids"].max() < 6890
        assert np.allclose(arrays["m2b"], 0.0095)

    def test_filter(self, tmp_path):
        fname = str(tmp_path / "l.json")
        marker_labels_to_marker_layout(["ARIEL", "C7", "LANK", "RANK"], fname, "smpl")
        meta = marker_layout_load(fname)
        sub = marker_meta_filter(meta, ["ARIEL", "LANK"])
        assert list(sub["marker_vids"]) == ["ARIEL", "LANK"]
        assert len(sub["marker_type_mask"]["body"]) == 2

    def test_merge_superset(self, tmp_path):
        f1, f2 = str(tmp_path / "a.json"), str(tmp_path / "b.json")
        marker_layout_write({
            "marker_vids": {"ARIEL": 411, "C7": 3470},
            "marker_type_mask": {"body": np.array([True, True])},
            "m2b_distance": {"body": 0.0095},
            "surface_model_type": "smpl"}, f1)
        marker_layout_write({
            "marker_vids": {"ARIEL": 400, "LANK": 3327},
            "marker_type_mask": {"body": np.array([True, True])},
            "m2b_distance": {"body": 0.0095},
            "surface_model_type": "smpl"}, f2)
        out = str(tmp_path / "merged.json")
        merged = merge_marker_layouts([f1, f2], out_fname=out)
        assert sorted(merged["marker_vids"]["ARIEL"]) == [400, 411]
        assert merged["marker_vids"]["LANK"] == [3327]
        assert os.path.exists(out)

    def test_family_remap(self, tmp_path):
        fname = str(tmp_path / "l.json")
        marker_labels_to_marker_layout(["ARIEL", "LANK"], fname, "smplh")
        meta = marker_layout_load(fname)
        x = marker_meta_smplh2smplx(meta)
        assert x["surface_model_type"] == "smplx"
        back = marker_meta_smplx2smplh(x)
        assert back["surface_model_type"] == "smplh"
        for l in meta["marker_vids"]:
            assert 0 <= x["marker_vids"][l] < 10475


class TestRandomize:
    def test_randomize_vids_within_neighbourhood(self, tmp_path, rng):
        from moshpp_tpu.markers.randomize import (randomize_marker_layout_vids,
                                                  vertex_adjacency)
        from moshpp_tpu.models import make_synthetic_model
        from moshpp_tpu.models.synthetic import save_synthetic_npz

        m = make_synthetic_model("smpl", num_verts=200, seed=12)
        path = str(tmp_path / "m.npz")
        save_synthetic_npz(m, path)
        marker_vids = {"A": 5, "B": 50}
        get_next = randomize_marker_layout_vids(
            marker_vids, {"body": [True, True]}, path, n_ring=1, seed=3)
        adj = vertex_adjacency(np.asarray(m.faces), m.v_template.shape[0])
        for _ in range(5):
            nxt = get_next()
            assert nxt["A"] in set(adj[5]) | {5}
            assert nxt["B"] in set(adj[50]) | {50}


class TestVisualization:
    def test_layout_mesh_and_c3d_export(self, tmp_path):
        from moshpp_tpu.models import make_synthetic_model
        from moshpp_tpu.models.synthetic import save_synthetic_npz
        from moshpp_tpu.tools.visualization import (marker_layout_as_mesh,
                                                    marker_layout_to_c3d)
        from moshpp_tpu.io.ply import read_ply
        from moshpp_tpu.io.c3d import read_c3d

        m = make_synthetic_model("smpl", num_verts=200, seed=13)
        model_path = str(tmp_path / "m.npz")
        save_synthetic_npz(m, model_path)
        layout = str(tmp_path / "l.json")
        marker_layout_write({
            "marker_vids": {"A": 5, "B": 50, "C": 120},
            "marker_type_mask": {"body": np.array([True] * 3)},
            "m2b_distance": {"body": 0.0095},
            "surface_model_type": "smpl"}, layout)

        ply_out = str(tmp_path / "l.ply")
        out = marker_layout_as_mesh(model_path, surface_model_type="smpl")(
            layout, ply_out)
        assert out["markers"].shape == (3, 3)
        v, f = read_ply(ply_out)
        assert len(v) > m.v_template.shape[0]  # body + marker spheres

        c3d_out = str(tmp_path / "l.c3d")
        marker_layout_to_c3d(layout, model_path, surface_model_type="smpl",
                             out_c3d_fname=c3d_out)
        c3 = read_c3d(c3d_out)
        assert c3.labels == ["A", "B", "C"]
        assert c3.num_frames == 100


class TestVisualizationExtras:
    def test_play_mocap_trajectories_html(self, tmp_path, rng):
        from moshpp_tpu.tools.visualization import play_mocap_trajectories
        markers = rng.normal(size=(20, 8, 3)).astype(np.float32)
        markers[3, 2] = 0.0                      # missing marker
        out = play_mocap_trajectories(markers, str(tmp_path / "traj.html"),
                                      labels=[f"L{i}" for i in range(8)],
                                      frame_rate=60.0)
        html = open(out).read()
        assert "<canvas" in html and '"fps": 60.0' in html
        assert '"L7"' in html

    @pytest.mark.slow    # runs a real (tiny) stage-ii solve per phase
    def test_phase_snapshot_hook(self, tmp_path, rng):
        import jax.numpy as jnp
        from moshpp_tpu.models import make_synthetic_model, lbs_forward
        from moshpp_tpu.ops.marker_transform import (
            marker_coeffs, reconstruct_markers, select_frame_indices)
        from moshpp_tpu.ops.surface import vertex_normals
        from moshpp_tpu.pipeline.stageii import (StageIIOptions,
                                                 mosh_stageii_solve,
                                                 prepare_stageii_problem)
        from moshpp_tpu.tools.visualization import phase_snapshot_writer

        model = make_synthetic_model("smpl", num_verts=200, seed=2)
        betas = (rng.normal(size=10) * 0.3).astype(np.float32)
        can_v = np.asarray(model.v_template) + np.einsum(
            "vcb,b->vc", np.asarray(model.shapedirs)[..., :10], betas)
        vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
        vids = rng.choice(200, 8, replace=False)
        latents = can_v[vids] + vn[vids] * 0.0095
        idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
        coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
        F = 6
        poses = rng.normal(size=(F, model.pose_dof)).astype(np.float32) * 0.1
        trans = rng.normal(size=(F, 3)).astype(np.float32) * 0.05
        obs = np.stack([np.asarray(reconstruct_markers(lbs_forward(
            model, jnp.asarray(poses[t]), jnp.asarray(betas),
            jnp.asarray(trans[t])), idx, coeffs)) for t in range(F)])

        opts = StageIIOptions(maxiter=10, smoothing_sweeps=1, num_betas=10,
                              anchor_stride=1, jac_backend="xla")
        prob = prepare_stageii_problem(model, betas, latents, opts=opts)
        hook = phase_snapshot_writer(str(tmp_path / "snaps"))
        mosh_stageii_solve(prob, opts, obs, np.ones((F, 8), bool),
                           model_type="smpl", on_phase=hook)
        snaps = sorted((tmp_path / "snaps").glob("*.npz"))
        assert len(snaps) >= 5                    # one per phase
        d = np.load(snaps[-1])
        assert d["markers_sim"].shape == (F, 8, 3)
