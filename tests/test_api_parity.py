"""API-parity contract: every reference capability's counterpart named in
docs/MIGRATION.md must exist and be importable.

One test per reference layer (SURVEY.md §1-§2); a rename or dropped export
fails here before any user notices.
"""

import importlib

import pytest


def _has(module: str, *names: str):
    mod = importlib.import_module(module)
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, f"{module} missing: {missing}"


def test_head_and_pipeline():
    _has("moshpp_tpu.pipeline.head", "MoSh", "run_moshpp_once")
    _has("moshpp_tpu.config", "prepare_cfg")
    _has("moshpp_tpu.pipeline.jobs", "universal_mosh_jobs_filter")
    _has("moshpp_tpu.pipeline", "run_moshpp_fleet", "FleetReport")
    _has("moshpp_tpu.io.amass", "load_as_amass_npz", "load_as_amass_npz_legacy",
         "turn_fullpose_into_parts")
    from moshpp_tpu.pipeline.head import MoSh
    for meth in ("prepare_cfg", "mosh_stagei", "mosh_stageii",
                 "load_as_amass_npz", "load_as_amass_npz_legacy",
                 "dump_stagei_marker_layout", "prepare_stagei_frames"):
        assert hasattr(MoSh, meth), meth


def test_solvers():
    _has("moshpp_tpu.pipeline", "mosh_stagei_solve", "mosh_stageii_solve",
         "StageIOptions", "StageIIOptions", "prepare_stageii_problem")
    _has("moshpp_tpu.solver", "dogleg_solve", "batched_dogleg_solve",
         "DoglegOptions", "SolveResult")


def test_models():
    _has("moshpp_tpu.models", "SurfaceModel", "lbs_forward",
         "forward_kinematics", "fullpose_from_pose", "pose_part_ids",
         "MODEL_TYPE_INFO", "RigidObjectModel", "rigid_object_forward",
         "make_synthetic_model")
    _has("moshpp_tpu.io", "load_surface_model", "load_dmpl_eigvecs")


def test_priors():
    _has("moshpp_tpu.priors", "MaxMixturePrior", "gmm_prior_residual",
         "make_gmm_prior", "load_gmm_prior", "MahalanobisPrior",
         "mahalanobis_residual", "load_horse_prior",
         "horse_joint_angle_residual", "load_dog_prior")
    _has("moshpp_tpu.priors.gm_prior", "fit_graphical_lasso_prior",
         "SubjectPriorCache")


def test_ops():
    _has("moshpp_tpu.ops", "marker_coeffs", "reconstruct_markers",
         "closest_point_on_triangles", "point_to_mesh_distance",
         "signed_point_to_mesh_distance", "gmof", "signed_sqrt",
         "vertex_normals", "face_normals", "kabsch", "knn", "nearest_vertex",
         "rodrigues", "rodrigues_inverse")
    _has("moshpp_tpu.ops.scan2mesh", "sample_from_mesh", "scan_to_mesh",
         "mesh_to_scan", "pts_to_mesh", "clamped_signed_pts_to_mesh")
    _has("moshpp_tpu.ops.marker_transform", "select_frame_indices")


def test_mocap_and_markers():
    _has("moshpp_tpu.io", "MocapSession", "read_mocap", "write_mocap_c3d",
         "read_c3d", "write_c3d", "read_ply", "write_ply")
    _has("moshpp_tpu.pipeline.frame_picker", "load_marker_sessions_manual",
         "load_marker_sessions_random", "load_marker_sessions_random_strict")
    _has("moshpp_tpu.markers", "marker_layout_load", "marker_layout_write",
         "marker_meta_filter", "merge_marker_layouts",
         "marker_labels_to_marker_layout", "all_marker_vids",
         "general_labels_map", "marker_type_labels", "smplh2smplx_vids",
         "smplx2smplh_vids", "smplx_eyeball_vids", "marker_meta_smplh2smplx",
         "marker_meta_smplx2smplh", "find_vertex_neighbours",
         "randomize_marker_layout_vids")


def test_visualization_and_scaling():
    _has("moshpp_tpu.tools.visualization", "marker_layout_as_mesh",
         "marker_layout_to_c3d", "export_pose_estimate",
         "play_mocap_trajectories", "phase_snapshot_writer")
    _has("moshpp_tpu.parallel", "frame_mesh", "pad_frames",
         "mosh_stageii_solve_sharded")
    _has("moshpp_tpu.parallel.multihost", "initialize_multihost")


def test_cli():
    _has("moshpp_tpu.cli", "main", "build_parser")


@pytest.mark.parametrize("family", ["smpl", "smplh", "smplx", "mano",
                                    "animal_horse", "animal_dog", "object"])
def test_model_family_registered(family):
    from moshpp_tpu.models import MODEL_TYPE_INFO
    assert family in MODEL_TYPE_INFO
