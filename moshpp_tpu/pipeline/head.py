"""MoSh session head: config-driven end-to-end pipeline with filesystem
caching (reference: `mosh_head.py:65-341, 584-606`).

Keeps the reference's public surface — `MoSh(**cfg)` / `prepare_cfg` /
`mosh_stagei()` / `mosh_stageii()` / `run_moshpp_once(cfg)` — and its on-disk
artifacts: `<subject>_stagei.pkl`, `<basename>_stageii.pkl` with the same key
schema, optimized marker-layout JSON, and AMASS npz export
(`io/amass.load_as_amass_npz`). Stage results are cached by path and
idempotently skipped, which is also the fleet-scale crash-recovery story
(SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import shutil
import time
from glob import glob
from typing import Optional

import numpy as np

from moshpp_tpu.config.config import Config, prepare_cfg
from moshpp_tpu.io.amass import (load_as_amass_npz,
                                 load_as_amass_npz_legacy,
                                 turn_fullpose_into_parts)
from moshpp_tpu.io.mocap import MocapSession
from moshpp_tpu.io.model_loader import load_surface_model
from moshpp_tpu.markers.autogen import marker_labels_to_marker_layout
from moshpp_tpu.markers.layout import (layout_arrays, marker_layout_load,
                                       marker_layout_write)
from moshpp_tpu.markers.vids import general_labels_map
from moshpp_tpu.pipeline import frame_picker
from moshpp_tpu.pipeline.frame_picker import frames_to_arrays
from moshpp_tpu.pipeline.stagei import StageIOptions, mosh_stagei_solve
from moshpp_tpu.pipeline.stageii import (StageIIOptions, mosh_stageii_solve,
                                         prepare_stageii_problem)
from moshpp_tpu.priors.gmm import load_gmm_prior
from moshpp_tpu.utils.logging import get_logger, set_log_file


def _makepath(fname: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(fname)), exist_ok=True)
    return fname


def _weights_table(cfg: Config) -> dict:
    wt_type = cfg.get("opt_settings.weights_type", cfg["surface_model.type"])
    table = cfg["opt_weights"].get(wt_type)
    if table is None:
        table = cfg["opt_weights.smplh"]
    return {k: (v if not hasattr(v, "to_dict") else v.to_dict())
            for k, v in table.items()}


def _stagei_weights(cfg: Config) -> dict:
    t = _weights_table(cfg)
    out = {k[len("stagei_wt_"):]: v for k, v in t.items() if k.startswith("stagei_wt_")}
    return out


def _stageii_weights(cfg: Config) -> dict:
    t = _weights_table(cfg)
    return {k[len("stageii_wt_"):]: v for k, v in t.items() if k.startswith("stageii_wt_")}


class MoSh:
    """Flexible-input session wrapper around the stage-i/ii solvers."""

    def __init__(self, dict_cfg=None, **kwargs) -> None:
        self.cfg = MoSh.prepare_cfg(dict_cfg=dict_cfg, **kwargs)
        cfg = self.cfg
        self.logger = get_logger()

        if cfg["moshpp.verbosity"] > 0:
            prefix = f"{cfg['mocap.session_name']} -- {cfg['mocap.basename']}"
            if cfg["mocap.multi_subject"]:
                prefix += f" -- {cfg['mocap.subject_name']}"
            set_log_file(_makepath(cfg["dirs.log_fname"]), prefix=prefix)

        self.stagei_fname = cfg["dirs.stagei_fname"]
        self.stageii_fname = cfg["dirs.stageii_fname"]
        self.stagei_data = None
        self.stageii_data = None

        if cfg["moshpp.verbosity"] < 0:
            return  # status-only call

        assert os.path.exists(cfg["surface_model.fname"]), FileNotFoundError(
            f"surface_model.fname not found: {cfg['surface_model.fname']}")
        self.logger.info("mocap_fname: %s", cfg["mocap.fname"])
        self.logger.info("stagei_fname: %s", self.stagei_fname)
        self.logger.info("stageii_fname: %s", self.stageii_fname)

    # ------------------------------------------------------------------ cfg
    @staticmethod
    def prepare_cfg(dict_cfg=None, **kwargs) -> Config:
        return prepare_cfg(dict_cfg=dict_cfg, **kwargs)

    # ------------------------------------------------------------- stage I
    def prepare_stagei_frames(self, stagei_mocap_fnames=None):
        cfg = self.cfg
        fp_cfg = cfg["moshpp.stagei_frame_picker"]

        if stagei_mocap_fnames is None:
            assert fp_cfg["type"] != "manual", (
                "manual frame picking needs explicit mocap_frameid entries")
            base = os.path.dirname(cfg["mocap.fname"])
            ext = os.path.basename(cfg["mocap.fname"]).split(".")[-1]
            fnames = sorted(glob(os.path.join(base, f"*.{ext}")))
            assert fnames, f"no sibling mocaps found in {base}"
            n = fp_cfg["num_frames"]
            if len(fnames) > n:
                ids = np.random.choice(len(fnames), n, replace=False)
                fnames = [fnames[i] for i in ids]
            stagei_mocap_fnames = fnames

        common = dict(
            mocap_unit=cfg["mocap.unit"],
            mocap_rotate=cfg.get("mocap.rotate"),
            only_markers=cfg.get("mocap.only_markers"),
            only_subjects=[cfg["mocap.subject_name"]] if cfg["mocap.multi_subject"] else None,
            exclude_markers=cfg.get("mocap.exclude_markers"),
            labels_map=general_labels_map,
        )
        kind = fp_cfg["type"]
        if kind == "random":
            return frame_picker.load_marker_sessions_random(
                stagei_mocap_fnames, num_frames=fp_cfg["num_frames"],
                seed=fp_cfg["seed"],
                least_avail_markers=fp_cfg["least_avail_markers"], **common)
        if kind == "random_strict":
            return frame_picker.load_marker_sessions_random_strict(
                stagei_mocap_fnames, num_frames=fp_cfg["num_frames"],
                seed=fp_cfg["seed"],
                least_avail_markers=fp_cfg["least_avail_markers"], **common)
        if kind == "manual":
            return frame_picker.load_marker_sessions_manual(
                stagei_mocap_fnames, **common)
        raise ValueError(f"unknown frame picker type: {kind}")

    def _load_model(self):
        cfg = self.cfg
        if cfg["surface_model.type"] == "object":
            from moshpp_tpu.models.object_model import (load_rigid_object,
                                                        object_as_surface_model)
            return object_as_surface_model(
                load_rigid_object(cfg["surface_model.fname"]))
        hand_prior = cfg.get("moshpp.pose_hand_prior_fname")
        if hand_prior and not os.path.exists(hand_prior):
            hand_prior = None
        dmpl_fname = None
        if cfg["moshpp.optimize_dynamics"]:
            assert cfg["surface_model.type"] in ("smpl", "smplh"), (
                "DMPLs are only supported by smpl and smplh models")
            dmpl_fname = cfg.get("surface_model.dmpl_fname")
            if dmpl_fname and not os.path.exists(dmpl_fname):
                self.logger.warning("dmpl_fname not found: %s", dmpl_fname)
                dmpl_fname = None
        return load_surface_model(
            cfg["surface_model.fname"],
            surface_model_type=cfg["surface_model.type"],
            pose_hand_prior_fname=hand_prior,
            use_hands_mean=cfg.get("surface_model.use_hands_mean", False),
            dof_per_hand=cfg.get("surface_model.dof_per_hand", 12),
            num_betas=cfg["surface_model.num_betas"],
            v_template_fname=cfg.get("moshpp.v_template_fname"),
            dmpl_fname=dmpl_fname,
            num_dmpls=cfg.get("surface_model.num_dmpls", 8),
        )

    def _load_pose_prior(self, model_type: str):
        cfg = self.cfg
        fname = cfg.get("moshpp.pose_body_prior_fname")
        if not fname or not os.path.exists(fname):
            self.logger.warning("pose body prior not found (%s); solving without", fname)
            return None
        if model_type == "animal_horse":
            from moshpp_tpu.priors.mahalanobis import (
                horse_joint_angle_residual, load_horse_prior,
                mahalanobis_residual)
            import jax.numpy as jnp
            horse = load_horse_prior(fname)

            def horse_prior(pose_body):
                # Mahalanobis prior + leg joint-angle penalty at 2x weight
                # (chmosh.py:356-358, 615-617)
                return jnp.concatenate([
                    mahalanobis_residual(horse, pose_body),
                    2.0 * horse_joint_angle_residual(pose_body)])

            return horse_prior
        if model_type == "animal_dog":
            # max-mixture GMM over the 31-joint subset the dog model
            # articulates (dog_body_prior.py:47-58); the solver applies it to
            # pose[body_ids], which for animal_dog is exactly DOG_POSE_IDS
            from moshpp_tpu.priors.mahalanobis import (DOG_POSE_IDS,
                                                       load_dog_prior)
            dog = load_dog_prior(fname)
            assert dog.dim == len(DOG_POSE_IDS), (
                f"dog prior dim {dog.dim} != {len(DOG_POSE_IDS)} selected dofs")
            return dog
        # exclude hands from the body prior for the hand-PCA families
        # (gmm_prior_ch.py:116)
        npose = 63 if model_type in ("smplh", "smplx") else None
        return load_gmm_prior(fname, npose=npose)

    def mosh_stagei(self, mosh_stagei_func=None) -> str:
        """Run (or load cached) stage-i. `mosh_stagei_func` optionally
        replaces the solver callable (`mosh_stagei_solve` signature) —
        the reference's injection pattern (mosh_head.py:200)."""
        solve = mosh_stagei_func or mosh_stagei_solve
        cfg = self.cfg
        if os.path.exists(self.stagei_fname):
            with open(self.stagei_fname, "rb") as f:
                self.stagei_data = pickle.load(f)
            prev = self.stagei_data["stagei_debug_details"]["cfg"]["surface_model"]["fname"]
            assert prev == cfg["surface_model.fname"], (
                f"cached stage-i used a different surface model: {prev}")
            self.logger.info("loaded cached stage-i: %s", self.stagei_fname)
            return self.stagei_fname

        tm = time.time()
        stagei_frames, stagei_fnames = self.prepare_stagei_frames(
            cfg.get("moshpp.stagei_frame_picker.stagei_mocap_fnames"))

        layout_fname = cfg["dirs.marker_layout.fname"]
        if not os.path.exists(layout_fname):
            chosen = sorted({k for fr in stagei_frames for k in fr})
            marker_labels_to_marker_layout(
                chosen_markers=chosen,
                marker_layout_fname=_makepath(layout_fname),
                surface_model_type=cfg["surface_model.type"],
                labels_map=general_labels_map,
                wrist_markers_on_stick=cfg.get("moshpp.wrist_markers_on_stick", False),
                separate_types=cfg.get("moshpp.separate_types"),
            )

        marker_meta = marker_layout_load(
            layout_fname, labels_map=general_labels_map, include_nan=True,
            exclude_markers=cfg.get("mocap.exclude_markers"),
            exclude_marker_types=cfg.get("mocap.exclude_marker_types"),
            only_markers=cfg.get("mocap.only_markers"))
        arrays = layout_arrays(marker_meta)
        assert marker_meta["surface_model_type"] == cfg["surface_model.type"]

        model = self._load_model()
        prior = self._load_pose_prior(model.model_type)

        betas_init = None
        if cfg.get("moshpp.betas_fname"):
            betas_init = np.load(cfg["moshpp.betas_fname"])["betas"]

        # optional head-marker correlation coupling (chmosh.py:252-266)
        head_corr = None
        hc_fname = cfg.get("moshpp.head_marker_corr_fname")
        if hc_fname and os.path.exists(hc_fname):
            head_meta = np.load(hc_fname)
            head_labels = [str(l) for l in head_meta["mrk_labels"]]
            if all(l in arrays["labels"] for l in head_labels):
                head_ids = [arrays["labels"].index(l) for l in head_labels]
                head_corr = (np.asarray(head_meta["corr"]), np.asarray(head_ids))
                self.logger.info("using head marker correlation (%d markers)",
                                 len(head_ids))

        obs, mask = frames_to_arrays(stagei_frames, arrays["labels"])
        opts = StageIOptions(
            optimize_fingers=cfg["moshpp.optimize_fingers"],
            optimize_face=cfg["moshpp.optimize_face"],
            optimize_toes=cfg["moshpp.optimize_toes"],
            optimize_betas=cfg["moshpp.optimize_betas"],
            num_betas=cfg["surface_model.num_betas"],
            num_expressions=cfg.get("surface_model.num_expressions", 10),
            expr_start=cfg.get("surface_model.betas_expr_start_id", 300),
            maxiter=cfg["opt_settings.maxiter"],
            e_3=float(cfg["opt_settings.stagei_lr"]),
            weights=_stagei_weights(cfg),
        )
        result = solve(
            model, obs, mask, arrays["labels"], arrays["vids"], arrays["m2b"],
            arrays["type_masks"], opts=opts, prior=prior, betas_init=betas_init,
            head_corr=head_corr)

        stagei_data = {
            "betas": result.betas,
            "markers_latent": result.markers_latent,
            "latent_labels": result.latent_labels,
            "marker_meta": dict(marker_meta),
            "markers_latent_vids": result.markers_latent_vids,
            "stagei_debug_details": {
                "opt_models_trans": list(result.trans),
                "opt_models_pose": list(result.poses),
                "stagei_errs": result.errs,
                "stagei_markers_sim": list(result.markers_sim),
                "stagei_markers_obs": list(obs),
                "stagei_labels_obs": [
                    [l for l, m in zip(result.latent_labels, fm) if m]
                    for fm in mask],
                "stagei_fnames": list(stagei_fnames),
                "stagei_frames": list(stagei_frames),
                "cfg": cfg.to_dict(),
                "stagei_elapsed_time": time.time() - tm,
            },
        }
        if cfg.get("moshpp.v_template_fname"):
            stagei_data["v_template_fname"] = cfg["moshpp.v_template_fname"]

        with open(_makepath(self.stagei_fname), "wb") as f:
            pickle.dump(stagei_data, f)
        self.stagei_data = stagei_data
        self.logger.info("created stagei_fname: %s (%.1fs)", self.stagei_fname,
                         stagei_data["stagei_debug_details"]["stagei_elapsed_time"])

        if cfg.get("dirs.write_optimized_marker_layout", True):
            MoSh.dump_stagei_marker_layout(self.stagei_fname)
        return self.stagei_fname

    # ------------------------------------------------------------ stage II
    def mosh_stageii(self, mosh_stageii_func=None) -> str:
        """Run (or load cached) stage-ii. `mosh_stageii_func` optionally
        replaces the solver callable (`mosh_stageii_solve` signature) —
        the reference's injection pattern (mosh_head.py:268)."""
        solve = mosh_stageii_func or mosh_stageii_solve
        cfg = self.cfg
        if self.stagei_data is None:
            raise ValueError(f"run stage-i first ({self.stagei_fname} missing)")
        if os.path.exists(self.stageii_fname):
            with open(self.stageii_fname, "rb") as f:
                self.stageii_data = pickle.load(f)
            self.logger.info("loaded cached stage-ii: %s", self.stageii_fname)
            return self.stageii_fname

        tm = time.time()
        mocap = MocapSession(
            cfg["mocap.fname"], mocap_unit=cfg["mocap.unit"],
            mocap_rotate=cfg.get("mocap.rotate"),
            labels_map=general_labels_map,
            only_subjects=[cfg["mocap.subject_name"]] if cfg["mocap.multi_subject"] else None)

        model = self._load_model()
        prior = self._load_pose_prior(model.model_type)
        latent_labels = list(self.stagei_data["latent_labels"])

        end = cfg["mocap.end_fidx"]
        frame_ids = np.arange(len(mocap))[
            cfg["mocap.start_fidx"]: (None if end == -1 else end): cfg["mocap.ds_rate"]]
        obs_all, mask_all = mocap.markers_for_labels(latent_labels)
        obs, mask = obs_all[frame_ids], mask_all[frame_ids]

        opts = StageIIOptions(
            optimize_fingers=cfg["moshpp.optimize_fingers"],
            optimize_face=cfg["moshpp.optimize_face"],
            optimize_toes=cfg["moshpp.optimize_toes"],
            optimize_dynamics=cfg["moshpp.optimize_dynamics"],
            num_betas=cfg["surface_model.num_betas"],
            num_dmpls=cfg.get("surface_model.num_dmpls", 8),
            num_expressions=cfg.get("surface_model.num_expressions", 10),
            expr_start=cfg.get("surface_model.betas_expr_start_id", 300),
            maxiter=cfg["opt_settings.maxiter"],
            smoothing_sweeps=cfg.get("opt_settings.smoothing_sweeps", 2),
            chunk_frames=cfg.get("opt_settings.chunk_frames", 16384),
            chunk_halo=cfg.get("opt_settings.chunk_halo", 32),
            weights=_stageii_weights(cfg),
        )
        # mid-stage crash recovery: long chunked runs checkpoint each solved
        # chunk beside the output pkl; a rerun after a crash resumes at the
        # first unsolved chunk (the reference restarts the whole sequential
        # loop, mosh_head.py:272). Removed once the stage pkl is written.
        if (cfg.get("opt_settings.chunk_checkpoint", True)
                and opts.chunk_frames and len(obs) > opts.chunk_frames):
            opts = dataclasses.replace(
                opts, checkpoint_dir=self.stageii_fname + ".ckpt")
        betas = self.stagei_data["betas"]
        if betas is None:
            betas = np.zeros(cfg["surface_model.num_betas"], np.float32)
        prob = prepare_stageii_problem(
            model, betas, self.stagei_data["markers_latent"], opts=opts)
        # per-phase per-objective telemetry, reference-style
        # (chmosh.py:408-417, 662-707)
        want_report = (mosh_stageii_func is None
                       and cfg["moshpp.verbosity"] >= 1)
        if want_report:
            result, report = solve(prob, opts, obs, mask, prior=prior,
                                   model_type=model.model_type,
                                   return_report=True)
            self.logger.info("stage-ii per-phase energies:\n%s",
                             report.format_table())
        else:
            result = solve(prob, opts, obs, mask, prior=prior,
                           model_type=model.model_type)

        labels_obs = [[l for l, m in zip(latent_labels, fm) if m] for fm in mask]
        stageii_data = {
            "trans": np.asarray(result.trans),
            "fullpose": np.asarray(result.fullpose),
            "stageii_debug_details": {
                "stageii_errs": {"data_mean_m": np.asarray(result.data_err)},
                "markers_sim": np.asarray(result.markers_sim),
                "markers_obs": obs,
                "labels_obs": labels_obs,
                "markers_orig": mocap.markers[frame_ids],
                "labels_orig": mocap.labels,
                "mocap_fname": cfg["mocap.fname"],
                "mocap_frame_rate": mocap.frame_rate,
                "mocap_time_length": mocap.time_length(),
                "stageii_elapsed_time": None,  # filled below
                "cfg": cfg.to_dict(),
            },
        }
        if cfg["moshpp.optimize_dynamics"]:
            stageii_data["dmpls"] = np.asarray(result.extra)
        if cfg["moshpp.optimize_face"]:
            stageii_data["expression"] = np.asarray(result.extra)

        stageii_data.update(self.stagei_data)
        stageii_data["stageii_debug_details"]["stageii_elapsed_time"] = time.time() - tm

        with open(_makepath(self.stageii_fname), "wb") as f:
            pickle.dump(stageii_data, f)
        if opts.checkpoint_dir:
            shutil.rmtree(opts.checkpoint_dir, ignore_errors=True)
        self.stageii_data = stageii_data
        self.logger.info("created stageii_fname: %s (%.1fs)", self.stageii_fname,
                         stageii_data["stageii_debug_details"]["stageii_elapsed_time"])
        return self.stageii_fname

    # -------------------------------------------------------------- exports
    @staticmethod
    def extract_marker_layout_from_mosh(mosh_stagei_pkl_fname,
                                        template_marker_layout_fname=None) -> dict:
        """Layout with stage-i-optimized vids substituted
        (mosh_head.py:561-581)."""
        import copy
        if isinstance(mosh_stagei_pkl_fname, dict):
            mosh_stagei = mosh_stagei_pkl_fname
        else:
            with open(mosh_stagei_pkl_fname, "rb") as f:
                mosh_stagei = pickle.load(f)
        opt_vids = mosh_stagei["markers_latent_vids"]
        if template_marker_layout_fname:
            meta = marker_layout_load(template_marker_layout_fname)
        else:
            meta = copy.deepcopy(mosh_stagei["marker_meta"])
        for l in meta["marker_vids"]:
            if l in opt_vids:
                meta["marker_vids"][l] = opt_vids[l]
        return meta

    @staticmethod
    def dump_stagei_marker_layout(mosh_stagei_pkl_fname,
                                  out_marker_layout_fname=None,
                                  template_marker_layout_fname=None) -> None:
        """Write the optimized layout JSON (+ PLY/C3D inspection artifacts,
        mosh_head.py:303-340)."""
        meta = MoSh.extract_marker_layout_from_mosh(
            mosh_stagei_pkl_fname, template_marker_layout_fname)
        if out_marker_layout_fname is None:
            out_marker_layout_fname = str(mosh_stagei_pkl_fname).replace(".pkl", ".json")
        marker_layout_write(meta, out_marker_layout_fname)
        logger = get_logger()
        logger.info("created %s", out_marker_layout_fname)
        try:
            from moshpp_tpu.tools.visualization import (marker_layout_as_mesh,
                                                        marker_layout_to_c3d)
            with open(mosh_stagei_pkl_fname, "rb") as f:
                stagei = pickle.load(f)
            cfg = stagei["stagei_debug_details"]["cfg"]
            sm_fname = cfg["surface_model"]["fname"]
            body_parms = {}
            if stagei.get("betas") is not None:
                body_parms["betas"] = np.asarray(stagei["betas"])[
                    : cfg["surface_model"]["num_betas"]]
            marker_layout_as_mesh(
                sm_fname, body_parms=body_parms,
                surface_model_type=cfg["surface_model"]["type"])(
                out_marker_layout_fname,
                str(mosh_stagei_pkl_fname).replace(".pkl", ".ply"))
            marker_layout_to_c3d(
                out_marker_layout_fname, surface_model_fname=sm_fname,
                surface_model_type=cfg["surface_model"]["type"],
                out_c3d_fname=str(mosh_stagei_pkl_fname).replace(".pkl", ".c3d"))
        except Exception as e:  # inspection artifacts are best-effort
            logger.warning("layout mesh/c3d export skipped: %s", e)

    load_as_amass_npz = staticmethod(load_as_amass_npz)
    load_as_amass_npz_legacy = staticmethod(load_as_amass_npz_legacy)


def run_moshpp_once(cfg) -> MoSh:
    """End-to-end single-sequence run (mosh_head.py:584-606)."""
    mp = MoSh(**cfg) if isinstance(cfg, dict) else MoSh(dict_cfg=cfg.to_dict())
    mp.mosh_stagei()
    logger = get_logger()
    logger.info("stage-i errs: %s", mp.stagei_data["stagei_debug_details"]["stagei_errs"])
    if not mp.cfg.get("runtime.stagei_only", False):
        mp.mosh_stageii()
        errs = mp.stageii_data["stageii_debug_details"]["stageii_errs"]
        logger.info("stage-ii mean data err: %.4f mm",
                    1000.0 * float(np.mean(errs["data_mean_m"])))
    return mp
