"""Deterministic per-family tiny problems for the recorded-fixture parity
pack.

Real chumpy outputs need license-gated SMPL files and a reference install
(neither exists here), so the closest attainable regression net is a set of
COMMITTED golden outputs: for each model family, a fixed tiny stage-ii
problem whose (a) residual vector at a fixed probe point and (b) full-solve
outcome are recorded in tests/goldens/*.npz. Any change to weight tables,
prior whitening, or system assembly moves (a) far beyond fp noise; solver
regressions move (b).

Regenerate with `python tools/make_goldens.py` (CPU) after an INTENTIONAL
semantics change, and say why in the commit message.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.models.body_model import pose_part_ids
from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import (StageIIOptions, make_stageii_residual,
                                         prepare_stageii_problem,
                                         mosh_stageii_solve, _num_extra)
from moshpp_tpu.priors import make_gmm_prior

FAMILIES = ("smpl", "smplh", "smplx", "mano", "animal_horse", "animal_dog",
            "object")

_MK = {
    # family-specific model/options knobs; every family gets 300 verts,
    # 10 markers, 4 frames
    "smpl": dict(),
    "smplh": dict(dof_per_hand=6),
    "smplx": dict(dof_per_hand=6, num_shape_dirs=20),
    "mano": dict(dof_per_hand=6),
    "animal_horse": dict(),
    "animal_dog": dict(),
    "object": dict(),
}


def _family_opts(family: str) -> StageIIOptions:
    if family == "smplx":
        return StageIIOptions(maxiter=40, smoothing_sweeps=1, anchor_stride=2,
                              optimize_fingers=True, optimize_face=True,
                              num_expressions=4, expr_start=16)
    if family == "smplh":
        return StageIIOptions(maxiter=40, smoothing_sweeps=1, anchor_stride=2,
                              optimize_fingers=True)
    return StageIIOptions(maxiter=40, smoothing_sweeps=1, anchor_stride=2)


def _family_prior(family: str):
    if family in ("mano", "object"):
        return None
    dim = len(pose_part_ids(family, optimize_toes=True)["body"])
    if family == "animal_horse":
        # callable prior, as head wires for the horse (mahalanobis residual
        # around a fixed synthetic mean — deterministic, seed-pinned)
        mean = jnp.asarray(
            np.random.default_rng(21).normal(size=dim) * 0.05, jnp.float32)
        return lambda pose_body: (pose_body - mean) * 0.8
    return make_gmm_prior(dim=dim, num_components=3, seed=13, scale=0.3)


def build_family_problem(family: str):
    """Deterministic tiny stage-ii problem + fixed probe point."""
    rng = np.random.default_rng(101)
    M, F = 10, 4
    if family == "object":
        from moshpp_tpu.models.object_model import (RigidObjectModel,
                                                    object_as_surface_model)
        from moshpp_tpu.models.synthetic import icosphere
        sv, sf = icosphere(2)
        obj = RigidObjectModel(
            v_template=jnp.asarray(sv * np.array([0.11, 0.07, 0.19]),
                                   jnp.float32),
            faces=jnp.asarray(sf, jnp.int32))
        model = object_as_surface_model(obj)
    else:
        model = make_synthetic_model(family, num_verts=300, seed=9,
                                     **_MK[family])
    opts = _family_opts(family)
    prior = _family_prior(family)

    nb = min(16, model.num_shape_dirs)
    betas = (rng.normal(size=nb) * 0.3).astype(np.float32)
    if family == "object":
        betas = np.zeros(nb, np.float32)      # rigid: no shape space
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :nb], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], M, replace=False)
    latents = (can_v[vids] + vn[vids] * 0.0095).astype(np.float32)
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)

    # smooth truth motion: random-walk poses, drifting trans
    P = model.pose_dof
    poses = np.zeros((F, P), np.float32)
    poses[0] = rng.normal(size=P) * 0.12
    for f in range(1, F):
        poses[f] = poses[f - 1] + rng.normal(size=P) * 0.03
    trans = (np.cumsum(rng.normal(size=(F, 3)) * 0.02, axis=0)).astype(
        np.float32)

    def sim(p, t):
        return reconstruct_markers(lbs_forward(model, p, jnp.asarray(betas), t),
                                   idx, coeffs)

    obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
    mask = np.ones((F, M), bool)
    mask[1, :2] = False            # two markers missing in one frame

    prob = prepare_stageii_problem(model, betas, latents, opts=opts)
    E = _num_extra(prob.sub_model, opts)
    Psub = prob.sub_model.pose_dof

    x_probe = jnp.asarray(
        np.random.default_rng(33).normal(size=3 + Psub + E) * 0.15,
        jnp.float32)
    aux_probe = {
        "markers": jnp.asarray(obs[0]),
        "mask": jnp.asarray(mask[0], jnp.float32),
        "wt_data": jnp.float32(400.0 * 46.0 / M),
        "anneal": jnp.float32(1.0),
        "wt_pose_scale": jnp.float32(1.0),
        "velo_anchor": jnp.zeros(Psub, jnp.float32),
        "velo_on": jnp.float32(0.0),
        "extra_anchor": jnp.zeros(E, jnp.float32),
        "extra_on": jnp.float32(1.0 if E else 0.0),
    }
    return dict(model=model, prob=prob, opts=opts, prior=prior, obs=obs,
                mask=mask, x_probe=x_probe, aux_probe=aux_probe)


def golden_probe(family: str) -> np.ndarray:
    """Residual rows at the fixed probe point — pins weights/priors/assembly
    to fp noise."""
    fp = build_family_problem(family)
    residual = make_stageii_residual(fp["prob"], fp["opts"], fp["prior"],
                                     family)
    return np.asarray(residual(fp["x_probe"], fp["aux_probe"]))


def golden_solve(family: str, in_subprocess: bool = True) -> dict:
    """Full tiny stage-ii solve outcome.

    Runs in a FRESH interpreter by default: XLA:CPU segfaults compiling one
    of these phase programs once the parent process has substantial prior
    compile state — four consecutive full-suite runs died at this test with
    the persistent cache warm (segv in cache get), cold (segv in cache put)
    and fully bypassed (segv in backend_compile_and_load), while isolated
    runs always pass. Out-of-process, the child hits the warm persistent
    cache, so the cost is one interpreter start per family."""
    if in_subprocess:
        return _golden_solve_subprocess(family)
    fp = build_family_problem(family)
    res = mosh_stageii_solve(fp["prob"], fp["opts"], fp["obs"], fp["mask"],
                             prior=fp["prior"], model_type=family)
    return {
        "data_err": np.asarray(res.data_err),
        "markers_sim": np.asarray(res.markers_sim),
        "trans": np.asarray(res.trans),
    }


_CHILD_CODE = """
import pickle, sys
sys.path.insert(0, sys.argv[3])           # repo root
sys.path.insert(0, sys.argv[4])           # tests dir
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize forces remote TPU
from moshpp_tpu.utils.cache import setup_jax_cache
setup_jax_cache()
from golden_common import golden_solve
r = golden_solve(sys.argv[1], in_subprocess=False)
with open(sys.argv[2], "wb") as f:
    pickle.dump(r, f)
"""


def _golden_solve_subprocess(family: str) -> dict:
    import pickle
    import subprocess
    import sys
    import tempfile

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(tests_dir)
    with tempfile.NamedTemporaryFile(suffix=".pkl") as out:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD_CODE, family, out.name,
             repo_root, tests_dir],
            capture_output=True, timeout=1800)
        assert r.returncode == 0, (
            f"golden_solve({family}) subprocess rc={r.returncode}:\n"
            f"{r.stderr.decode()[-2000:]}")
        with open(out.name, "rb") as f:
            return pickle.load(f)


def build_stagei_problem():
    """Deterministic tiny stage-i problem (smplh: the flagship family)."""
    from moshpp_tpu.pipeline.stagei import StageIOptions, prepare_stagei_context

    rng = np.random.default_rng(77)
    model = make_synthetic_model("smplh", num_verts=300, seed=17,
                                 dof_per_hand=6)
    M, F = 10, 3
    betas_true = (rng.normal(size=16) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas_true)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], M, replace=False)
    latents_true = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents_true))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents_true), idx)
    poses = (rng.normal(size=(F, model.pose_dof)) * 0.1).astype(np.float32)
    trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

    def sim(p, t):
        return reconstruct_markers(
            lbs_forward(model, p, jnp.asarray(betas_true), t), idx, coeffs)

    obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
    prior = make_gmm_prior(dim=63, num_components=3, seed=23, scale=0.3)
    opts = StageIOptions(maxiter=40, num_betas=16)
    kwargs = dict(
        frames_obs=obs, frames_mask=np.ones((F, M), bool),
        layout_vids=vids, m2b=np.full(M, 0.0095, np.float32),
        type_masks={"body": np.ones(M, bool)}, opts=opts, prior=prior)
    ctx, state = prepare_stagei_context(model, **kwargs)
    return dict(model=model, opts=opts, prior=prior, kwargs=kwargs,
                ctx=ctx, state=state,
                labels=[f"L{i}" for i in range(M)])


def golden_stagei_probe() -> np.ndarray:
    """Stage-i step-residual rows at the deterministic init state — pins the
    annealed objective assembly (weights, anchors, surface term, prior)."""
    from moshpp_tpu.pipeline.stagei import build_stagei_step

    sp = build_stagei_problem()
    betas, latents, poses, trans, _ = sp["state"]
    residual, _ = build_stagei_step(sp["ctx"], betas, latents, anneal=1.0,
                                    detailed=True)
    x0 = sp["ctx"].lay.pack(betas, latents, poses, trans, None)
    return np.asarray(residual(x0))


def golden_stagei_solve() -> dict:
    from moshpp_tpu.pipeline.stagei import mosh_stagei_solve

    sp = build_stagei_problem()
    res = mosh_stagei_solve(sp["model"], latent_labels=sp["labels"],
                            **sp["kwargs"])
    return {
        "betas": np.asarray(res.betas),
        "markers_latent": np.asarray(res.markers_latent),
        "data_mean_m": np.float64(res.errs["data_mean_m"]),
    }
