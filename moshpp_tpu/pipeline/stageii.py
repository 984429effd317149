"""Stage II — per-frame pose (+trans, +DMPL, +expression) estimation.

The reference solves mocap frames *sequentially*, warm-starting each frame
from the previous one (`chmosh.py:458-741`: rigid init + 3-stage annealed
prior schedule on the first frame :629-655, then per frame a trans+body solve
:665-671 and a full-pose solve :676-705, with a velocity-extrapolation
anchor from the two previous frames :624-626).

The TPU formulation makes the frame axis data-parallel:

  pass A (independent): every frame gets the reference's *first-frame*
    treatment — per-frame Kabsch rigid init, then batched dogleg solves with
    the annealed pose-prior schedule [10w, 5w, w], then the step-1
    (trans+body, e_3=.01) and step-2 (full pose) solves — all `vmap`ped.
  pass B (smoothing sweeps): the sequential velocity term
    pose_t ~ 2 pose_{t-1} - pose_{t-2} is re-created by Jacobi sweeps:
    anchors computed from the previous sweep's solutions, then one batched
    step-2 re-solve. Two sweeps reproduce the warm-start smoothness
    semantics without any sequential dependency.

Weight semantics match the reference exactly: wt_data scales by
46/num_observed (chmosh.py:603), prior weights scale by the missing-marker
anneal factor 1 + missing_frac * stageii_wt_annealing (:596-609).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.models.body_model import (MODEL_TYPE_INFO, SurfaceModel,
                                          fullpose_from_pose, lbs_forward,
                                          pose_part_ids)
from moshpp_tpu.ops.marker_transform import (MarkerFrameIndices, marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.rigid_align import kabsch
from moshpp_tpu.ops.rodrigues import rodrigues_inverse
from moshpp_tpu.priors.gmm import MaxMixturePrior, gmm_prior_residual
from moshpp_tpu.solver.gauss_newton import (DoglegOptions, batched_dogleg_solve)

NUM_TRAIN_MARKERS = 46.0  # weight-normalization constant (chmosh.py:460)

DEFAULT_STAGEII_WEIGHTS = {
    # smplh/smplx table, support_data/conf/moshpp_conf.yaml:118-125
    "data": 400.0, "velo": 2.5, "dmpl": 1.0, "expr": 1.0,
    "poseB": 1.6, "poseH": 1.0, "poseF": 1.0, "annealing": 2.5,
}


@dataclasses.dataclass(frozen=True)
class StageIIOptions:
    optimize_fingers: bool = False
    optimize_face: bool = False
    optimize_toes: bool = False
    optimize_dynamics: bool = False
    num_betas: int = 16
    num_dmpls: int = 8
    num_expressions: int = 10
    expr_start: int = 300        # betas_expr_start_id for smplx
    maxiter: int = 100
    smoothing_sweeps: int = 2
    e_3_polish: float = 1e-4   # final tight full-pose solve; the reference's
                               # loose per-step e_3=.01 relies on sequential
                               # warm starts the batched schedule doesn't have
    linear_solver: str = "cholesky"  # 'newton_schulz' trades exactness for MXU
    ns_steps: int = 4
    jac_precision: str = "high"  # 3-pass f32 Jacobians for the bulk phases;
                                 # the polish phase always runs 'highest'
    anchor_stride: int = 8       # hierarchical pass A: full first-frame
                                 # schedule on every S-th frame, interpolated
                                 # warm starts in between (1 = every frame)
    # straggler compaction: run each full-frame phase for a short iteration
    # budget, then gather the (few) unconverged frames into a small batch and
    # finish them at full maxiter — the batched while_loop otherwise makes
    # every frame pay for the slowest one
    compaction_iters: int = 12
    compaction_bucket: int = 256
    weights: Optional[Dict[str, float]] = None
    knn_k: int = 8

    def wt(self, key: str) -> float:
        return (self.weights or DEFAULT_STAGEII_WEIGHTS).get(
            key, DEFAULT_STAGEII_WEIGHTS[key])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StageIIProblem:
    """Frozen per-subject context: vertex-subsetted model + marker transport."""
    sub_model: SurfaceModel
    frame_c0: jnp.ndarray     # (M,) local (subsetted) vertex indices
    frame_c1: jnp.ndarray
    frame_c2: jnp.ndarray
    coeffs: jnp.ndarray       # (M, 3) frozen latent-marker coefficients
    betas: jnp.ndarray        # (B,) frozen subject shape

    @property
    def indices(self) -> MarkerFrameIndices:
        return MarkerFrameIndices(self.frame_c0, self.frame_c1, self.frame_c2)

    @property
    def num_markers(self) -> int:
        return self.coeffs.shape[0]


class StageIIResult(NamedTuple):
    trans: jnp.ndarray         # (F, 3)
    pose: jnp.ndarray          # (F, P) optimization pose vector
    fullpose: jnp.ndarray      # (F, 3*J) expanded axis-angles
    extra: jnp.ndarray         # (F, E) dmpls or expressions (E may be 0)
    markers_sim: jnp.ndarray   # (F, M, 3)
    data_err: jnp.ndarray      # (F,) mean distance over observed markers (m)
    iterations: jnp.ndarray    # (F,) iterations of the final solve


def _canonical_verts(model: SurfaceModel, betas: jnp.ndarray) -> jnp.ndarray:
    """Canonical (zero-pose) body: v_template + shapedirs . betas."""
    nb = betas.shape[-1]
    with jax.default_matmul_precision("highest"):
        return model.v_template + jnp.einsum(
            "vcb,b->vc", model.shapedirs[..., :nb], betas)


def prepare_stageii_problem(model: SurfaceModel,
                            betas: np.ndarray,
                            markers_latent: np.ndarray,
                            opts: StageIIOptions = StageIIOptions(),
                            exclude_vertex_mask: Optional[np.ndarray] = None) -> StageIIProblem:
    """Freeze the stage-i outputs into a solver context.

    Computes the latent markers' local frames on the canonical shaped body
    (TransformedCoeffs with constant inputs, chmosh.py:502-503), then gathers
    the model to the union of frame vertices so every solver iteration only
    skins O(markers) vertices.
    """
    betas = jnp.asarray(betas, jnp.float32)
    markers_latent = jnp.asarray(markers_latent, jnp.float32)
    can_verts = _canonical_verts(model, betas)

    if exclude_vertex_mask is None:
        from moshpp_tpu.markers.vids import smplx_eyeball_mask
        exclude_vertex_mask = smplx_eyeball_mask(can_verts.shape[0])
    idx = select_frame_indices(can_verts, markers_latent, k=opts.knn_k,
                               exclude_mask=jnp.asarray(exclude_vertex_mask))
    coeffs = marker_coeffs(can_verts, markers_latent, idx)

    stacked = np.asarray(idx.stacked)                  # (M, 3) global vids
    union, local = np.unique(stacked, return_inverse=True)
    local = local.reshape(stacked.shape).astype(np.int32)
    sub_model = model.subset(union)

    return StageIIProblem(
        sub_model=sub_model,
        frame_c0=jnp.asarray(local[:, 0]),
        frame_c1=jnp.asarray(local[:, 1]),
        frame_c2=jnp.asarray(local[:, 2]),
        coeffs=coeffs,
        betas=betas,
    )


# ---------------------------------------------------------------------------
# residual assembly
# ---------------------------------------------------------------------------

def _num_extra(model: SurfaceModel, opts: StageIIOptions) -> int:
    if opts.optimize_dynamics:
        return opts.num_dmpls
    if opts.optimize_face:
        return opts.num_expressions
    return 0


def _betas_for_lbs(prob: StageIIProblem, model: SurfaceModel,
                   opts: StageIIOptions, extra: jnp.ndarray) -> jnp.ndarray:
    """Assemble the shape-coefficient vector seen by LBS for one frame."""
    nb = opts.num_betas
    base = prob.betas[:nb]
    if opts.optimize_dynamics:
        # DMPL components occupy shapedirs columns [nb, nb+num_dmpls)
        # (the reference splices dmpl eigvecs there, chmosh.py:507-514)
        return jnp.concatenate([base, extra])
    if opts.optimize_face:
        es = min(opts.expr_start, model.num_shape_dirs - opts.num_expressions)
        width = es + opts.num_expressions
        out = jnp.zeros(width, base.dtype).at[:nb].set(base)
        return out.at[es:es + opts.num_expressions].set(extra)
    return base


def _split_x(x: jnp.ndarray, pose_dof: int):
    trans = x[:3]
    pose = x[3:3 + pose_dof]
    extra = x[3 + pose_dof:]
    return trans, pose, extra


def simulate_markers(prob: StageIIProblem, opts: StageIIOptions,
                     x: jnp.ndarray) -> jnp.ndarray:
    """Markers (M, 3) simulated from one packed parameter vector."""
    model = prob.sub_model
    trans, pose, extra = _split_x(x, model.pose_dof)
    betas = _betas_for_lbs(prob, model, opts, extra)
    verts = lbs_forward(model, pose, betas, trans)
    return reconstruct_markers(verts, prob.indices, prob.coeffs)


def _as_prior_fn(prior, model_type: str):
    """Normalize a prior spec into pose_body -> residual rows.

    Accepts a MaxMixturePrior (SMPL families / dog GMM), a callable (e.g. the
    horse Mahalanobis), or None. The horse's extra joint-angle penalty
    (chmosh.py:356-358, x2 weight) is appended for animal_horse callables
    built by `pipeline.head`.
    """
    if prior is None:
        return None
    if isinstance(prior, MaxMixturePrior):
        return lambda pose_body: gmm_prior_residual(prior, pose_body)
    return prior


def make_stageii_residual(prob: StageIIProblem,
                          opts: StageIIOptions,
                          prior,
                          model_type: str):
    """Build the per-frame residual fn r(x, aux) -> (R,).

    `prior` is a MaxMixturePrior, a callable pose_body -> residual rows, or
    None.

    aux leaves (per frame):
      markers (M, 3), mask (M,), wt_data (), anneal (),
      velo_anchor (D,), velo_on (), extra_anchor (E,), extra_on ()
    """
    prior_fn = _as_prior_fn(prior, model_type)
    info = MODEL_TYPE_INFO[model_type]
    parts = pose_part_ids(model_type, optimize_toes=opts.optimize_toes)
    body_ids = jnp.asarray(
        [i for i in pose_part_ids(model_type, optimize_toes=True)["body"] if i >= 3],
        jnp.int32) if parts["body"] else None
    # prior acts on the full (toes included) body slice, chmosh.py:614
    face_ids = jnp.asarray(parts["face"], jnp.int32) if parts["face"] else None
    pose_dof = None  # resolved at call time from prob

    wt = opts.wt
    M = prob.num_markers

    def residual(x: jnp.ndarray, aux) -> jnp.ndarray:
        model = prob.sub_model
        trans, pose, extra = _split_x(x, model.pose_dof)
        sim = simulate_markers(prob, opts, x)
        terms = []

        rdata = (sim - aux["markers"]) * aux["mask"][:, None]
        terms.append(rdata.reshape(-1) * aux["wt_data"])

        if prior_fn is not None and body_ids is not None:
            rp = prior_fn(pose[body_ids])
            terms.append(rp * (wt("poseB") * aux["anneal"] * aux["wt_pose_scale"]))

        if opts.optimize_fingers and info.has_hands:
            fingers = pose[info.body_pose_dof:]
            terms.append(fingers * (wt("poseH") * aux["anneal"]))

        if opts.optimize_face and face_ids is not None:
            terms.append(pose[face_ids] * (wt("poseF") * aux["anneal"]))
            terms.append(extra * wt("expr"))

        if opts.optimize_dynamics:
            terms.append(extra * wt("dmpl"))
            terms.append((extra - aux["extra_anchor"]) * (6.0 * aux["extra_on"]))

        # velocity extrapolation anchor over the full pose vector
        terms.append((pose - aux["velo_anchor"]) * (wt("velo") * aux["velo_on"]))

        return jnp.concatenate(terms)

    return residual


def _param_masks(model: SurfaceModel, opts: StageIIOptions, model_type: str):
    """(step1, step2) binary masks over the packed x vector."""
    info = MODEL_TYPE_INFO[model_type]
    parts = pose_part_ids(model_type, optimize_toes=opts.optimize_toes)
    P = model.pose_dof
    E = _num_extra(model, opts)
    D = 3 + P + E

    step1 = np.zeros(D, np.float32)
    step1[:3] = 1.0
    for i in parts["root"] + parts["body"]:
        step1[3 + i] = 1.0
    if model_type == "mano":
        # MANO has no body: fingers are the primary dof in both steps
        step1[3 + info.body_pose_dof: 3 + P] = 1.0

    step2 = step1.copy()
    if opts.optimize_fingers and info.has_hands:
        step2[3 + info.body_pose_dof: 3 + P] = 1.0
    if opts.optimize_face:
        for i in parts["face"]:
            step2[3 + i] = 1.0
        step2[3 + P:] = 1.0
    if opts.optimize_dynamics:
        step2[3 + P:] = 1.0
    return jnp.asarray(step1), jnp.asarray(step2)


def rigid_init(prob: StageIIProblem, opts: StageIIOptions,
               markers_obs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-frame rigid initialization (perform_rigid_adjustment,
    rigid_transformations.py:72-83), corrected for rotation about the root
    joint rather than the origin. Returns packed x0 (F, D)."""
    model = prob.sub_model
    F = markers_obs.shape[0]
    P = model.pose_dof
    E = _num_extra(model, opts)

    x_rest = jnp.zeros(3 + P + E, jnp.float32)
    sim_rest = simulate_markers(prob, opts, x_rest)          # (M, 3)
    nb = opts.num_betas
    j0 = prob.sub_model.joint_template[0] + jnp.einsum(
        "cb,b->c", prob.sub_model.joint_shapedirs[0, :, :nb], prob.betas[:nb])

    def one(obs, m):
        rot, t = kabsch(sim_rest, obs, m)
        rv = rodrigues_inverse(rot)
        # model applies root rotation about joint0: R(v - j0) + j0 + trans
        trans = t + rot @ j0 - j0
        x = jnp.zeros(3 + P + E, jnp.float32)
        return x.at[:3].set(trans).at[3:6].set(rv)

    return jax.vmap(one)(markers_obs, mask)


def mosh_stageii_solve(prob: StageIIProblem,
                       opts: StageIIOptions,
                       markers_obs: np.ndarray,
                       mask: np.ndarray,
                       prior: Optional[MaxMixturePrior] = None,
                       model_type: Optional[str] = None,
                       jit_step: bool = True) -> StageIIResult:
    """Solve all frames. markers_obs (F, M, 3) in meters, mask (F, M) bool.

    All seven solve phases (3 annealed + step-1 + step-2 + smoothing sweeps)
    share ONE compiled batched-dogleg step — phase differences (prior scale,
    velocity anchors, parameter mask, stopping tolerance) are traced
    arguments, so the solver compiles once regardless of schedule length.
    Set `jit_step=False` when tracing this whole function inside an outer
    jit/pjit (the step is then inlined by the outer trace).
    """
    model = prob.sub_model
    model_type = model_type or model.model_type
    markers_obs = jnp.asarray(markers_obs, jnp.float32)
    maskf = jnp.asarray(mask, jnp.float32)
    F, M = maskf.shape
    P = model.pose_dof
    E = _num_extra(model, opts)
    D = 3 + P + E

    residual = make_stageii_residual(prob, opts, prior, model_type)
    step1_mask, step2_mask = _param_masks(model, opts, model_type)
    wt = opts.wt

    n_obs = jnp.sum(maskf, axis=1)                            # (F,)
    wt_data = wt("data") * NUM_TRAIN_MARKERS / jnp.maximum(n_obs, 1.0)
    missing_frac = (M - n_obs) / M
    anneal = 1.0 + missing_frac * wt("annealing")             # chmosh.py:596-609

    def aux_for(wt_pose_scale, obs=markers_obs, msk=None, wdata=None,
                ann=None, velo_anchor=None, velo_on=None,
                extra_anchor=None, extra_on=None):
        msk = maskf if msk is None else msk
        wdata = wt_data if wdata is None else wdata
        ann = anneal if ann is None else ann
        n = obs.shape[0]
        z = jnp.zeros((n,), jnp.float32)
        return {
            "markers": obs,
            "mask": msk,
            "wt_data": wdata,
            "anneal": ann,
            "wt_pose_scale": jnp.full((n,), wt_pose_scale, jnp.float32),
            "velo_anchor": jnp.zeros((n, P), jnp.float32) if velo_anchor is None else velo_anchor,
            "velo_on": z if velo_on is None else velo_on,
            "extra_anchor": jnp.zeros((n, E), jnp.float32) if extra_anchor is None else extra_anchor,
            "extra_on": z if extra_on is None else extra_on,
        }

    # one compiled solver step reused by every phase: x, aux, mask, e_3 are
    # all traced arguments
    dl_opts = DoglegOptions(maxiter=opts.maxiter, delta_0=0.5,
                            linear_solver=opts.linear_solver,
                            ns_steps=opts.ns_steps,
                            jac_precision=opts.jac_precision)
    dl_short = dataclasses.replace(
        dl_opts, maxiter=min(opts.compaction_iters, opts.maxiter))

    def _mkstep(d):
        def step(x, aux, pmask, e3):
            r = batched_dogleg_solve(residual, x, aux, d,
                                     param_mask=pmask, e_3=e3)
            return r.x, r.converged
        return jax.jit(step) if jit_step else step

    step_full = _mkstep(dl_opts)
    step_short = _mkstep(dl_short)

    compaction = (jit_step and opts.compaction_iters > 0
                  and opts.compaction_iters < opts.maxiter and F > 64)

    def step(x, aux, pmask, e3):
        """One phase: short budget for everyone, full budget for stragglers
        gathered into padded buckets (host-side gather; shapes bucketized so
        at most a couple of extra compilations exist)."""
        if not compaction:
            return step_full(x, aux, pmask, e3)[0]
        x, conv = step_short(x, aux, pmask, e3)
        bad = np.where(~np.asarray(conv))[0]
        if bad.size == 0:
            return x
        bucket = min(F, opts.compaction_bucket *
                     max(1, int(np.ceil(bad.size / opts.compaction_bucket))))
        ids = np.zeros(bucket, np.int64)
        ids[: bad.size] = bad                     # pad with frame 0 (redundant
        idx = jnp.asarray(ids)                    # work, discarded on scatter)
        aux_sub = jax.tree.map(lambda a: a[idx], aux)
        x_sub, _ = step_full(x[idx], aux_sub, pmask, e3)
        return x.at[idx[: bad.size]].set(x_sub[: bad.size])

    def step_polish(x, aux, pmask, e3):
        return step(x, aux, pmask, e3)

    # ---- pass A: hierarchical anchor solve + interpolated warm starts ------
    # The reference warm-starts each frame from its predecessor; the batched
    # equivalent: run the expensive first-frame schedule only on every S-th
    # frame, initialize the rest by interpolation between anchors, then give
    # all frames the (now cheap, warm) step-1/step-2 solves.
    S = max(int(opts.anchor_stride), 1)
    if S > 1 and F > S:
        anchor_ids = np.arange(0, F, S)
        if anchor_ids[-1] != F - 1:
            anchor_ids = np.append(anchor_ids, F - 1)
        a = jnp.asarray(anchor_ids)
        obs_a, msk_a = markers_obs[a], maskf[a]
        aux_anchor = dict(obs=obs_a, msk=msk_a, wdata=wt_data[a], ann=anneal[a])

        xa = rigid_init(prob, opts, obs_a, msk_a)
        for scale in (10.0, 5.0, 1.0):  # first-frame schedule, chmosh.py:637
            xa = step(xa, aux_for(scale, **aux_anchor), step1_mask,
                      jnp.float32(1e-3))
        xa = step(xa, aux_for(1.0, **aux_anchor), step2_mask, jnp.float32(1e-2))

        # piecewise-linear interpolation between consecutive anchors
        seg = np.minimum(np.searchsorted(anchor_ids, np.arange(F), "right") - 1,
                         len(anchor_ids) - 2)
        lo = anchor_ids[seg]
        hi = anchor_ids[seg + 1]
        alpha = jnp.asarray(((np.arange(F) - lo) / np.maximum(hi - lo, 1))
                            .astype(np.float32))[:, None]
        x = (1.0 - alpha) * xa[jnp.asarray(seg)] + alpha * xa[jnp.asarray(seg + 1)]
    else:
        x = rigid_init(prob, opts, markers_obs, maskf)
        for scale in (10.0, 5.0, 1.0):
            x = step(x, aux_for(scale), step1_mask, jnp.float32(1e-3))

    # step 1: trans + body at e_3 = .01 (chmosh.py:669-671)
    x = step(x, aux_for(1.0), step1_mask, jnp.float32(1e-2))
    # step 2: full pose (chmosh.py:703-705)
    x = step(x, aux_for(1.0), step2_mask, jnp.float32(1e-2))

    # ---- pass B: Jacobi smoothing sweeps (velocity + dmpl extrapolation) ---
    for _ in range(opts.smoothing_sweeps):
        pose = x[:, 3:3 + P]
        extra = x[:, 3 + P:]
        velo_anchor = jnp.zeros_like(pose).at[2:].set(2.0 * pose[1:-1] - pose[:-2])
        velo_on = jnp.zeros((F,), jnp.float32).at[2:].set(1.0)
        extra_anchor = jnp.zeros_like(extra)
        extra_on = jnp.zeros((F,), jnp.float32)
        if E and opts.optimize_dynamics:
            extra_anchor = extra_anchor.at[2:].set(2.0 * extra[1:-1] - extra[:-2])
            extra_on = extra_on.at[2:].set(1.0)
        x = step(x, aux_for(1.0, velo_anchor=velo_anchor, velo_on=velo_on,
                            extra_anchor=extra_anchor, extra_on=extra_on),
                 step2_mask, jnp.float32(1e-2))

    # polish: one tight full-pose solve from the warm state, keeping the
    # velocity anchors so the smoothness coupling survives the final solve
    if opts.e_3_polish is not None:
        pose = x[:, 3:3 + P]
        velo_anchor = jnp.zeros_like(pose)
        velo_on = jnp.zeros((F,), jnp.float32)
        if opts.smoothing_sweeps > 0 and F > 2:
            velo_anchor = velo_anchor.at[2:].set(2.0 * pose[1:-1] - pose[:-2])
            velo_on = velo_on.at[2:].set(1.0)
        x = step_polish(x, aux_for(1.0, velo_anchor=velo_anchor, velo_on=velo_on),
                        step2_mask, jnp.float32(opts.e_3_polish))

    # ---- outputs ------------------------------------------------------------
    trans = x[:, :3]
    pose = x[:, 3:3 + P]
    extra = x[:, 3 + P:]
    sim = jax.vmap(lambda xi: simulate_markers(prob, opts, xi))(x)
    fullpose = jax.vmap(lambda p: fullpose_from_pose(model, p))(pose)
    err = jnp.sqrt(jnp.sum((sim - markers_obs) ** 2, -1)) * maskf
    data_err = jnp.sum(err, -1) / jnp.maximum(n_obs, 1.0)
    return StageIIResult(trans=trans, pose=pose, fullpose=fullpose, extra=extra,
                         markers_sim=sim, data_err=data_err,
                         iterations=jnp.zeros((F,), jnp.int32))
