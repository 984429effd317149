"""Stage II — per-frame pose (+trans, +DMPL, +expression) estimation.

The reference solves mocap frames *sequentially*, warm-starting each frame
from the previous one (`chmosh.py:458-741`: rigid init + 3-stage annealed
prior schedule on the first frame :629-655, then per frame a trans+body solve
:665-671 and a full-pose solve :676-705, with a velocity-extrapolation
anchor from the two previous frames :624-626).

The TPU formulation makes the frame axis data-parallel:

  pass A (independent): every S-th frame (anchor) gets the reference's
    *first-frame* treatment — per-frame Kabsch rigid init, then batched
    dogleg solves with the annealed pose-prior schedule [10w, 5w, w] and a
    full-pose anchor solve; the frames in between are initialized by
    rotation-aware interpolation (per-joint quaternion slerp) between
    anchors, then all frames get the step-1 (trans+body, e_3=.01) and
    step-2 (full pose) solves.
  pass B (smoothing sweeps): the sequential velocity term
    pose_t ~ 2 pose_{t-1} - pose_{t-2} is re-created by Jacobi sweeps:
    anchors computed from the previous sweep's solutions, then one batched
    step-2 re-solve. Two sweeps reproduce the warm-start smoothness
    semantics without any sequential dependency.

Weight semantics match the reference exactly: wt_data scales by
46/num_observed (chmosh.py:603), prior weights scale by the missing-marker
anneal factor 1 + missing_frac * stageii_wt_annealing (:596-609).

Performance architecture (v5e, tunneled dispatch ~27 ms/call):

  * The WHOLE schedule — rigid init, anchor pass, interpolation, all solve
    phases, smoothing sweeps, polish, outputs — is ONE jitted function; the
    phase sequence is two `lax.scan`s over stacked per-phase parameters
    (param mask, stopping tolerance, prior scale, velocity gate), so the
    dogleg loop body is traced twice, not once per phase.
  * The Gauss-Newton system (cost, gradient, JᵀJ) is assembled directly
    (`make_stageii_system`): marker Jacobians come from the closed-form LBS
    chain (ops/lbs_jacobian.py — the reference's C++ `lbs_derivatives`
    equivalent), priors/regularizers contribute analytic blocks; no autodiff
    tangent batch, no residual-row stacking.
  * Straggler compaction is in-graph (solver-level argsort-gather, see
    `batched_system_solve`), so it survives jit fusion AND works per-shard
    under `shard_map` on a device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import os
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.models.body_model import (MODEL_TYPE_INFO, SurfaceModel,
                                          fullpose_from_pose, lbs_forward,
                                          pose_part_ids)
from moshpp_tpu.ops.lbs_jacobian import (lbs_verts_and_jacobian,
                                         markers_and_jacobian)
from moshpp_tpu.ops.pallas_marker_jac import (INLINE_MAX_EXTRAS,
                                              MarkerJacTables, marker_sim,
                                              marker_resid_and_wjac,
                                              marker_sim_and_jacobian,
                                              prepare_marker_jac_tables)
from moshpp_tpu.ops.marker_transform import (MarkerFrameIndices, marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.rigid_align import kabsch
from moshpp_tpu.ops.rodrigues import rodrigues_inverse, slerp_axis_angle
from moshpp_tpu.priors.gmm import MaxMixturePrior, gmm_prior_residual
from moshpp_tpu.solver.gauss_newton import (DoglegOptions, GNSystem,
                                            batched_system_solve)

NUM_TRAIN_MARKERS = 46.0  # weight-normalization constant (chmosh.py:460)

# Widest extras (dmpl/expression) block the marker kernels unroll INLINE;
# wider configs (the production smplx num_expressions=80) stream the extras
# tangent + Jacobian columns in chunks via the kernels' tiled path — see
# ops/pallas_marker_jac.INLINE_MAX_EXTRAS / EXTRA_CHUNK. Kept as an alias so
# callers can reason about which kernel variant a config compiles to.
MAX_KERNEL_EXTRAS = INLINE_MAX_EXTRAS

DEFAULT_STAGEII_WEIGHTS = {
    # smplh/smplx table, support_data/conf/moshpp_conf.yaml:118-125
    "data": 400.0, "velo": 2.5, "dmpl": 1.0, "expr": 1.0,
    "poseB": 1.6, "poseH": 1.0, "poseF": 1.0, "annealing": 2.5,
    # extra multiplier on the velocity (temporal smoothness) weight for the
    # hand-PCA dofs only. Markers sit on the body, so hand dofs are
    # observable only through the prior — the reference's sequential warm
    # starts act as an implicit temporal regularizer there
    # (chmosh.py:624-626); this lever reproduces it explicitly in the
    # batched smoothing sweeps (see the hands-v2v experiment, STATUS r5).
    "velo_hands": 1.0,
}

STAGEII_PHASE_NAMES = ("anneal10", "anneal5", "anneal1", "anchor_step2",
                      "step1", "step2", "sweeps", "polish")


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
    e_3_anneal: float = 3e-3   # stopping tolerance of the anchor-pass
                               # annealed prior solves (warm-start quality
                               # only — later phases refine)
    linear_solver: str = "pcg"   # 'pcg' (matmul-only GN direction) or
                                 # 'cholesky' (exact; slower batched on TPU)
    cg_iters: int = 24
    # polish direction: 'auto' = deep PCG (cg_iters_polish) via the Pallas
    # PCG kernel on TPU — near-exact at a fraction of the batched-Cholesky
    # cost — else Cholesky; 'cholesky' | 'pcg' force.
    polish_solver: str = "auto"
    cg_iters_polish: int = 128
    jac_precision: str = "high"  # 3-pass f32 Jacobians (generic path only)
    anchor_stride: int = 8       # hierarchical pass A: full first-frame
                                 # schedule on every S-th frame, slerped
                                 # warm starts in between (1 = every frame)
    # in-graph straggler compaction: run the full batch while > F/b frames
    # are active, then argsort-gather stragglers into an F/b bucket (per b);
    # the early F/2 stage catches the fast half of the batch (+14% measured)
    compact_buckets: Tuple[int, ...] = (2, 8, 32)
    # GN data-block backend: 'auto' = fused Pallas kernels on TPU, XLA
    # einsum chain elsewhere; 'pallas' forces the kernel (interpret mode off
    # TPU — slow, test-only); 'xla' forces the einsum chain. The multi-chip
    # path runs phases under `shard_map` (parallel/sharding.py), where the
    # frame-local kernels run unchanged on each shard's local batch.
    jac_backend: str = "auto"
    # fold the per-frame data weights + residual into the marker kernel
    # (skips the (F, M, 3, D) weighting pass over the Jacobian)
    fold_weights: bool = False
    # long sequences solve in overlapping chunks of this many frames (0 =
    # one batched solve regardless of length). Keeps HBM bounded (~200 KB of
    # J/B/compaction buffers per frame) and keeps ONE compiled shape: every
    # chunk is edge-padded to chunk_frames + 2*chunk_halo. The halo gives
    # seam frames full velocity-sweep context on both sides.
    chunk_frames: int = 16384
    chunk_halo: int = 32
    # crash recovery for long chunked runs: each solved chunk's kept interior
    # is written here (atomic npz, fingerprinted by inputs+options); a re-run
    # after a crash skips completed chunks instead of restarting from frame 0
    # (the reference has stage-granularity caching only — a killed stage-ii
    # restarts the whole sequential loop, mosh_head.py:272).
    checkpoint_dir: Optional[str] = None
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
    # fused-kernel tables (ops/pallas_marker_jac); None disables the kernel
    pallas_tables: Optional[MarkerJacTables] = None

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
    iterations: jnp.ndarray    # (F,) iterations of the final (polish) solve


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

    indices = MarkerFrameIndices(jnp.asarray(local[:, 0]),
                                 jnp.asarray(local[:, 1]),
                                 jnp.asarray(local[:, 2]))
    tables = None
    if opts.jac_backend != "xla":
        # extra (dmpl/expression) dims ride shapedirs columns; bake their
        # direction tables so the kernels emit the E extra Jacobian columns
        # (chmosh.py:507-514 dmpl splice, 694-699 expressions)
        extra_cols = None
        if opts.optimize_dynamics:
            nb = opts.num_betas
            extra_cols = list(range(nb, nb + opts.num_dmpls))
        elif opts.optimize_face:
            es = min(opts.expr_start,
                     sub_model.num_shape_dirs - opts.num_expressions)
            extra_cols = list(range(es, es + opts.num_expressions))
        # any width rides the kernels: E <= INLINE_MAX_EXTRAS unrolls inline,
        # wider (production smplx num_expressions=80) streams through the
        # tiled chunk kernels (ops/pallas_marker_jac._sim_and_jac_tiled)
        tables = prepare_marker_jac_tables(
            sub_model, indices, coeffs, betas[:opts.num_betas],
            extra_cols=extra_cols)

    return StageIIProblem(
        sub_model=sub_model,
        frame_c0=indices.c0,
        frame_c1=indices.c1,
        frame_c2=indices.c2,
        coeffs=coeffs,
        betas=betas,
        pallas_tables=tables,
    )


# ---------------------------------------------------------------------------
# residual / system assembly
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


class _TermSpec(NamedTuple):
    """Static index/weight tables shared by residual, cost and system."""
    body_ids: Optional[np.ndarray]     # x-indices of the prior's pose slice
    finger_ids: Optional[np.ndarray]   # x-indices of the hand-PCA tail
    face_ids: Optional[np.ndarray]     # x-indices of the jaw slice
    pose_sl: slice                     # x-slice of the full pose vector
    extra_sl: slice                    # x-slice of the extra (dmpl/expr) tail


def _term_spec(prob: StageIIProblem, opts: StageIIOptions,
               model_type: str) -> _TermSpec:
    model = prob.sub_model
    info = MODEL_TYPE_INFO[model_type]
    parts = pose_part_ids(model_type, optimize_toes=opts.optimize_toes)
    P = model.pose_dof
    # prior acts on the full (toes included) body slice, chmosh.py:614
    prior_pose = [i for i in pose_part_ids(model_type, optimize_toes=True)["body"]
                  if i >= 3]
    body_ids = np.asarray([3 + i for i in prior_pose], np.int64) if prior_pose else None
    finger_ids = (np.arange(3 + info.body_pose_dof, 3 + P)
                  if (opts.optimize_fingers and info.has_hands) else None)
    face_ids = (np.asarray([3 + i for i in parts["face"]], np.int64)
                if (opts.optimize_face and parts["face"]) else None)
    return _TermSpec(body_ids=body_ids, finger_ids=finger_ids,
                     face_ids=face_ids, pose_sl=slice(3, 3 + P),
                     extra_sl=slice(3 + P, None))


def _velo_weight_vec(prob, opts, spec) -> jnp.ndarray:
    """Per-dof velocity (temporal smoothness) weights over the pose vector.

    Base `wt("velo")` everywhere; hand-PCA dofs additionally scaled by
    `wt("velo_hands")`. Markers sit on the body, so hand dofs are observable
    only through the prior — the reference's sequential warm starts act as an
    implicit temporal regularizer exactly there (chmosh.py:624-626); this is
    that regularizer made explicit for the batched smoothing sweeps."""
    P = prob.sub_model.pose_dof
    w = np.full(P, float(opts.wt("velo")), np.float32)
    vh = float(opts.wt("velo_hands"))
    if vh != 1.0 and spec.finger_ids is not None:
        w[np.asarray(spec.finger_ids) - 3] *= vh
    return jnp.asarray(w)


def make_stageii_residual(prob: StageIIProblem,
                          opts: StageIIOptions,
                          prior,
                          model_type: str):
    """Build the per-frame residual fn r(x, aux) -> (R,).

    The least-squares rows whose sum-of-squares equals the system cost — kept
    for the generic-solver path, cross-validation tests and profiling.

    aux leaves (per frame):
      markers (M, 3), mask (M,), wt_data (), anneal (), wt_pose_scale (),
      velo_anchor (P,), velo_on (), extra_anchor (E,), extra_on ()
    """
    prior_n = prior
    spec = _term_spec(prob, opts, model_type)
    wt = opts.wt
    velo_w = _velo_weight_vec(prob, opts, spec)

    def residual(x: jnp.ndarray, aux) -> jnp.ndarray:
        model = prob.sub_model
        trans, pose, extra = _split_x(x, model.pose_dof)
        sim = simulate_markers(prob, opts, x)
        terms = []

        rdata = (sim - aux["markers"]) * aux["mask"][:, None]
        terms.append(rdata.reshape(-1) * aux["wt_data"])

        if prior_n is not None and spec.body_ids is not None:
            w = wt("poseB") * aux["anneal"] * aux["wt_pose_scale"]
            xb = x[jnp.asarray(spec.body_ids)]
            if isinstance(prior_n, MaxMixturePrior):
                terms.append(gmm_prior_residual(prior_n, xb) * w)
            else:
                terms.append(prior_n(xb) * w)

        if spec.finger_ids is not None:
            terms.append(x[jnp.asarray(spec.finger_ids)]
                         * (wt("poseH") * aux["anneal"]))

        if spec.face_ids is not None:
            terms.append(x[jnp.asarray(spec.face_ids)]
                         * (wt("poseF") * aux["anneal"]))
            terms.append(extra * wt("expr"))

        if opts.optimize_dynamics:
            terms.append(extra * wt("dmpl"))
            terms.append((extra - aux["extra_anchor"]) * (6.0 * aux["extra_on"]))

        # velocity extrapolation anchor over the full pose vector
        terms.append((pose - aux["velo_anchor"]) * (velo_w * aux["velo_on"]))

        return jnp.concatenate(terms)

    return residual


def make_stageii_system(prob: StageIIProblem,
                        opts: StageIIOptions,
                        prior,
                        model_type: str) -> GNSystem:
    """Direct Gauss-Newton system assembly: (x, aux) -> (f, g, B).

    Produces exactly the cost/gradient/Hessian of `make_stageii_residual`'s
    rows (validated in tests/test_stageii_system.py) without autodiff or row
    stacking:

      * marker data rows: closed-form LBS Jacobian (ops/lbs_jacobian.py);
      * GMM max-mixture prior: the selected component's quadratic form
        0.5 L_k L_kᵀ added to B/g analytically (gmm_prior_ch.py:69-72
        expressed as its normal-equations contribution);
      * callable priors (horse): forward-mode J of a pose-only function;
      * fingers/face/expr/dmpl/velocity regularizers: diagonal updates.

    The extra (dmpl/expression) columns of the data block go through a
    forward-mode pass over the E extra dims only (E <= 10).
    """
    prior_n = prior
    spec = _term_spec(prob, opts, model_type)
    model = prob.sub_model
    P = model.pose_dof
    E = _num_extra(model, opts)
    D = 3 + P + E
    wt = opts.wt

    is_gmm = isinstance(prior_n, MaxMixturePrior)
    if is_gmm:
        # per-component precision quadratic 0.5 L Lᵀ (the Jᵀ J of the
        # whitened rows) — constant, computed once at build time
        PP = 0.5 * jnp.einsum("kde,kfe->kdf", prior_n.chols, prior_n.chols)
    prior_jac = None
    if prior_n is not None and not is_gmm:
        prior_jac = jax.jacfwd(prior_n)

    # TPU scatters serialize — all index updates below must be static basic
    # slices (lowered to dynamic-update-slice) or dense matmuls. Detect at
    # build time whether the prior's pose slice is contiguous (it is for all
    # SMPL families and the horse; the dog's 31-joint subset is not).
    def _contig(ids):
        if ids is None or len(ids) == 0:
            return None
        ids = np.asarray(ids)
        return (int(ids[0]), int(ids[-1]) + 1) if (
            np.all(np.diff(ids) == 1)) else None

    body_rng = _contig(spec.body_ids)
    if spec.body_ids is not None and body_rng is None:
        # dense 0/1 selection matrix: xb = Msel @ x, block-add via matmuls
        Msel = np.zeros((len(spec.body_ids), D), np.float32)
        Msel[np.arange(len(spec.body_ids)), spec.body_ids] = 1.0
        Msel = jnp.asarray(Msel)
    fing_rng = _contig(spec.finger_ids)
    face_rng = _contig(spec.face_ids)
    velo_w = _velo_weight_vec(prob, opts, spec)

    def _data_jac(x):
        trans, pose, extra = _split_x(x, P)
        betas = _betas_for_lbs(prob, model, opts, extra)
        verts, Jv = lbs_verts_and_jacobian(model, pose, betas, trans)
        sim, Jm = markers_and_jacobian(verts, Jv, prob.indices, prob.coeffs)
        if E:
            def sim_extra(e):
                return simulate_markers(
                    prob, opts, jnp.concatenate([trans, pose, e]))
            Je = jax.jacfwd(sim_extra)(extra)          # (M, 3, E)
            Jm = jnp.concatenate([Jm, Je], axis=-1)
        return sim, Jm                                  # (M,3), (M,3,D)

    def _quad_smalls(x, aux, f):
        """Per-frame quad terms WITHOUT touching B.

        Same math as `_quad_terms`, but instead of accumulating into the
        (D, D) normal-equations block it returns the pieces — gradient add,
        diagonal vector, and the (dense, small) body-prior block — so the
        batched path can fold them into B in its frame-minor layout in ONE
        fused output pass (reading the GEMM result twice, writing (D, D, N)
        once) rather than rewriting the full (N, D, D) array per term.
        Only valid when the body-prior slice is contiguous (`body_rng`);
        the non-contiguous (dog) case keeps `_quad_terms`.
        """
        pose = x[spec.pose_sl]
        extra = x[spec.extra_sl]
        dvec = jnp.zeros(D, x.dtype)
        g = jnp.zeros(D, x.dtype)
        bw = body_rng[1] - body_rng[0] if body_rng is not None else 0
        ppw = jnp.zeros((bw, bw), x.dtype)

        if prior_n is not None and spec.body_ids is not None:
            w = wt("poseB") * aux["anneal"] * aux["wt_pose_scale"]
            w2 = w * w
            s, e = body_rng
            xb = x[s:e]
            if is_gmm:
                xs = jax.lax.stop_gradient(xb)
                diff_all = xs[None, :] - prior_n.means
                r_all = jnp.einsum("kd,kde->ke", diff_all, prior_n.chols)
                energies = (0.5 * jnp.sum(r_all * r_all, axis=-1)
                            + prior_n.sqrt_neg_log_w ** 2)
                k = jnp.argmin(energies)
                q = xb - prior_n.means[k]
                PPk = PP[k]
                gq = PPk @ q
                f = f + w2 * (q @ gq + prior_n.sqrt_neg_log_w[k] ** 2)
                g = g.at[s:e].add(w2 * gq)
                ppw = w2 * PPk
            else:
                rp = prior_n(xb) * w
                Jp = prior_jac(xb) * w
                f = f + rp @ rp
                g = g.at[s:e].add(Jp.T @ rp)
                ppw = Jp.T @ Jp

        def diag_rng(f, g, dvec, s, e, vals, w):
            # w may be a scalar or a per-dof (e-s,) vector (velo_hands)
            w2 = w * w
            f = f + jnp.sum(w2 * vals * vals)
            g = g.at[s:e].add(w2 * vals)
            dvec = dvec.at[s:e].add(jnp.broadcast_to(w2, vals.shape))
            return f, g, dvec

        if fing_rng is not None:
            s, e = fing_rng
            f, g, dvec = diag_rng(f, g, dvec, s, e, x[s:e],
                                  wt("poseH") * aux["anneal"])
        if face_rng is not None:
            s, e = face_rng
            f, g, dvec = diag_rng(f, g, dvec, s, e, x[s:e],
                                  wt("poseF") * aux["anneal"])
            f, g, dvec = diag_rng(f, g, dvec, 3 + P, D, extra,
                                  jnp.float32(wt("expr")))
        if opts.optimize_dynamics and E:
            f, g, dvec = diag_rng(f, g, dvec, 3 + P, D, extra,
                                  jnp.float32(wt("dmpl")))
            f, g, dvec = diag_rng(f, g, dvec, 3 + P, D,
                                  extra - aux["extra_anchor"],
                                  6.0 * aux["extra_on"])

        f, g, dvec = diag_rng(f, g, dvec, 3, 3 + P,
                              pose - aux["velo_anchor"],
                              velo_w * aux["velo_on"])
        return f, g, dvec, ppw

    def _quad_terms(x, aux, g, B, f):
        """All non-data terms, accumulated analytically.

        Diagonal contributions collect into one (D,) vector added to B's
        diagonal at the end; gradient updates are static-slice adds; the
        prior block is a static-slice block add (or two small matmuls for
        the dog's non-contiguous joint subset) — no scatter ops anywhere.
        """
        pose = x[spec.pose_sl]
        extra = x[spec.extra_sl]
        dvec = jnp.zeros(D, x.dtype)

        if prior_n is not None and spec.body_ids is not None:
            w = wt("poseB") * aux["anneal"] * aux["wt_pose_scale"]
            w2 = w * w
            xb = (x[body_rng[0]:body_rng[1]] if body_rng is not None
                  else Msel @ x)
            if is_gmm:
                xs = jax.lax.stop_gradient(xb)
                diff_all = xs[None, :] - prior_n.means
                r_all = jnp.einsum("kd,kde->ke", diff_all, prior_n.chols)
                energies = (0.5 * jnp.sum(r_all * r_all, axis=-1)
                            + prior_n.sqrt_neg_log_w ** 2)
                k = jnp.argmin(energies)
                q = xb - prior_n.means[k]
                PPk = PP[k]
                gq = PPk @ q
                f = f + w2 * (q @ gq + prior_n.sqrt_neg_log_w[k] ** 2)
                gb, Bb = w2 * gq, w2 * PPk
            else:
                rp = prior_n(xb) * w
                Jp = prior_jac(xb) * w
                f = f + rp @ rp
                gb, Bb = Jp.T @ rp, Jp.T @ Jp
            if body_rng is not None:
                s, e = body_rng
                g = g.at[s:e].add(gb)
                B = B.at[s:e, s:e].add(Bb)
            else:
                g = g + Msel.T @ gb
                B = B + Msel.T @ (Bb @ Msel)

        def diag_rng(f, g, dvec, s, e, vals, w):
            # w may be a scalar or a per-dof (e-s,) vector (velo_hands)
            w2 = w * w
            f = f + jnp.sum(w2 * vals * vals)
            g = g.at[s:e].add(w2 * vals)
            dvec = dvec.at[s:e].add(jnp.broadcast_to(w2, vals.shape))
            return f, g, dvec

        if fing_rng is not None:
            s, e = fing_rng
            f, g, dvec = diag_rng(f, g, dvec, s, e, x[s:e],
                                  wt("poseH") * aux["anneal"])
        if face_rng is not None:
            s, e = face_rng
            f, g, dvec = diag_rng(f, g, dvec, s, e, x[s:e],
                                  wt("poseF") * aux["anneal"])
            f, g, dvec = diag_rng(f, g, dvec, 3 + P, D, extra,
                                  jnp.float32(wt("expr")))
        if opts.optimize_dynamics and E:
            f, g, dvec = diag_rng(f, g, dvec, 3 + P, D, extra,
                                  jnp.float32(wt("dmpl")))
            f, g, dvec = diag_rng(f, g, dvec, 3 + P, D,
                                  extra - aux["extra_anchor"],
                                  6.0 * aux["extra_on"])

        f, g, dvec = diag_rng(f, g, dvec, 3, 3 + P,
                              pose - aux["velo_anchor"],
                              velo_w * aux["velo_on"])
        B = B + jnp.eye(D, dtype=x.dtype) * dvec
        return f, g, B

    def system_fn(x, aux):
        sim, Jm = _data_jac(x)
        wrow = aux["mask"] * aux["wt_data"]                    # (M,)
        rd = (sim - aux["markers"]) * wrow[:, None]            # (M, 3)
        Jd = Jm * wrow[:, None, None]                          # (M, 3, D)
        with jax.default_matmul_precision("high"):
            f = jnp.sum(rd * rd)
            g = jnp.einsum("mc,mcd->d", rd, Jd)
            B = jnp.einsum("mcd,mce->de", Jd, Jd)
        return _quad_terms(x, aux, g, B, f)

    # Extra (dmpl/expression) dims run in-kernel when the tables carry the
    # matching direction bands (prepare_stageii_problem bakes them from the
    # same opts, so a mismatch only happens with hand-built tables).
    use_pallas = (
        prob.pallas_tables is not None
        and prob.pallas_tables.n_extra == E
        and opts.jac_backend in ("auto", "pallas")
        and (opts.jac_backend == "pallas" or jax.default_backend() == "tpu"))

    # frame-minor B needs the body-prior block contiguous (no Msel); the
    # dog's non-contiguous joint subset keeps the legacy (N, D, D) path
    use_bt = (body_rng is not None
              or prior_n is None or spec.body_ids is None)
    # A/B lever: 'frame_minor' emits B as (D, D, N) (no relayout before the
    # direction kernel); 'batch' emits (N, D, D) with the quads still fused;
    # 'legacy' is the round-4 assembly (3-GEMM einsum + vmapped _quad_terms)
    _BT_LAYOUT = os.environ.get("MOSHPP_BT_LAYOUT", "frame_minor")

    def system_fn_batched(x, aux):
        """Batched assembly with the fused Pallas marker-Jacobian kernels.

        The data block (~65% of the per-iteration cost in the XLA chain) and
        its NE contraction run fused; quadratic prior/regularizer terms are
        vmapped per frame. The kernel is also the *more accurate* path
        (full-f32 VPU vs the XLA chain's bf16x3 matmuls: 2.6e-6 m vs 2.2e-4 m
        against float64 ground truth).

        When `use_bt`, B is returned FRAME-MINOR — (D, D, N), the layout the
        fused direction kernel consumes — assembled as:
          * gradient: exact-f32 multiply+reduce (one pass over Jd, more
            accurate than the previous bf16x3 matvec);
          * data block: TWO bf16 GEMMs on the hi/lo split (P = ½hi·hiᵀ+hi·loᵀ,
            B = P + Pᵀ — same terms as XLA's 'high' bf16x3 but one GEMM
            fewer; the optimization barrier keeps the simplifier from
            refolding hi+lo back into a single bf16 operand);
          * quad terms (diag vector + body-prior block from `_quad_smalls`)
            folded into the SAME fused output pass that symmetrizes and
            transposes P — B is written once, already in (D, D, N), instead
            of GEMM-write → quad rewrite → pad+transpose (3x the HBM
            round-trips at F=4096/D=117).
        """
        interp = jax.default_backend() != "tpu"
        wrow = aux["mask"] * aux["wt_data"][:, None]           # (N, M)
        if opts.fold_weights:
            rd, Jd = marker_resid_and_wjac(model, prob.pallas_tables, x,
                                           aux["markers"], wrow,
                                           interpret=interp)
        else:
            sim, Jm = marker_sim_and_jacobian(model, prob.pallas_tables,
                                              x, interpret=interp)
            rd = (sim - aux["markers"]) * wrow[..., None]
            Jd = Jm * wrow[..., None, None]
        f0 = jnp.sum(rd * rd, axis=(1, 2))   # full f32: e_3 compares f
        if not use_bt or _BT_LAYOUT == "legacy":
            with jax.default_matmul_precision(opts.jac_precision):
                g = jnp.einsum("nmc,nmcd->nd", rd, Jd)
                B = jnp.einsum("nmcd,nmce->nde", Jd, Jd)
            return jax.vmap(_quad_terms)(x, aux, g, B, f0)

        N = x.shape[0]
        g0 = jnp.sum(Jd * rd[..., None], axis=(1, 2))          # (N, D) f32
        J2 = Jd.reshape(N, 3 * Jd.shape[1], D)
        if opts.jac_precision == "default":
            hi = J2.astype(jnp.bfloat16)
            mm = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            P0 = 0.5 * mm(hi, hi)
        else:
            hi = J2.astype(jnp.bfloat16)
            lo = (J2 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            # without the barrier XLA's algebraic simplifier can refold
            # hi@hi + 2*hi@lo into hi@(hi+lo) with the sum taken in bf16,
            # which silently drops the low bits (measured: error reverts to
            # plain-bf16 level)
            hi, lo = jax.lax.optimization_barrier((hi, lo))
            mm = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            P0 = 0.5 * mm(hi, hi) + mm(hi, lo)                 # (N, D, D)
        f, gq, dvec, ppw = jax.vmap(_quad_smalls)(x, aux, f0)
        eye = jnp.eye(D, dtype=x.dtype)
        if _BT_LAYOUT == "frame_minor":
            # one fused output pass producing B in the direction kernel's
            # (D, D, N) layout: P0 read twice (transposed patterns), quads
            # added in place, no separate quad/relayout passes
            Bt = (jnp.transpose(P0, (1, 2, 0)) + jnp.transpose(P0, (2, 1, 0))
                  + eye[:, :, None] * dvec.T[:, None, :])
            if ppw.shape[1]:
                s = body_rng[0]
                pad = ((s, D - body_rng[1]), (s, D - body_rng[1]), (0, 0))
                Bt = Bt + jnp.pad(jnp.transpose(ppw, (1, 2, 0)), pad)
            return f, g0 + gq, Bt
        # batch-major variant: symmetrize + quads in one fused pass (minor
        # dims swap only), direction kernel pays the (N,D,D)->(D,D,N)
        # relayout as before
        B = (P0 + jnp.transpose(P0, (0, 2, 1))
             + eye[None, :, :] * dvec[:, None, :])
        if ppw.shape[1]:
            s = body_rng[0]
            pad = ((0, 0), (s, D - body_rng[1]), (s, D - body_rng[1]))
            B = B + jnp.pad(ppw, pad)
        return f, g0 + gq, B

    def cost_fn(x, aux):
        sim = simulate_markers(prob, opts, x)
        wrow = aux["mask"] * aux["wt_data"]
        rd = (sim - aux["markers"]) * wrow[:, None]
        f = jnp.sum(rd * rd)
        D_ = D
        zg = jnp.zeros(D_, x.dtype)
        zB = jnp.zeros((D_, D_), x.dtype)
        f, _, _ = _quad_terms(x, aux, zg, zB, f)
        return f

    def cost_fn_batched(x, aux):
        interp = jax.default_backend() != "tpu"
        sim = marker_sim(model, prob.pallas_tables, x, interpret=interp)
        wrow = aux["mask"] * aux["wt_data"][:, None]
        rd = (sim - aux["markers"]) * wrow[..., None]
        f = jnp.sum(rd * rd, axis=(1, 2))

        def quad_only(xi, auxi, fi):
            zg = jnp.zeros(D, xi.dtype)
            zB = jnp.zeros((D, D), xi.dtype)
            fo, _, _ = _quad_terms(xi, auxi, zg, zB, fi)
            return fo

        return jax.vmap(quad_only)(x, aux, f)

    return GNSystem(system_fn, cost_fn,
                    system_fn_batched if use_pallas else None,
                    cost_fn_batched if use_pallas else None,
                    b_frame_minor=bool(use_pallas and use_bt
                                       and _BT_LAYOUT == "frame_minor"))


def stageii_term_energies(prob: StageIIProblem, opts: StageIIOptions,
                          prior, model_type: str):
    """Per-term sum-of-squares breakdown fn (x, aux) -> dict[str, ()].

    The reference logs per-objective loss before/after every solve
    (chmosh.py:408-417, 662-707); this is the batched equivalent, consumed by
    the fused solver's telemetry scan.
    """
    prior_n = prior
    spec = _term_spec(prob, opts, model_type)
    wt = opts.wt
    velo_w = _velo_weight_vec(prob, opts, spec)

    def energies(x, aux):
        pose = x[spec.pose_sl]
        extra = x[spec.extra_sl]
        sim = simulate_markers(prob, opts, x)
        rdata = (sim - aux["markers"]) * (aux["mask"] * aux["wt_data"])[:, None]
        out = {"data": jnp.sum(rdata * rdata)}
        if prior_n is not None and spec.body_ids is not None:
            w = wt("poseB") * aux["anneal"] * aux["wt_pose_scale"]
            xb = x[jnp.asarray(spec.body_ids)]
            rp = (gmm_prior_residual(prior_n, xb)
                  if isinstance(prior_n, MaxMixturePrior) else prior_n(xb)) * w
            out["poseB"] = rp @ rp
        if spec.finger_ids is not None:
            v = x[jnp.asarray(spec.finger_ids)] * (wt("poseH") * aux["anneal"])
            out["poseH"] = v @ v
        if spec.face_ids is not None:
            v = x[jnp.asarray(spec.face_ids)] * (wt("poseF") * aux["anneal"])
            out["poseF"] = v @ v
            ve = extra * wt("expr")
            out["expr"] = ve @ ve
        if opts.optimize_dynamics and extra.shape[0]:
            ve = extra * wt("dmpl")
            out["dmpl"] = ve @ ve
            va_ = (extra - aux["extra_anchor"]) * (6.0 * aux["extra_on"])
            out["dmpl_anchor"] = va_ @ va_
        v = (pose - aux["velo_anchor"]) * (velo_w * aux["velo_on"])
        out["velo"] = v @ v
        return out

    return energies


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


def _interp_x(xa: jnp.ndarray, seg_lo: jnp.ndarray, seg_hi: jnp.ndarray,
              alpha: jnp.ndarray, model: SurfaceModel) -> jnp.ndarray:
    """Rotation-aware interpolation of packed params between anchor solves.

    Joint axis-angles (root + articulated body) interpolate by per-joint
    quaternion slerp — linear axis-angle blending lands in the wrong basin
    for large inter-anchor rotations (fast spins at anchor stride 8).
    Hand-PCA coefficients, translation and extra dims are linear.
    """
    lo = xa[seg_lo]                                   # (F, D)
    hi = xa[seg_hi]
    a = alpha[:, None]
    lin = (1.0 - a) * lo + a * hi
    bd = model.info.body_pose_dof                     # aa dims in pose vector
    n_j = bd // 3
    lo_aa = lo[:, 3:3 + bd].reshape(-1, n_j, 3)
    hi_aa = hi[:, 3:3 + bd].reshape(-1, n_j, 3)
    aa = slerp_axis_angle(lo_aa, hi_aa, alpha[:, None, None])
    return lin.at[:, 3:3 + bd].set(aa.reshape(-1, bd))


def _hashable_opts(opts: StageIIOptions):
    w = tuple(sorted((opts.weights or {}).items()))
    return (dataclasses.replace(opts, weights=None), w)


# jitted per-phase step functions, cached across solve calls / subjects.
# Key: (hashable opts, model_type, callable-prior identity, jit flag).
# One giant fused program for the whole schedule compiles (we tried) but
# XLA's scheduling degrades badly at that size (~15x runtime regression);
# per-phase programs at ~27 ms dispatch each are the sweet spot.
_PHASE_FNS_CACHE: Dict = {}


def _phase_fns(opts: StageIIOptions, model_type: str, prior_call, jit_solve: bool,
               mesh=None):
    key = (_hashable_opts(opts), model_type, prior_call, jit_solve,
           None if mesh is None else (tuple(mesh.shape.items()),
                                      tuple(d.id for d in mesh.devices.flat)))
    if key in _PHASE_FNS_CACHE:
        return _PHASE_FNS_CACHE[key]

    wt = opts.wt
    dl_opts = DoglegOptions(maxiter=opts.maxiter, delta_0=0.5,
                            linear_solver=opts.linear_solver,
                            cg_iters=opts.cg_iters,
                            jac_precision=opts.jac_precision)
    # the polish phase chases e_3 = 1e-4 improvements — shallow CG directions
    # stall there (accepted steps keep clearing the tiny threshold); it gets
    # either deep PCG (cheap via the Pallas kernel) or an exact Cholesky
    polish_solver = opts.polish_solver
    if polish_solver == "auto":
        polish_solver = ("pcg" if (opts.jac_backend != "xla"
                                   and jax.default_backend() == "tpu")
                         else "cholesky")
    dl_polish = dataclasses.replace(dl_opts, linear_solver=polish_solver,
                                    cg_iters=opts.cg_iters_polish)

    def _system(prob, prior):
        return make_stageii_system(prob, opts, prior_call or prior, model_type)

    def _velo_aux(prob, x):
        P = prob.sub_model.pose_dof
        F = x.shape[0]
        pose = x[:, 3:3 + P]
        extra = x[:, 3 + P:]
        velo_anchor = 2.0 * jnp.roll(pose, 1, 0) - jnp.roll(pose, 2, 0)
        velo_on = (jnp.arange(F) >= 2).astype(jnp.float32)
        extra_anchor = jnp.zeros_like(extra)
        extra_on = jnp.zeros((F,), jnp.float32)
        if opts.optimize_dynamics and extra.shape[1]:
            extra_anchor = 2.0 * jnp.roll(extra, 1, 0) - jnp.roll(extra, 2, 0)
            extra_on = velo_on
        return (velo_anchor * velo_on[:, None], velo_on,
                extra_anchor * extra_on[:, None], extra_on)

    def _shard_solve(prob, prior, x, aux, pmask, e3, dl):
        """Run the batched solve under `shard_map` over the frame axis.

        Each shard runs the full dogleg schedule — Pallas kernels, in-graph
        compaction, while-loop termination — on its LOCAL frames with zero
        cross-chip traffic inside the loop (pallas_call has no SPMD
        partitioning rule under auto-sharded jit, which is why the sharded
        path previously had to fall back to the XLA einsum chain). Frame
        couplings (velocity anchors) are computed by the caller on the
        global array and arrive pre-sharded in `aux`.
        """
        axis = mesh.axis_names[0]
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        F = x.shape[0]
        pad = (-F) % n_dev
        if pad:
            # pad with all-missing frames: availability-driven weights make
            # them converge immediately; sliced away below
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            def _pad(a):
                if a.ndim and a.shape[0] == F:
                    return jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                return a
            aux = jax.tree.map(_pad, aux)

        P_ = jax.sharding.PartitionSpec
        shard = P_(axis)
        repl = P_()

        def local_solve(prob_, prior_, x_, aux_, pmask_, e3_):
            system = make_stageii_system(prob_, opts, prior_call or prior_,
                                         model_type)
            r = batched_system_solve(system, x_, aux_, dl, param_mask=pmask_,
                                     e_3=e3_,
                                     compact_buckets=opts.compact_buckets)
            return r.x, r.iterations

        aux_specs = jax.tree.map(lambda _: shard, aux)
        # check_vma=False: the dogleg while_loop seeds its carry from
        # replicated zeros but the body produces shard-varying values —
        # semantically fine (each shard loops independently), but the
        # varying-manual-axes type check rejects the mixed carry
        xs, its = jax.shard_map(
            local_solve, mesh=mesh,
            in_specs=(repl, repl, shard, aux_specs, repl, repl),
            out_specs=(shard, shard),
            check_vma=False)(prob, prior, x, aux,
                             jnp.asarray(pmask), jnp.asarray(e3))
        return xs[:F], its[:F]

    def _mk_step(dl, use_velo):
        def step(prob, prior, x, aux, pmask, e3):
            system = _system(prob, prior)
            energies_fn = stageii_term_energies(prob, opts,
                                                prior_call or prior, model_type)
            if use_velo:
                # on a mesh this runs on the GLOBAL frame axis (outside
                # shard_map), so the 2-frame velocity halo crosses shard
                # boundaries via the collective permute XLA inserts for roll
                va, von, ea_, eon = _velo_aux(prob, x)
                aux = dict(aux, velo_anchor=va, velo_on=von,
                           extra_anchor=ea_, extra_on=eon)

            def mean_en(xx):
                e = jax.vmap(energies_fn)(xx, aux)
                return jnp.stack([jnp.mean(v) for v in e.values()])

            eb = mean_en(x)
            if mesh is not None:
                xs, its = _shard_solve(prob, prior, x, aux, pmask, e3, dl)
                return xs, its, eb, mean_en(xs)
            r = batched_system_solve(system, x, aux, dl, param_mask=pmask,
                                     e_3=e3,
                                     compact_buckets=opts.compact_buckets)
            return r.x, r.iterations, eb, mean_en(r.x)
        return jax.jit(step) if jit_solve else step

    def init_fn(prob, obs, maskf):
        return rigid_init(prob, opts, obs, maskf)

    def interp_fn(prob, xa, seg_lo, seg_hi, alpha):
        return _interp_x(xa, seg_lo, seg_hi, alpha, prob.sub_model)

    def finalize_fn(prob, x, iters, obs, maskf):
        return _finalize(prob, opts, x, iters, obs, maskf)

    jit_ = jax.jit if jit_solve else (lambda f: f)
    fns = {
        "step": _mk_step(dl_opts, False),
        "step_velo": _mk_step(dl_opts, True),
        "polish_velo": _mk_step(dl_polish, True),
        "polish": _mk_step(dl_polish, False),
        "init": jit_(init_fn),
        "interp": jit_(interp_fn),
        "finalize": jit_(finalize_fn),
    }
    _PHASE_FNS_CACHE[key] = fns
    return fns


class StageIIReport(NamedTuple):
    """Per-phase telemetry (reference-style per-objective logging,
    chmosh.py:408-417, 662-707)."""
    phase_names: Tuple[str, ...]
    term_names: Tuple[str, ...]
    energies_before: np.ndarray   # (n_phases, n_terms) mean over frames
    energies_after: np.ndarray    # (n_phases, n_terms)
    iterations: np.ndarray        # (n_phases,) mean dogleg iterations/frame

    def format_table(self) -> str:
        hdr = "phase        iters  " + "  ".join(
            f"{t:>10s}" for t in self.term_names)
        rows = [hdr]
        for i, name in enumerate(self.phase_names):
            vals = "  ".join(f"{self.energies_after[i, j]:10.3e}"
                             for j in range(len(self.term_names)))
            rows.append(f"{name:12s} {self.iterations[i]:5.1f}  {vals}")
        return "\n".join(rows)


def _chunk_fingerprint(prob, inner_opts, obs_c, msk_c) -> str:
    """Content hash tying a chunk checkpoint to its exact inputs: observed
    markers + mask of the padded window, the frozen subject context, and
    every solver option. A stale checkpoint (edited mocap, different weights,
    different model) fails the compare and the chunk re-solves."""
    h = hashlib.sha1()
    h.update(np.asarray(prob.betas, np.float32).tobytes())
    h.update(np.asarray(prob.coeffs, np.float32).tobytes())
    for c in (prob.frame_c0, prob.frame_c1, prob.frame_c2):
        h.update(np.asarray(c, np.int32).tobytes())
    h.update(repr(dataclasses.replace(inner_opts, checkpoint_dir=None)).encode())
    h.update(obs_c.tobytes())
    h.update(msk_c.tobytes())
    return h.hexdigest()


_CKPT_REPORT_FIELDS = ("energies_before", "energies_after", "iterations")


def _chunk_ckpt_load(path, fingerprint, return_report):
    """Return (StageIIResult interior, StageIIReport | None) or None."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["fingerprint"]) != fingerprint:
                return None
            if return_report and "report_energies_after" not in z:
                return None  # saved without telemetry; re-solve to get it
            res = StageIIResult(*[z[f] for f in StageIIResult._fields])
            rep = None
            if return_report:
                rep = StageIIReport(
                    phase_names=tuple(str(s) for s in z["report_phase_names"]),
                    term_names=tuple(str(s) for s in z["report_term_names"]),
                    **{f: z["report_" + f] for f in _CKPT_REPORT_FIELDS})
            return res, rep
    except Exception:  # truncated/corrupt file from a mid-write crash
        return None


def _chunk_ckpt_save(path, fingerprint, piece, rep):
    arrays = {"fingerprint": np.asarray(fingerprint)}
    arrays.update({f: np.asarray(getattr(piece, f))
                   for f in StageIIResult._fields})
    if rep is not None:
        # "report_" prefix: StageIIResult and StageIIReport both have an
        # `iterations` field (per-frame vs per-phase)
        arrays["report_phase_names"] = np.asarray(rep.phase_names)
        arrays["report_term_names"] = np.asarray(rep.term_names)
        arrays.update({"report_" + f: np.asarray(getattr(rep, f))
                       for f in _CKPT_REPORT_FIELDS})
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a partial .npz


def _solve_chunked(prob, opts, markers_obs, mask, *, prior, model_type,
                   jit_solve, return_report, on_phase, mesh):
    """Overlapping-chunk drive of mosh_stageii_solve for long sequences.

    Each chunk covers [s - halo, s + C + halo) and is edge-padded to the
    fixed size C + 2*halo, so every chunk reuses one compiled program; only
    the interior [s, s + C) of each solve is kept. Seam frames therefore
    have >= halo frames of velocity-sweep context on both sides — chunk
    results agree at the seams up to solver noise (pinned in
    tests/test_pipeline.py::TestChunkedSolve).

    Telemetry note: per-phase report energies are means over each chunk's
    padded window, merged weighted by kept-interior size — an approximation
    of the single-batch report (halo frames are counted in two windows, pad
    frames mimic the boundary frame)."""
    F = markers_obs.shape[0]
    C, H = int(opts.chunk_frames), int(opts.chunk_halo)
    inner_opts = dataclasses.replace(opts, chunk_frames=0)
    markers_obs = np.asarray(markers_obs, np.float32)
    mask = np.asarray(mask, bool)

    W = C + 2 * H                              # fixed compile shape
    if mesh is not None:                       # shard_map needs W % n_dev == 0
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        W = -(-W // n_dev) * n_dev

    ckpt_dir = opts.checkpoint_dir
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)

    pieces, reps, kept_sizes = [], [], []
    for s in range(0, F, C):
        lo, hi = max(0, s - H), min(F, s + C + H)
        obs_c, msk_c = markers_obs[lo:hi], mask[lo:hi]
        pad = W - (hi - lo)
        if pad:
            # tail-pad by edge-replicating the window's last real frame:
            # padded frames solve to that boundary pose, so the velocity
            # term sees a stationary tail, and (except at the sequence end,
            # where that is the true semantics) the pad sits >= halo frames
            # away from anything kept
            obs_c = np.concatenate([obs_c, obs_c[-1:].repeat(pad, 0)], axis=0)
            msk_c = np.concatenate([msk_c, msk_c[-1:].repeat(pad, 0)], axis=0)
        n_keep = min(C, F - s)
        ckpt_path = fp = None
        if ckpt_dir:
            fp = _chunk_fingerprint(prob, inner_opts, obs_c, msk_c)
            ckpt_path = os.path.join(ckpt_dir, f"chunk_{s:09d}.npz")
            cached = _chunk_ckpt_load(ckpt_path, fp, return_report)
            if cached is not None:
                piece, rep = cached
                pieces.append(piece)
                if rep is not None:
                    reps.append(rep)
                    kept_sizes.append(n_keep)
                continue
        out = mosh_stageii_solve(prob, inner_opts, obs_c, msk_c, prior=prior,
                                 model_type=model_type, jit_solve=jit_solve,
                                 return_report=return_report,
                                 on_phase=on_phase, mesh=mesh)
        res, rep = out if return_report else (out, None)
        take = slice(s - lo, s - lo + n_keep)
        piece = StageIIResult(*[np.asarray(f)[take] for f in res])
        if ckpt_dir:
            _chunk_ckpt_save(ckpt_path, fp, piece, rep)
        pieces.append(piece)
        if rep is not None:
            reps.append(rep)
            kept_sizes.append(n_keep)

    result = StageIIResult(*[np.concatenate([getattr(p, f) for p in pieces])
                             for f in StageIIResult._fields])
    if not return_report:
        return result
    w = np.asarray(kept_sizes, np.float64)[:, None, None] / F
    eb = np.asarray([r.energies_before for r in reps])
    ea = np.asarray([r.energies_after for r in reps])
    it = np.asarray([r.iterations for r in reps])
    report = StageIIReport(
        phase_names=reps[0].phase_names, term_names=reps[0].term_names,
        energies_before=np.sum(eb * w, axis=0),
        energies_after=np.sum(ea * w, axis=0),
        iterations=np.sum(it * w[..., 0], axis=0),
    )
    return result, report


def mosh_stageii_solve(prob: StageIIProblem,
                       opts: StageIIOptions,
                       markers_obs: np.ndarray,
                       mask: np.ndarray,
                       prior: Optional[MaxMixturePrior] = None,
                       model_type: Optional[str] = None,
                       jit_solve: bool = True,
                       return_report: bool = False,
                       on_phase=None,
                       mesh=None):
    """Solve all frames. markers_obs (F, M, 3) in meters, mask (F, M) bool.

    The schedule runs as a sequence of jitted per-phase solves (cached across
    calls and subjects); arrays stay on device between phases, straggler
    compaction happens in-graph inside each phase. Multi-chip: pass inputs
    with a frame-axis `NamedSharding` (see parallel/sharding.py) — the same
    phase programs then run SPMD with XLA-inserted collectives, and the
    in-graph compaction argsort doubles as cross-chip load balancing.

    `on_phase(phase_name, x, markers_sim)` is an optional per-phase hook
    (headless stand-in for the reference's live visualization at
    verbosity > 1, chmosh.py:516-519) — see
    `tools/visualization.phase_snapshot_writer`. It forces a host sync per
    phase; leave None in production.

    Returns a StageIIResult, or (StageIIResult, StageIIReport) when
    `return_report=True`.
    """
    if opts.chunk_frames and markers_obs.shape[0] > opts.chunk_frames:
        return _solve_chunked(prob, opts, markers_obs, mask, prior=prior,
                              model_type=model_type, jit_solve=jit_solve,
                              return_report=return_report,
                              on_phase=on_phase, mesh=mesh)

    model = prob.sub_model
    model_type = model_type or model.model_type
    markers_obs = jnp.asarray(markers_obs, jnp.float32)
    maskf = jnp.asarray(mask, jnp.float32)
    F, M = maskf.shape
    P = model.pose_dof
    E = _num_extra(model, opts)
    wt = opts.wt

    prior_call = None
    prior_arrays = prior
    if prior is not None and not isinstance(prior, MaxMixturePrior):
        prior_call = prior        # static closure (horse etc.)
        prior_arrays = None
    fns = _phase_fns(opts, model_type, prior_call, jit_solve, mesh=mesh)

    n_obs = jnp.sum(maskf, axis=1)                            # (F,)
    wt_data = wt("data") * NUM_TRAIN_MARKERS / jnp.maximum(n_obs, 1.0)
    missing_frac = (M - n_obs) / M
    anneal = 1.0 + missing_frac * wt("annealing")             # chmosh.py:596-609

    def aux_for(n, obs, msk, wdata, ann, scale=1.0):
        z = jnp.zeros((n,), jnp.float32)
        return {
            "markers": obs, "mask": msk, "wt_data": wdata, "anneal": ann,
            "wt_pose_scale": jnp.full((n,), scale, jnp.float32),
            "velo_anchor": jnp.zeros((n, P), jnp.float32),
            "velo_on": z,
            "extra_anchor": jnp.zeros((n, E), jnp.float32),
            "extra_on": z,
        }

    reports = []

    def run(step_key, x, aux, pmask, e3, name=None):
        x, its, eb, ea = fns[step_key](prob, prior_arrays, x, aux,
                                       pmask, jnp.float32(e3))
        reports.append((eb, ea, its))
        if on_phase is not None and name is not None:
            sim = jax.vmap(lambda xi: simulate_markers(prob, opts, xi))(x)
            on_phase(name, np.asarray(x), np.asarray(sim))
        return x, its

    step1_mask, step2_mask = _param_masks(model, opts, model_type)
    aux_full = aux_for(F, markers_obs, maskf, wt_data, anneal)

    # ---- pass A: anchor solves + slerped warm starts ------------------------
    S = max(int(opts.anchor_stride), 1)
    if S > 1 and F > S:
        anchor_ids = np.arange(0, F, S)
        if anchor_ids[-1] != F - 1:
            anchor_ids = np.append(anchor_ids, F - 1)
        a = jnp.asarray(anchor_ids)
        nA = len(anchor_ids)
        obs_a, msk_a = markers_obs[a], maskf[a]
        aux_a = lambda s: aux_for(nA, obs_a, msk_a, wt_data[a], anneal[a], s)

        xa = fns["init"](prob, obs_a, msk_a)
        for scale in (10.0, 5.0, 1.0):  # first-frame schedule, chmosh.py:637
            xa, _ = run("step", xa, aux_a(scale), step1_mask,
                        opts.e_3_anneal, name=f"anneal{scale:g}")
        xa, _ = run("step", xa, aux_a(1.0), step2_mask, 1e-2,
                    name="anchor_step2")

        # rotation-aware interpolation between consecutive anchors
        seg = np.minimum(np.searchsorted(anchor_ids, np.arange(F), "right") - 1,
                         len(anchor_ids) - 2)
        lo = anchor_ids[seg]
        hi = anchor_ids[seg + 1]
        alpha = jnp.asarray(((np.arange(F) - lo) / np.maximum(hi - lo, 1))
                            .astype(np.float32))
        x = fns["interp"](prob, xa, jnp.asarray(seg), jnp.asarray(seg + 1),
                          alpha)
    else:
        x = fns["init"](prob, markers_obs, maskf)
        for scale in (10.0, 5.0, 1.0):
            x, _ = run("step", x, aux_for(F, markers_obs, maskf, wt_data,
                                          anneal, scale), step1_mask,
                       opts.e_3_anneal, name=f"anneal{scale:g}")
        reports.append(reports[-1])  # keep phase slots aligned (no anchor pass)

    # step 1: trans + body at e_3 = .01 (chmosh.py:669-671)
    x, _ = run("step", x, aux_full, step1_mask, 1e-2, name="step1")
    # step 2: full pose (chmosh.py:703-705)
    x, _ = run("step", x, aux_full, step2_mask, 1e-2, name="step2")

    # ---- pass B: Jacobi smoothing sweeps (velocity + dmpl extrapolation) ---
    # the sequential pose_t ~ 2 pose_{t-1} - pose_{t-2} coupling
    # (chmosh.py:624-626) re-created as batched re-solves against anchors
    # computed in-graph from the previous sweep's solutions
    sweep_reports = []
    for _ in range(opts.smoothing_sweeps):
        x, _ = run("step_velo", x, aux_full, step2_mask, 1e-2,
                   name="sweep")
        sweep_reports.append(reports.pop())
    # one "sweeps" phase slot: energies before sweep 1, after the last sweep
    if sweep_reports:
        reports.append((sweep_reports[0][0], sweep_reports[-1][1],
                        sweep_reports[-1][2]))
    else:
        reports.append(reports[-1])

    # polish: one tight full-pose solve from the warm state, keeping the
    # velocity anchors so the smoothness coupling survives the final solve
    iters = jnp.zeros((F,), jnp.int32)
    if opts.e_3_polish is not None:
        use_velo = opts.smoothing_sweeps > 0 and F > 2
        x, iters = run("polish_velo" if use_velo else "polish",
                       x, aux_full, step2_mask, opts.e_3_polish,
                       name="polish")
    else:
        reports.append(reports[-1])

    result = fns["finalize"](prob, x, iters, markers_obs, maskf)
    if not return_report:
        return result
    report = StageIIReport(
        phase_names=STAGEII_PHASE_NAMES,
        term_names=report_arrays_spec(prob, opts, prior, model_type),
        energies_before=np.stack([np.asarray(r[0]) for r in reports]),
        energies_after=np.stack([np.asarray(r[1]) for r in reports]),
        iterations=np.asarray([float(np.mean(np.asarray(r[2])))
                               for r in reports]))
    return result, report


def stageii_system_probe(prob: StageIIProblem,
                         opts: StageIIOptions,
                         markers_obs,
                         mask,
                         prior=None,
                         model_type: Optional[str] = None,
                         mesh=None):
    """One batched GN system evaluation (f, g, B) at the rigid-init point.

    With `mesh` the assembly runs under `shard_map` over the frame axis with
    the same padding/replication layout as the sharded solve. Comparing the
    sharded probe against the unsharded one pins the SPMD decomposition
    (aux alignment, frame padding, replication specs) to floating-point
    reduction noise (~1e-8 relative, measured) — the strongest equality that
    exists across batch shapes: the PCG direction on the cond≈1e7 annealed
    system amplifies reduction-order ulps ~1e6x and accept-test flips then
    decorrelate the dogleg iterates, so full solves can only be compared at
    convergence-quality level (see `__graft_entry__.dryrun_multichip`).
    """
    model = prob.sub_model
    model_type = model_type or model.model_type
    markers_obs = jnp.asarray(markers_obs, jnp.float32)
    maskf = jnp.asarray(mask, jnp.float32)
    F, M = maskf.shape
    P = model.pose_dof
    E = _num_extra(model, opts)
    wt = opts.wt

    n_obs = jnp.sum(maskf, axis=1)
    wt_data = wt("data") * NUM_TRAIN_MARKERS / jnp.maximum(n_obs, 1.0)
    anneal = 1.0 + (M - n_obs) / M * wt("annealing")
    aux = {"markers": markers_obs, "mask": maskf, "wt_data": wt_data,
           "anneal": anneal,
           "wt_pose_scale": jnp.full((F,), 10.0, jnp.float32),
           "velo_anchor": jnp.zeros((F, P), jnp.float32),
           "velo_on": jnp.zeros((F,), jnp.float32),
           "extra_anchor": jnp.zeros((F, E), jnp.float32),
           "extra_on": jnp.zeros((F,), jnp.float32)}
    system = make_stageii_system(prob, opts, prior, model_type)
    sys_raw = system.system_fn_batched or jax.vmap(system.system_fn)

    def sys_b(x, a):
        # probe convention stays (N, D, D) regardless of the assembly layout
        f_, g_, B_ = sys_raw(x, a)
        if system.b_frame_minor:
            B_ = jnp.moveaxis(B_, -1, 0)
        return f_, g_, B_

    x0 = rigid_init(prob, opts, markers_obs, maskf)
    if mesh is None:
        return jax.jit(sys_b)(x0, aux)

    axis = mesh.axis_names[0]
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pad = (-F) % n_dev
    if pad:
        x0 = jnp.concatenate([x0, jnp.zeros((pad,) + x0.shape[1:])])
        aux = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            if a.ndim and a.shape[0] == F else a, aux)
    sh = jax.sharding.PartitionSpec(axis)
    f, g, B = jax.jit(jax.shard_map(
        sys_b, mesh=mesh,
        in_specs=(sh, jax.tree.map(lambda _: sh, aux)),
        out_specs=(sh, sh, sh), check_vma=False))(x0, aux)
    return f[:F], g[:F], B[:F]


def report_arrays_spec(prob, opts, prior, model_type) -> Tuple[str, ...]:
    """Static term-name ordering of the telemetry arrays."""
    en = stageii_term_energies(prob, opts, prior, model_type)
    P = prob.sub_model.pose_dof
    E = _num_extra(prob.sub_model, opts)
    M = prob.num_markers
    x = jnp.zeros(3 + P + E, jnp.float32)
    aux = {"markers": jnp.zeros((M, 3)), "mask": jnp.zeros((M,)),
           "wt_data": jnp.zeros(()), "anneal": jnp.zeros(()),
           "wt_pose_scale": jnp.zeros(()),
           "velo_anchor": jnp.zeros((P,)), "velo_on": jnp.zeros(()),
           "extra_anchor": jnp.zeros((E,)), "extra_on": jnp.zeros(())}
    return tuple(jax.eval_shape(en, x, aux).keys())


def _finalize(prob, opts, x, iters, markers_obs, maskf) -> StageIIResult:
    model = prob.sub_model
    P = model.pose_dof
    trans = x[:, :3]
    pose = x[:, 3:3 + P]
    extra = x[:, 3 + P:]
    sim = jax.vmap(lambda xi: simulate_markers(prob, opts, xi))(x)
    fullpose = jax.vmap(lambda p: fullpose_from_pose(model, p))(pose)
    err = jnp.sqrt(jnp.sum((sim - markers_obs) ** 2, -1)) * maskf
    n_obs = jnp.sum(maskf, axis=1)
    data_err = jnp.sum(err, -1) / jnp.maximum(n_obs, 1.0)
    return StageIIResult(trans=trans, pose=pose, fullpose=fullpose,
                         extra=extra, markers_sim=sim, data_err=data_err,
                         iterations=iters)
