"""Stage I — joint estimation of subject shape (betas), latent marker
placements, and per-frame poses from ~12 sampled frames.

Reference: `chmosh.py:83-455` — 12 chumpy models sharing one betas array,
TransformedCoeffs/Lms marker transport, a signed surface-distance term
keeping latent markers at their nominal skin offset, a per-type init
(anchor) term, GMM pose prior, and a 4-step weight-annealing schedule
[1, .5, .25, .125] each ending in a dogleg solve.

TPU formulation: all 12 frames live in ONE packed parameter vector
  x = [betas | markers_latent | poses (F x P) | trans (F x 3) | exprs?]
so the shared-beta coupling is exact (one dense Gauss-Newton system rather
than 12 graphs aliasing one array). Per annealing step, the discrete
structure — marker-frame vertex triples (the 8-NN of TransformedCoeffs,
transformed_lm.py:73-74), candidate triangles for the surface term (the CGAL
AABB query, mesh_distance_main.py:321-336), vertex-subset gathers — is
frozen outside jit, then one batched dogleg runs with static shapes. The
reference recomputes these inside every iteration but treats them as
constants for derivatives; freezing per annealing step matches its
differentiation semantics while letting XLA compile once.

Unlike the chumpy implementation, shared betas and per-frame facial
expressions can be optimized together here (no double-indexing restriction —
cf. the reference's NotImplementedError at chmosh.py:288-291 and the
workaround comment in bodymodel_loader.py:141-147).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.models.body_model import (MODEL_TYPE_INFO, SurfaceModel,
                                          lbs_forward, pose_part_ids)
from moshpp_tpu.ops.knn import nearest_vertex
from moshpp_tpu.ops.marker_transform import (MarkerFrameIndices,
                                             marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.point_mesh import closest_point_on_triangles
from moshpp_tpu.ops.rigid_align import kabsch
from moshpp_tpu.ops.rodrigues import rodrigues_inverse
from moshpp_tpu.ops.robustifiers import signed_sqrt
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.priors.gmm import MaxMixturePrior, gmm_prior_residual
from moshpp_tpu.solver.gauss_newton import DoglegOptions, dogleg_solve

NUM_TRAIN_MARKERS = 46.0  # chmosh.py:101

DEFAULT_STAGEI_WEIGHTS = {
    # smplh/smplx table, support_data/conf/moshpp_conf.yaml:105-117
    "poseH": 3.0, "poseF": 3.0, "expr": 34.0, "poseB": 3.0,
    "init_finger_left": 400.0, "init_finger_right": 400.0, "init_finger": 400.0,
    "betas": 10.0, "init": 300.0, "data": 75.0, "surf": 10000.0,
    "annealing": (1.0, 0.5, 0.25, 0.125),
}


@dataclasses.dataclass(frozen=True)
class StageIOptions:
    optimize_fingers: bool = False
    optimize_face: bool = False
    optimize_toes: bool = False
    optimize_betas: bool = True
    num_betas: int = 16
    num_expressions: int = 10
    expr_start: int = 300
    maxiter: int = 100
    e_3: float = 1e-3            # opt_settings.stagei_lr
    knn_k: int = 8
    surf_candidates: int = 32    # exact-distance faces per marker
    weights: Optional[Dict] = None

    def wt(self, key: str, default=None):
        w = dict(DEFAULT_STAGEI_WEIGHTS)
        w.update(self.weights or {})
        if default is not None and key not in w:
            return default
        return w[key]


class StageIResult(NamedTuple):
    betas: np.ndarray
    markers_latent: np.ndarray           # (M, 3)
    latent_labels: List[str]
    markers_latent_vids: Dict[str, int]  # nearest-vid snap per label
    poses: np.ndarray                    # (F, P)
    trans: np.ndarray                    # (F, 3)
    exprs: Optional[np.ndarray]          # (F, ne) when optimize_face
    errs: Dict[str, float]
    markers_sim: np.ndarray              # (F, M, 3)


class _Layout(NamedTuple):
    """Static offsets into the packed parameter vector."""
    nb: int
    M: int
    F: int
    P: int
    ne: int

    @property
    def dim(self):
        return self.nb + 3 * self.M + self.F * (self.P + 3) + self.F * self.ne

    def split(self, x):
        o = 0
        betas = x[o:o + self.nb]; o += self.nb
        latents = x[o:o + 3 * self.M].reshape(self.M, 3); o += 3 * self.M
        poses = x[o:o + self.F * self.P].reshape(self.F, self.P); o += self.F * self.P
        trans = x[o:o + 3 * self.F].reshape(self.F, 3); o += 3 * self.F
        exprs = x[o:].reshape(self.F, self.ne) if self.ne else None
        return betas, latents, poses, trans, exprs

    def pack(self, betas, latents, poses, trans, exprs=None):
        parts = [jnp.ravel(betas), jnp.ravel(latents), jnp.ravel(poses),
                 jnp.ravel(trans)]
        if self.ne:
            parts.append(jnp.ravel(exprs))
        return jnp.concatenate(parts)


def _full_can_verts(model, betas):
    nb = betas.shape[-1]
    with jax.default_matmul_precision("highest"):  # bf16 default = mm noise
        return model.v_template + jnp.einsum(
            "vcb,b->vc", model.shapedirs[..., :nb], betas)


def _init_latents(model: SurfaceModel, layout_vids: np.ndarray,
                  m2b: np.ndarray) -> np.ndarray:
    """Initial latent markers: layout vertex + skin offset along the vertex
    normal (prepare_mosh_markers_latent, chmosh.py:57-80)."""
    can_v = np.asarray(model.v_template)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    return can_v[layout_vids] + vn[layout_vids] * m2b[:, None]


class _StageICtx(NamedTuple):
    """Loop-invariant context of a stage-i solve (built once, used by every
    annealing step and by the scipy parity tests)."""
    model: SurfaceModel
    lay: _Layout
    opts: StageIOptions
    frames_obs: jnp.ndarray
    maskf: jnp.ndarray
    faces_np: np.ndarray
    exclude_vertex_mask: jnp.ndarray
    prior_fn: object
    prior_ids: object
    m2b_j: jnp.ndarray
    init_anchor: jnp.ndarray
    init_wt_type: jnp.ndarray
    head_corr_mat: object
    head_ids: object
    parts: dict
    face_ids: object
    base_wt_data: float


def prepare_stagei_context(model: SurfaceModel,
                           frames_obs: np.ndarray,
                           frames_mask: np.ndarray,
                           layout_vids: np.ndarray,
                           m2b: np.ndarray,
                           type_masks: Dict[str, np.ndarray],
                           opts: StageIOptions = StageIOptions(),
                           prior: Optional[MaxMixturePrior] = None,
                           betas_init: Optional[np.ndarray] = None,
                           exclude_vertex_mask: Optional[np.ndarray] = None,
                           head_corr: Optional[tuple] = None):
    """Build the loop-invariant stage-i context + initial state.

    Returns (ctx, (betas, latents, poses, trans, exprs)); the init includes
    the per-frame rigid alignment (perform_rigid_adjustment, chmosh.py:228).
    """
    model_type = model.model_type
    parts = pose_part_ids(model_type, optimize_toes=opts.optimize_toes)
    F, M = frames_mask.shape
    P = model.pose_dof
    nb = opts.num_betas
    ne = opts.num_expressions if opts.optimize_face else 0
    lay = _Layout(nb=nb, M=M, F=F, P=P, ne=ne)
    wt = opts.wt

    frames_obs = jnp.asarray(frames_obs, jnp.float32)
    maskf = jnp.asarray(frames_mask, jnp.float32)
    faces_np = np.asarray(model.faces)

    if exclude_vertex_mask is None:
        from moshpp_tpu.markers.vids import smplx_eyeball_mask
        exclude_vertex_mask = smplx_eyeball_mask(model.v_template.shape[0])
    exclude_vertex_mask = jnp.asarray(exclude_vertex_mask)

    if isinstance(prior, MaxMixturePrior):
        prior_fn = lambda pose_body: gmm_prior_residual(prior, pose_body)
    else:
        prior_fn = prior

    latents0 = _init_latents(model, layout_vids, m2b)
    m2b_j = jnp.asarray(m2b, jnp.float32)

    # per-frame data weight: the reference divides by total latent count, not
    # per-frame availability, in stage-i (chmosh.py:327)
    base_wt_data = wt("data") * (NUM_TRAIN_MARKERS / M)

    # prior over the full body slice incl toes (chmosh.py:354)
    prior_ids = None
    if parts["body"]:
        full_body = pose_part_ids(model_type, optimize_toes=True)["body"]
        prior_ids = jnp.asarray(full_body, jnp.int32)

    face_ids = parts["face"]

    # state
    betas = jnp.zeros(nb, jnp.float32)
    if betas_init is not None:
        betas = jnp.asarray(betas_init[:nb], jnp.float32)
    latents = jnp.asarray(latents0, jnp.float32)
    poses = jnp.zeros((F, P), jnp.float32)
    trans = jnp.zeros((F, 3), jnp.float32)
    exprs = jnp.zeros((F, ne), jnp.float32)

    # rigid init per frame against the rest-pose simulated markers
    # (perform_rigid_adjustment, chmosh.py:228)
    can_v0 = _full_can_verts(model, betas)
    idx0 = select_frame_indices(can_v0, latents, k=opts.knn_k,
                                exclude_mask=exclude_vertex_mask)
    sim_rest = reconstruct_markers(can_v0, idx0, marker_coeffs(can_v0, latents, idx0))
    j0 = model.joint_template[0] + model.joint_shapedirs[0, :, :nb] @ betas

    def _rigid(obs, m):
        rot, t = kabsch(sim_rest, obs, m)
        return t + rot @ j0 - j0, rodrigues_inverse(rot)

    tr0, rv0 = jax.vmap(_rigid)(frames_obs, maskf)
    trans = tr0
    poses = poses.at[:, :3].set(rv0)

    # init anchors (init_markers_latent, chmosh.py:190-191, 360-373)
    init_anchor = jnp.asarray(latents0, jnp.float32)
    # per-marker init weight by type (wt_init tables, chmosh.py:329-330)
    init_wt_type = np.full(M, wt("init"), np.float32)
    for t, m in type_masks.items():
        init_wt_type[np.asarray(m, bool)] = wt(f"init_{t}", wt("init"))
    head_corr_mat = None
    head_ids = None
    if head_corr is not None:
        head_corr_mat = jnp.asarray(head_corr[0], jnp.float32)
        head_ids = jnp.asarray(head_corr[1], jnp.int32)
        # head markers leave the independent-anchor rows (chmosh.py:362-367)
        init_wt_type[np.asarray(head_corr[1])] = 0.0
    init_wt_type = jnp.asarray(init_wt_type)

    ctx = _StageICtx(
        model=model, lay=lay, opts=opts, frames_obs=frames_obs, maskf=maskf,
        faces_np=faces_np, exclude_vertex_mask=exclude_vertex_mask,
        prior_fn=prior_fn, prior_ids=prior_ids, m2b_j=m2b_j,
        init_anchor=init_anchor, init_wt_type=init_wt_type,
        head_corr_mat=head_corr_mat, head_ids=head_ids, parts=parts,
        face_ids=face_ids, base_wt_data=base_wt_data)
    return ctx, (betas, latents, poses, trans, exprs)


class _StageIFrozen(NamedTuple):
    """Per-subject discrete structure frozen at an annealing step.

    Every leaf is an array, so a batch of subjects stacks into one pytree
    (leading subject axis) and the shared residual runs under `vmap` —
    the subject axis of stage-i (independent jobs in the reference,
    run_tools.py:45-67) becomes a TPU batch axis."""
    idx_can: MarkerFrameIndices       # 3 x (M,) local 8-NN triples (canonical)
    cand_local: jnp.ndarray           # (M, K, 3) candidate corners (canonical)
    idx_posed: MarkerFrameIndices     # 3 x (M,) local triples (posed/data)
    sub_model: SurfaceModel           # LBS vertex subset (data union)
    can_template: jnp.ndarray         # (Uc, 3)
    can_shapedirs: jnp.ndarray        # (Uc, 3, nb)
    vn_corners: jnp.ndarray           # (M, K, 3, 3) frozen sign normals
    frames_obs: jnp.ndarray           # (F, M, 3)
    maskf: jnp.ndarray                # (F, M)


def _freeze_stagei_structure(ctx: _StageICtx, betas, latents) -> _StageIFrozen:
    """Freeze the discrete structure at (betas, latents) — host side, 4x per
    stage-i: 8-NN marker triples, exact-distance candidate faces for the
    surface term, vertex unions + local remaps, frozen sign normals."""
    model, lay, opts = ctx.model, ctx.lay, ctx.opts
    nb = lay.nb
    faces_np = ctx.faces_np

    can_v = _full_can_verts(model, betas)
    idx = select_frame_indices(can_v, latents, k=opts.knn_k,
                               exclude_mask=ctx.exclude_vertex_mask)
    stacked = np.asarray(idx.stacked)
    vn_frozen = vertex_normals(can_v, model.faces)

    # candidate faces per marker for the surface term, ranked by EXACT
    # point-triangle distance at the freeze state (host-side, 4x per
    # stage-i) — centroid ranking can miss the true nearest face on
    # dense meshes by ~0.2 mm (tests/test_scan2mesh.py measures this)
    cv = np.asarray(can_v)
    ta, tb, tc = (jnp.asarray(cv[faces_np[:, i]]) for i in range(3))
    pj = jnp.asarray(latents)[:, None, :]
    bary = closest_point_on_triangles(pj, ta[None], tb[None], tc[None])
    cp = (bary[..., 0:1] * ta[None] + bary[..., 1:2] * tb[None]
          + bary[..., 2:3] * tc[None])
    d_exact = np.asarray(jnp.sum((pj - cp) ** 2, -1))     # (M, F)
    cand_faces = np.argsort(d_exact, axis=1)[:, :opts.surf_candidates]
    cand_corner_vids = faces_np[cand_faces]                            # (M, K, 3)

    # vertex unions + local remaps
    can_union = np.unique(np.concatenate(
        [stacked.ravel(), cand_corner_vids.ravel()]))
    can_remap = {v: i for i, v in enumerate(can_union)}
    idx_can_local = MarkerFrameIndices(
        *(jnp.asarray(np.vectorize(can_remap.get)(stacked[:, i]), jnp.int32)
          for i in range(3)))
    cand_local = jnp.asarray(
        np.vectorize(can_remap.get)(cand_corner_vids), jnp.int32)

    data_union = np.unique(stacked)
    data_remap = {v: i for i, v in enumerate(data_union)}
    idx_posed_local = MarkerFrameIndices(
        *(jnp.asarray(np.vectorize(data_remap.get)(stacked[:, i]), jnp.int32)
          for i in range(3)))

    sub_model = model.subset(data_union)          # LBS path (12 frames)
    can_template = jnp.asarray(np.asarray(model.v_template)[can_union])
    can_shapedirs = jnp.asarray(np.asarray(model.shapedirs)[can_union][..., :nb])

    # frozen sign normals at candidate corners (M, K, 3, 3)
    vn_corners = jnp.asarray(np.asarray(vn_frozen)[cand_corner_vids])

    return _StageIFrozen(
        idx_can=idx_can_local, cand_local=cand_local,
        idx_posed=idx_posed_local, sub_model=sub_model,
        can_template=can_template, can_shapedirs=can_shapedirs,
        vn_corners=vn_corners, frames_obs=ctx.frames_obs, maskf=ctx.maskf)


def _pad_frozen(fz: _StageIFrozen, u_can: int, u_data: int) -> _StageIFrozen:
    """Pad the vertex unions to common sizes so frozen structures from
    different subjects stack into one batch. Padded rows are never gathered
    (all local indices point at real entries) and zero-weight LBS rows cost
    only dead lanes."""
    def _pad_rows(a, n):
        a = np.asarray(a)
        if a.shape[0] == n:
            return jnp.asarray(a)
        pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.asarray(np.pad(a, pad))

    sm = fz.sub_model
    sub_model = dataclasses.replace(
        sm,
        v_template=_pad_rows(sm.v_template, u_data),
        shapedirs=_pad_rows(sm.shapedirs, u_data),
        posedirs=_pad_rows(sm.posedirs, u_data),
        weights=_pad_rows(sm.weights, u_data))
    return fz._replace(
        sub_model=sub_model,
        can_template=_pad_rows(fz.can_template, u_can),
        can_shapedirs=_pad_rows(fz.can_shapedirs, u_can))


def _stagei_residual_fn(ctx: _StageICtx, anneal: float, detailed: bool):
    """Residual over (packed x, frozen structure) for one annealing step.

    One reference annealing step (chmosh.py:313-406): data rows, GMM prior,
    init anchors, betas regularizer, signed surface-distance term, and — on
    'detailed' steps — finger/face regularizers. Structure-dependent arrays
    arrive via `fz`, so the same traced function serves every subject in a
    batch."""
    model, lay, opts = ctx.model, ctx.lay, ctx.opts
    info = MODEL_TYPE_INFO[model.model_type]
    wt = opts.wt
    F, M, P, nb, ne = lay.F, lay.M, lay.P, lay.nb, lay.ne
    prior_fn, prior_ids = ctx.prior_fn, ctx.prior_ids
    init_anchor, m2b_j = ctx.init_anchor, ctx.m2b_j
    head_corr_mat, head_ids = ctx.head_corr_mat, ctx.head_ids
    face_ids = ctx.face_ids

    # ---- weights for this annealing step --------------------------------
    wt_data = ctx.base_wt_data / anneal
    wt_poseB = wt("poseB") * anneal
    wt_beta = wt("betas") * anneal
    wt_init_step = ctx.init_wt_type * anneal
    wt_surf = wt("surf")
    wt_poseH = wt("poseH") * anneal
    wt_poseF = wt("poseF") * anneal
    wt_expr = wt("expr") * anneal

    def residual(x, fz: _StageIFrozen):
            b, lat, ps, tr, ex = lay.split(x)
            can_sub = fz.can_template + jnp.einsum(
                "vcb,b->vc", fz.can_shapedirs, b)
            coeffs = marker_coeffs(can_sub, lat, fz.idx_can)
            terms = []

            def frame_betas(ex_f):
                if not ne:
                    return b
                es = min(opts.expr_start, model.num_shape_dirs - ne)
                out = jnp.zeros(es + ne, b.dtype).at[:nb].set(b)
                return out.at[es:].set(ex_f)

            def one_frame(pose_f, trans_f, ex_f, obs_f, mask_f):
                verts = lbs_forward(fz.sub_model, pose_f, frame_betas(ex_f),
                                    trans_f)
                sim = reconstruct_markers(verts, fz.idx_posed, coeffs)
                return ((obs_f - sim) * mask_f[:, None]).reshape(-1)

            ex_arg = ex if ne else jnp.zeros((F, 0), x.dtype)
            rdata = jax.vmap(one_frame)(ps, tr, ex_arg, fz.frames_obs,
                                        fz.maskf)
            terms.append(rdata.reshape(-1) * wt_data)

            if prior_fn is not None and prior_ids is not None:
                rp = jax.vmap(lambda p: prior_fn(p[prior_ids]))(ps)
                terms.append(rp.reshape(-1) * wt_poseB)

            init_loss = lat - init_anchor
            terms.append((init_loss * wt_init_step[:, None]).reshape(-1))
            if head_corr_mat is not None:
                # correlated head-marker anchor, body init weight
                # (chmosh.py:368-369)
                corr_rows = head_corr_mat @ init_loss[head_ids]
                terms.append((corr_rows * (wt("init") * anneal)).reshape(-1))

            if opts.optimize_betas:
                terms.append(b * wt_beta)

            # surface term: signed distance to frozen candidate faces
            a = can_sub[fz.cand_local[..., 0]]
            bb = can_sub[fz.cand_local[..., 1]]
            cc = can_sub[fz.cand_local[..., 2]]
            pts = lat[:, None, :]
            bary = closest_point_on_triangles(pts, a, bb, cc)   # (M, K, 3)
            cp = bary[..., 0:1] * a + bary[..., 1:2] * bb + bary[..., 2:3] * cc
            sq = jnp.sum((pts - cp) ** 2, axis=-1)              # (M, K)
            best = jax.lax.stop_gradient(jnp.argmin(sq, axis=1))
            mi = jnp.arange(M)
            cp_best = cp[mi, best]
            sq_best = sq[mi, best]
            n_best = jnp.sum(fz.vn_corners[mi, best] * bary[mi, best][..., None], axis=1)
            sign = jnp.sign(jnp.sum((lat - cp_best) * jax.lax.stop_gradient(n_best), -1))
            sign = jnp.where(sign == 0, 1.0, sign)
            sdist = sign * jnp.sqrt(sq_best + 1e-12)
            terms.append((sdist - m2b_j) * wt_surf)

            if detailed and opts.optimize_fingers and info.has_hands:
                terms.append((ps[:, info.body_pose_dof:] * wt_poseH).reshape(-1))
            if detailed and opts.optimize_face and face_ids:
                fid = jnp.asarray(face_ids, jnp.int32)
                terms.append((ps[:, fid] * wt_poseF).reshape(-1))
                terms.append((ex * wt_expr).reshape(-1))

            return jnp.concatenate(terms)

    return residual


def _stagei_pmask(ctx: _StageICtx, detailed: bool) -> np.ndarray:
    """Free-variable mask for one annealing step (chmosh.py:386-406)."""
    model, lay, opts = ctx.model, ctx.lay, ctx.opts
    info = MODEL_TYPE_INFO[model.model_type]
    F, M, P, nb, ne = lay.F, lay.M, lay.P, lay.nb, lay.ne
    parts, face_ids = ctx.parts, ctx.face_ids

    pmask = np.zeros(lay.dim, np.float32)
    if opts.optimize_betas:
        pmask[:nb] = 1.0
    pmask[nb:nb + 3 * M] = 1.0
    pose_on = list(parts["root"]) + list(parts["body"])
    if detailed and opts.optimize_fingers and info.has_hands:
        pose_on += list(range(info.body_pose_dof, P))
    if detailed and opts.optimize_face:
        pose_on += list(face_ids)
    o = nb + 3 * M
    for f in range(F):
        for i in sorted(set(pose_on)):
            pmask[o + f * P + i] = 1.0
    pmask[o + F * P: o + F * P + 3 * F] = 1.0   # trans
    if ne and detailed and opts.optimize_face:
        pmask[o + F * P + 3 * F:] = 1.0
    return pmask


def build_stagei_step(ctx: _StageICtx, betas, latents, anneal: float,
                      detailed: bool):
    """Freeze discrete structure at (betas, latents) and assemble one
    annealing step: returns (residual_fn over the packed vector, pmask)."""
    fz = _freeze_stagei_structure(ctx, betas, latents)
    rf = _stagei_residual_fn(ctx, anneal, detailed)

    def residual(x):
        return rf(x, fz)

    return residual, _stagei_pmask(ctx, detailed)


def mosh_stagei_solve(model: SurfaceModel,
                      frames_obs: np.ndarray,
                      frames_mask: np.ndarray,
                      latent_labels: List[str],
                      layout_vids: np.ndarray,
                      m2b: np.ndarray,
                      type_masks: Dict[str, np.ndarray],
                      opts: StageIOptions = StageIOptions(),
                      prior: Optional[MaxMixturePrior] = None,
                      betas_init: Optional[np.ndarray] = None,
                      exclude_vertex_mask: Optional[np.ndarray] = None,
                      head_corr: Optional[tuple] = None) -> StageIResult:
    """Run the full annealed stage-i solve.

    Args:
      frames_obs: (F, M, 3) observed markers (meters), aligned to
        latent_labels; frames_mask (F, M) availability.
      layout_vids/m2b/type_masks: from `markers.layout.layout_arrays`.
      betas_init: precomputed betas (chmosh.py:93-98) — optimization of betas
        still follows opts.optimize_betas.
      head_corr: optional (corr (H, H), head_marker_indices (H,)) — head
        markers' init anchors are coupled through the correlation matrix
        instead of anchored independently (chmosh.py:252-266, 362-369).
    """
    ctx, state = prepare_stagei_context(
        model, frames_obs, frames_mask, layout_vids, m2b, type_masks,
        opts=opts, prior=prior, betas_init=betas_init,
        exclude_vertex_mask=exclude_vertex_mask, head_corr=head_corr)
    betas, latents, poses, trans, exprs = state
    lay = ctx.lay
    F, M, P, nb, ne = lay.F, lay.M, lay.P, lay.nb, lay.ne
    frames_obs, maskf = ctx.frames_obs, ctx.maskf

    annealing = tuple(opts.wt("annealing"))
    errs: Dict[str, float] = {}

    for tidx, anneal in enumerate(annealing):
        detailed = tidx > len(annealing) - 3  # last two steps, chmosh.py:314
        residual, pmask = build_stagei_step(ctx, betas, latents, anneal,
                                            detailed)
        x0 = lay.pack(betas, latents, poses, trans, exprs if ne else None)
        res = jax.jit(lambda xx: dogleg_solve(
            residual, xx,
            DoglegOptions(maxiter=opts.maxiter, e_3=opts.e_3, delta_0=0.5),
            param_mask=jnp.asarray(pmask)))(x0)
        betas, latents, poses, trans, ex_new = lay.split(res.x)
        if ne:
            exprs = ex_new

    return _stagei_outputs(ctx, latent_labels, betas, latents, poses, trans,
                           exprs)


def mosh_stagei_solve_batched(model: SurfaceModel,
                              frames_obs: np.ndarray,
                              frames_mask: np.ndarray,
                              latent_labels: List[str],
                              layout_vids: np.ndarray,
                              m2b: np.ndarray,
                              type_masks: Dict[str, np.ndarray],
                              opts: StageIOptions = StageIOptions(),
                              prior: Optional[MaxMixturePrior] = None,
                              betas_init: Optional[np.ndarray] = None,
                              exclude_vertex_mask: Optional[np.ndarray] = None,
                              ) -> List[StageIResult]:
    """Stage-i over a BATCH of subjects sharing one marker layout.

    Stage-i jobs are independent in the reference (one process per subject,
    dedup'd by `universal_mosh_jobs_filter`, run_tools.py:45-67); on TPU the
    subject axis is a batch axis: every annealing step freezes each
    subject's discrete structure on the host (unions padded to a common
    size), stacks them into one `_StageIFrozen` pytree, and solves all
    packed systems in ONE batched dogleg (`batched_dogleg_solve`) — the chip
    amortizes compile and fills the underutilized lanes of the
    single-subject solve.

    Args:
      frames_obs: (S, F, M, 3); frames_mask: (S, F, M). Subjects must share
        the layout (`layout_vids`/`m2b`/`type_masks`) and frame count — the
        normal fleet case (same capture protocol, different subjects).
    Returns one StageIResult per subject.
    """
    from moshpp_tpu.solver.gauss_newton import batched_dogleg_solve

    S = frames_obs.shape[0]
    pairs = [prepare_stagei_context(
        model, frames_obs[s], frames_mask[s], layout_vids, m2b, type_masks,
        opts=opts, prior=prior, betas_init=betas_init,
        exclude_vertex_mask=exclude_vertex_mask) for s in range(S)]
    ctxs = [p[0] for p in pairs]
    lay = ctxs[0].lay
    ne = lay.ne
    states = [list(p[1]) for p in pairs]   # per-subject [betas, latents, ...]

    annealing = tuple(opts.wt("annealing"))
    for tidx, anneal in enumerate(annealing):
        detailed = tidx > len(annealing) - 3
        fzs = [_freeze_stagei_structure(ctxs[s], states[s][0], states[s][1])
               for s in range(S)]
        u_can = max(int(fz.can_template.shape[0]) for fz in fzs)
        u_data = max(int(fz.sub_model.v_template.shape[0]) for fz in fzs)
        fzs = [_pad_frozen(fz, u_can, u_data) for fz in fzs]
        frozen = jax.tree.map(lambda *a: jnp.stack(a), *fzs)
        rf = _stagei_residual_fn(ctxs[0], anneal, detailed)
        pmask = _stagei_pmask(ctxs[0], detailed)
        x0 = jnp.stack([
            lay.pack(st[0], st[1], st[2], st[3], st[4] if ne else None)
            for st in states])
        res = jax.jit(lambda xx, fz: batched_dogleg_solve(
            rf, xx, fz,
            DoglegOptions(maxiter=opts.maxiter, e_3=opts.e_3, delta_0=0.5),
            param_mask=jnp.asarray(pmask)))(x0, frozen)
        for s in range(S):
            b, lat, ps, tr, ex_new = lay.split(res.x[s])
            states[s][:4] = [b, lat, ps, tr]
            if ne:
                states[s][4] = ex_new

    return [_stagei_outputs(ctxs[s], latent_labels, *states[s][:4],
                            states[s][4] if ne else None)
            for s in range(S)]


def _stagei_outputs(ctx: _StageICtx, latent_labels, betas, latents, poses,
                    trans, exprs) -> StageIResult:
    """Final stage-i outputs: nearest-vid snap (chmosh.py:422-431), full-mesh
    marker simulation, and the mean data residual."""
    model, lay, opts = ctx.model, ctx.lay, ctx.opts
    F, nb, ne = lay.F, lay.nb, lay.ne
    frames_obs, maskf = ctx.frames_obs, ctx.maskf
    errs: Dict[str, float] = {}
    can_v = _full_can_verts(model, betas)
    snap = np.asarray(nearest_vertex(latents, can_v))
    markers_latent_vids = {l: int(v) for l, v in zip(latent_labels, snap)}

    idx = select_frame_indices(can_v, latents, k=opts.knn_k,
                               exclude_mask=ctx.exclude_vertex_mask)
    coeffs = marker_coeffs(can_v, latents, idx)

    def sim_frame(pose_f, trans_f, ex_f):
        if ne:
            es = min(opts.expr_start, model.num_shape_dirs - ne)
            fb = jnp.zeros(es + ne, betas.dtype).at[:nb].set(betas).at[es:].set(ex_f)
        else:
            fb = betas
        verts = lbs_forward(model, pose_f, fb, trans_f)
        return reconstruct_markers(verts, idx, coeffs)

    sims = jax.vmap(sim_frame)(poses, trans,
                               exprs if ne else jnp.zeros((F, 0)))
    err = np.asarray(jnp.sqrt(jnp.sum((sims - frames_obs) ** 2, -1)) * maskf)
    errs["data_mean_m"] = float(err.sum() / max(np.asarray(maskf).sum(), 1))

    return StageIResult(
        betas=np.asarray(betas),
        markers_latent=np.asarray(latents),
        latent_labels=list(latent_labels),
        markers_latent_vids=markers_latent_vids,
        poses=np.asarray(poses),
        trans=np.asarray(trans),
        exprs=np.asarray(exprs) if ne else None,
        errs=errs,
        markers_sim=np.asarray(sims),
    )
