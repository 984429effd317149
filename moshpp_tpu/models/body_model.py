"""SMPL-family articulated body models as pure JAX functions.

Covers the same model families as the reference MoSh++
(`/root/reference/src/moshpp/models/smpl_fast_derivatives.py:52-263`):
SMPL, SMPL+H, SMPL-X, MANO, SMAL horse/dog — one parameter pytree + one
jittable forward.

Design deltas from the reference (which wraps chumpy `verts_decorated` plus
C++ analytic LBS Jacobians):

* The whole chain — shape blendshapes, joint regression, rodrigues FK over the
  kinematic tree, pose blendshapes, linear blend skinning — is a single traced
  function; derivatives come from `jax.jacfwd`, so the reference's
  `lbs_derivatives_wrt_pose/shape` C++ kernels disappear into XLA.
* Joint locations are regressed from precomputed `joint_template` /
  `joint_shapedirs` (J_regressor folded into the template and shape dirs at
  load time), so a *vertex-subset* forward — all MoSh residuals only ever need
  the posed body at O(markers) vertices — never touches the full 6890/10475
  vertex set.  This is what makes the vmapped per-frame solves MXU-tiny.
* The hand-PCA pose subspace of SMPL+H / SMPL-X / MANO
  (reference `smpl_fast_derivatives.py:80-124,194-202`) is a static matmul in
  `fullpose_from_pose`.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.ops.rodrigues import rodrigues


@dataclasses.dataclass(frozen=True)
class ModelTypeInfo:
    """Static per-model-family metadata.

    Pose-vector layout mirrors the reference's slicing tables
    (`chmosh.py:274-309`, `run_tools.py:70-85`).
    """

    num_joints: int
    body_pose_dof: int        # root + articulated body dof in the *pose* vector
    has_hands: bool = False   # hand-PCA tail in the pose vector
    num_hands: int = 0
    face_pose_ids: Tuple[int, int] = (0, 0)   # jaw slice within pose vector
    toes_pose_ids: Tuple[int, int] = (0, 0)   # pose ids frozen unless optimize_toes


MODEL_TYPE_INFO = {
    # rigid 6-DoF object = 1-joint body (root rotation + translation)
    "object": ModelTypeInfo(num_joints=1, body_pose_dof=3),
    "smpl": ModelTypeInfo(num_joints=24, body_pose_dof=72, toes_pose_ids=(30, 36)),
    "smplh": ModelTypeInfo(num_joints=52, body_pose_dof=66, has_hands=True,
                           num_hands=2, toes_pose_ids=(30, 36)),
    "smplx": ModelTypeInfo(num_joints=55, body_pose_dof=75, has_hands=True,
                           num_hands=2, face_pose_ids=(66, 69), toes_pose_ids=(30, 36)),
    "mano": ModelTypeInfo(num_joints=16, body_pose_dof=3, has_hands=True, num_hands=1),
    "animal_horse": ModelTypeInfo(num_joints=36, body_pose_dof=108),
    "animal_dog": ModelTypeInfo(num_joints=35, body_pose_dof=105),
}


def _static_field(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceModel:
    """One SMPL-family model instance as a pytree of device arrays.

    Array fields are pytree leaves; `model_type`, `parents` and the dof
    integers are static (hashable) aux data so jit re-traces only when the
    model family/topology changes.
    """

    # geometry / blendshapes (possibly gathered to a vertex subset)
    v_template: jnp.ndarray          # (V, 3)
    shapedirs: jnp.ndarray           # (V, 3, B)
    posedirs: jnp.ndarray            # (V, 3, 9*(J-1))
    weights: jnp.ndarray             # (V, J)
    # joint regression, folded through J_regressor at load time (full-mesh)
    joint_template: jnp.ndarray      # (J, 3)
    joint_shapedirs: jnp.ndarray     # (J, 3, B)
    # hand PCA subspace (zero-size arrays when unused)
    hands_components: jnp.ndarray    # (Hdof, 45*num_hands)
    hands_mean: jnp.ndarray          # (45*num_hands,)
    faces: jnp.ndarray               # (F, 3) int32 — full-mesh triangulation

    model_type: str = _static_field(default="smplh")
    parents: Tuple[int, ...] = _static_field(default=())
    num_betas: int = _static_field(default=16)       # leading betas used as shape
    dof_per_hand: int = _static_field(default=12)
    # max nonzero skinning weights per vertex (SMPL uses <= 4): when set,
    # skinning contracts only each vertex's top-k joints — k/J of the dense
    # cost in both the forward and its jacfwd tangents. 0 = dense.
    skin_k: int = _static_field(default=0)

    # -- derived static properties ------------------------------------------
    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def info(self) -> ModelTypeInfo:
        return MODEL_TYPE_INFO[self.model_type]

    @property
    def pose_dof(self) -> int:
        """Length of the optimization pose vector (body dof + PCA hand dof)."""
        info = self.info
        if info.has_hands:
            return info.body_pose_dof + self.dof_per_hand * info.num_hands
        return info.body_pose_dof

    @property
    def fullpose_dof(self) -> int:
        return 3 * self.num_joints

    @property
    def num_shape_dirs(self) -> int:
        return self.shapedirs.shape[-1]

    def subset(self, vids) -> "SurfaceModel":
        """Gather per-vertex rows to a vertex subset.

        Joint regression terms are already vertex-free, so the subsetted model
        produces *identical* joints/kinematics and posed positions for the
        retained vertices. `faces` is kept as-is (it indexes the full mesh and
        is only used by full-mesh consumers).
        """
        vids = np.asarray(vids)
        return dataclasses.replace(
            self,
            v_template=self.v_template[vids],
            shapedirs=self.shapedirs[vids],
            posedirs=self.posedirs[vids],
            weights=self.weights[vids],
        )


def pose_part_ids(model_type: str, optimize_toes: bool = False) -> dict:
    """Pose-vector index groups per model family.

    Mirrors the reference's free-variable selection tables
    (`chmosh.py:274-309` for stage-i, `:548-579` for stage-ii): `root` is the
    global orientation, `body` the articulated body joints (minus toes unless
    `optimize_toes`), `finger` the hand-PCA coefficients, `face` the jaw.
    """
    info = MODEL_TYPE_INFO[model_type]
    if info.has_hands:
        total = info.body_pose_dof  # fingers appended separately below
    else:
        total = info.body_pose_dof
    all_ids = list(range(total))
    parts = {"root": all_ids[:3], "body": [], "finger": [], "face": []}
    if model_type == "smpl":
        parts["body"] = all_ids[3:]
    elif model_type == "smplh":
        parts["body"] = all_ids[3:66]
    elif model_type == "smplx":
        parts["body"] = all_ids[3:66]
        parts["face"] = all_ids[66:69]  # jaw only; eyeball gaze is not observable
    elif model_type == "mano":
        pass
    elif model_type == "animal_horse":
        parts["body"] = all_ids[3:84]  # tail/mouth/ear disabled, chmosh.py:303
    elif model_type == "animal_dog":
        joint_ids = [1, 3, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                     20, 21, 22, 23, 24, 25, 26, 27, 28, 30, 31, 32, 33, 34]
        parts["body"] = sorted(np.arange(105).reshape(-1, 3)[joint_ids].reshape(-1).tolist())
    if info.has_hands:
        # finger ids live after body dof; their count depends on dof_per_hand,
        # so callers slice pose[info.body_pose_dof:] directly
        parts["finger_start"] = info.body_pose_dof
    if not optimize_toes and parts["body"]:
        lo, hi = info.toes_pose_ids
        toes = set(range(lo, hi))
        parts["body"] = [i for i in parts["body"] if i not in toes]
    return parts


def effective_weights(model: SurfaceModel) -> jnp.ndarray:
    """The dense (V, J) skinning weights `lbs_forward` actually applies:
    top-`skin_k` support per vertex when `skin_k` is set, else the raw
    weights. Constant per model — XLA folds/hoists it out of solver loops."""
    if 0 < model.skin_k < model.num_joints:
        w_k, j_k = jax.lax.top_k(model.weights, model.skin_k)
        V = model.weights.shape[0]
        rows = jnp.arange(V, dtype=j_k.dtype)[:, None]
        return jnp.zeros_like(model.weights).at[rows, j_k].set(w_k)
    return model.weights


def fullpose_from_pose(model: SurfaceModel, pose: jnp.ndarray) -> jnp.ndarray:
    """Expand the optimization pose vector into per-joint axis-angles.

    For SMPL+H / SMPL-X / MANO the hand tail of `pose` holds PCA coefficients:
    fullpose = [pose[:body_dof], hands_mean + coeffs @ hands_components]
    (reference `smpl_fast_derivatives.py:200-202`). For other families the
    pose vector *is* the fullpose.
    """
    info = model.info
    if not info.has_hands:
        return pose
    body = pose[..., : info.body_pose_dof]
    coeffs = pose[..., info.body_pose_dof:]
    hands = model.hands_mean + coeffs @ model.hands_components
    return jnp.concatenate([body, hands], axis=-1)



@functools.lru_cache(maxsize=None)
def _tree_levels(parents: Tuple[int, ...]):
    """Group joints by depth. Returns a tuple of (joint_ids, parent_ids)
    numpy arrays per level (level 0 = root(s))."""
    J = len(parents)
    depth = [0] * J
    for k in range(1, J):
        depth[k] = depth[parents[k]] + 1
    levels = []
    for d in range(max(depth) + 1):
        ids = np.array([k for k in range(J) if depth[k] == d], np.int32)
        pids = np.array([max(parents[k], 0) for k in ids.tolist()], np.int32)
        levels.append((ids, pids))
    return tuple(levels)


@functools.lru_cache(maxsize=None)
def _ancestor_matrix(parents: Tuple[int, ...]) -> np.ndarray:
    """(J, J) float mask: anc[k, j] = 1 iff j is on the root->k path
    (including k itself)."""
    J = len(parents)
    anc = np.zeros((J, J), np.float32)
    for k in range(J):
        j = k
        while j >= 0:
            anc[k, j] = 1.0
            j = parents[j]
    return anc


def _rel_trans(joints, parents):
    if len(parents) > 1:
        par = jnp.asarray(parents[1:], dtype=jnp.int32)
        return jnp.concatenate([joints[:1], joints[1:] - joints[par]])
    return joints


def _bmm(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched tiny-matrix product (…,a,b)x(…,b,c) via multiply-sum.

    Deliberately NOT an einsum/dot_general: XLA's algebraic simplifier
    mis-folds multi-batch-dim dots produced by stacked vmaps over the FK
    chain (hlo-verifier "Expected instruction to have shape ..." crash after
    simplification, observed with subject-vmapped jacfwd in batched
    stage-i), and 3x3/4x4 contractions never profit from the MXU anyway.
    """
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _bmm_t(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched tiny-matrix product against Bᵀ: (…,a,b)x(…,c,b) -> (…,a,c)."""
    return jnp.sum(A[..., :, None, :] * B[..., None, :, :], axis=-1)


def _bmv(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched tiny matrix-vector product (…,a,b)x(…,b) via multiply-sum."""
    return jnp.sum(A * v[..., None, :], axis=-1)


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def _fk_g(joints: jnp.ndarray, rotmats: jnp.ndarray,
          parents: Tuple[int, ...]) -> jnp.ndarray:
    """Global joint transforms G (J, 4, 4) over the kinematic tree.

    Primal: scatter-free level composition (BFS-ordered gathers + concats,
    tree-depth sequential steps). Tangent (custom JVP): the analytic form
        dG_k = (sum_{j in path(k)} W_j) G_k,
        W_j = G_p(j) (dL_j L_j^-1) G_p(j)^-1
    where the ancestor sum is ONE dense (J x J) contraction — so under
    jacfwd's O(100)-wide tangent batch there is no sequential tree walk at
    all, only batched 4x4 matmuls and an MXU matmul. This is the TPU-native
    replacement for the reference's C++ analytic LBS pose Jacobians
    (smpl_fast_derivatives.py:255-261).
    """
    J = len(parents)
    rel_trans = _rel_trans(joints, parents)

    bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]], rotmats.dtype),
                      (J, 1, 1))
    local = jnp.concatenate(
        [jnp.concatenate([rotmats, rel_trans[:, :, None]], axis=2), bottom],
        axis=1)

    # level composition: the primal runs once per frame (no tangent batch),
    # tree-depth scatter/gather steps are cheap here; all the jacfwd traffic
    # goes through the analytic JVP below instead
    G = local
    for ids, pids in _tree_levels(parents)[1:]:
        composed = _bmm(G[jnp.asarray(pids)], local[jnp.asarray(ids)])
        G = G.at[jnp.asarray(ids)].set(composed)
    return G


@_fk_g.defjvp
def _fk_g_jvp(parents, primals, tangents):
    joints, rotmats = primals
    dj, dR = tangents
    J = len(parents)
    G = _fk_g(joints, rotmats, parents)

    t_rel = _rel_trans(joints, parents)
    dt_rel = _rel_trans(dj, parents)

    # M_j = dL_j @ L_j^-1 = [dR R^T | dt - dR R^T t ; 0 0]
    dRRt = _bmm_t(dR, rotmats)
    u = dt_rel - _bmv(dRRt, t_rel)

    # parent transforms (root parent = identity)
    pidx = jnp.asarray([max(p, 0) for p in parents], jnp.int32)
    root_mask = jnp.asarray([1.0 if p < 0 else 0.0 for p in parents],
                            rotmats.dtype)[:, None, None]
    eye4 = jnp.eye(4, dtype=rotmats.dtype)
    Gp = root_mask * eye4 + (1.0 - root_mask) * G[pidx]
    Q = Gp[:, :3, :3]
    b = Gp[:, :3, 3]

    # W_j = Gp [dRRt | u; 0] Gp^-1, with Gp^-1 = [Q^T | -Q^T b; 0 1]:
    #   W_rot = Q dRRt Q^T
    #   W_trans = -W_rot b + Q u
    W_rot = _bmm_t(_bmm(Q, dRRt), Q)
    W_tr = -_bmv(W_rot, b) + _bmv(Q, u)

    # cumulative generators over ancestor paths: one dense (J, J) contraction
    anc = jnp.asarray(_ancestor_matrix(parents))
    C_rot = jnp.einsum("kj,jab->kab", anc, W_rot)
    C_tr = jnp.einsum("kj,ja->ka", anc, W_tr)

    # dG_k = C_k G_k  (C is [C_rot | C_tr; 0 0])
    dG_rot = _bmm(C_rot, G[:, :3, :3])
    dG_tr = _bmv(C_rot, G[:, :3, 3]) + C_tr
    zeros_row = jnp.zeros((J, 1, 4), rotmats.dtype)
    dG = jnp.concatenate(
        [jnp.concatenate([dG_rot, dG_tr[:, :, None]], axis=2), zeros_row],
        axis=1)
    return G, dG


def forward_kinematics(joints: jnp.ndarray, rotmats: jnp.ndarray,
                       parents: Tuple[int, ...]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid FK over the kinematic tree (see `_fk_g` for the fast-tangent
    core).

    Args:
      joints: (J, 3) rest-pose joint locations.
      rotmats: (J, 3, 3) per-joint local rotations.
      parents: static parent index per joint (parents[0] is the root, -1).

    Returns:
      (A, joints_posed): A is (J, 4, 4) — skinning transforms relative to the
      rest pose (translation already reduced by G_k @ j_k), joints_posed is
      (J, 3) posed joint locations.
    """
    G = _fk_g(joints, rotmats, parents)
    joints_posed = G[:, :3, 3]
    # A_k = G_k with translation column reduced by G_k[:3,:3] @ j_k (rest joint)
    corr = jnp.einsum("jab,jb->ja", G[:, :3, :3], joints)
    A = G.at[:, :3, 3].add(-corr)
    return A, joints_posed


@jax.custom_jvp
def _pose_blend(posedirs: jnp.ndarray, fullpose: jnp.ndarray) -> jnp.ndarray:
    """Pose-corrective offsets: posedirs . vec(R(fullpose)[1:] - I).

    posedirs: (V, 3, 9*(J-1)); fullpose: (3J,). Returns (V, 3).

    The custom JVP chains tangents through the analytic 9x3 per-joint
    rotation derivative: jacfwd of the naive composition pushes a dense
    9(J-1)-vector through the posedirs contraction per tangent direction
    (the dominant Jacobian cost in the solver); here the tangent contraction
    is 3(J-1)-wide, with the theta-dependent factor hoisted out of the
    tangent batch. NOTE: posedirs is treated as a constant — its tangent is
    ignored (model parameters are never optimization variables here).
    """
    rot = rodrigues(fullpose.reshape(-1, 3))
    eye = jnp.eye(3, dtype=rot.dtype)
    feat = (rot[1:] - eye).reshape(-1)
    return jnp.einsum("vcp,p->vc", posedirs, feat)


@_pose_blend.defjvp
def _pose_blend_jvp(primals, tangents):
    posedirs, fullpose = primals
    _, dfull = tangents
    theta = fullpose.reshape(-1, 3)
    J = theta.shape[0]
    out = _pose_blend(posedirs, fullpose)
    if posedirs.shape[-1] == 0 or J <= 1:
        return out, jnp.zeros_like(out)
    # dR/dtheta per joint: (J, 3, 3, 3) — primal-only, hoisted across the
    # jacfwd tangent batch
    dR = jax.vmap(jax.jacfwd(rodrigues))(theta)
    pd5 = posedirs.reshape(posedirs.shape[0], 3, J - 1, 3, 3)
    G = jnp.einsum("vcjab,jabt->vcjt", pd5, dR[1:])
    dout = jnp.einsum("vcjt,jt->vc", G, dfull.reshape(-1, 3)[1:])
    return out, dout


def lbs_forward(model: SurfaceModel,
                pose: jnp.ndarray,
                betas: jnp.ndarray,
                trans: jnp.ndarray,
                want_joints: bool = False):
    """Posed vertex positions for one frame.

    verts = LBS(v_template + shapedirs·betas + posedirs·(R(fullpose)-I)) + trans

    Matches the semantics of the reference's `verts_decorated` chumpy graph
    (`smpl_fast_derivatives.py:206-218`). Works on subsetted models (see
    `SurfaceModel.subset`). Batch over frames with `jax.vmap`.

    Args:
      pose: (pose_dof,) optimization pose vector (PCA hand tail for h/x/mano).
      betas: (B',) B' <= model.num_shape_dirs shape (+expression/dmpl) coeffs.
      trans: (3,) global translation applied after skinning.
    """
    # millimeter-accuracy geometry demands f32-grade contractions: TPU
    # matmuls default to single-pass bf16 inputs (~0.4% relative =
    # millimeters on body-scale coordinates). Three-pass ('high') splits f32
    # into bf16 triples — ~f32 rounding at half the cost of 'highest'.
    with jax.default_matmul_precision("high"):
        nb = betas.shape[-1]
        fullpose = fullpose_from_pose(model, pose)
        rotmats = rodrigues(fullpose.reshape(-1, 3))  # (J, 3, 3)

        v_shaped = model.v_template + jnp.einsum(
            "vcb,b->vc", model.shapedirs[..., :nb], betas)
        joints = model.joint_template + jnp.einsum(
            "jcb,b->jc", model.joint_shapedirs[..., :nb], betas)

        # pose blendshapes with a cheap-tangent custom JVP
        if model.posedirs.shape[-1]:
            v_posed = v_shaped + _pose_blend(model.posedirs, fullpose)
        else:
            v_posed = v_shaped

        A, joints_posed = forward_kinematics(joints, rotmats, model.parents)

        # skinning: per-vertex blended transform applied to homogeneous v_posed
        if 0 < model.skin_k < model.num_joints:
            # sparse contraction over each vertex's top-k joints; the top-k of
            # the constant weight matrix is folded at compile time
            w_k, j_k = jax.lax.top_k(model.weights, model.skin_k)  # (V, k)
            T = jnp.einsum("vk,vkab->vab", w_k, A[j_k])
        else:
            T = jnp.einsum("vj,jab->vab", model.weights, A)       # (V, 4, 4)
        verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3] + trans
    if want_joints:
        return verts, joints_posed + trans
    return verts
