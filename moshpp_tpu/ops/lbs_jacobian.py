"""Closed-form LBS/marker Jacobians for the frozen-shape (stage-ii) solve.

This is the TPU-native replacement for the reference's C++ analytic LBS
derivative kernels (`/root/reference/src/moshpp/models/smpl_fast_derivatives.py:246-263`
routing to `psbody.smpl.fast_derivatives.smplcpp_chumpy`): the full Jacobian
of simulated marker positions w.r.t. (trans, pose) assembled as a handful of
batched einsums — no forward-mode tangent batch, no per-tangent (J, 4, 4)
transform tensors.

Why not `jax.jacfwd` on the forward? Under jacfwd the FK/skinning chain
materializes O(tangents x joints) 4x4 tensors per frame; trailing dims of 4
tile onto the TPU's (8, 128) vector registers at a fraction of occupancy, so
the Jacobian becomes HBM-bound (~50 ms/iter at F=1024 measured on v5e).
The closed form below exploits what the chain rule actually looks like:

  G_k(theta)     global joint transforms over the kinematic tree
  dG_k/dtheta_j  = W_j G_k  for j on the root->k path, with the generator
  W_j            = G_p(j) (dL_j L_j^-1) G_p(j)^-1  depending on j alone.

For a skinned vertex v (A_k = G_k with rest-joint translation folded,
vtilde = homogeneous v_posed):

  d(verts_v)/dtheta_{j,t} = sum_k w_vk [ Wrot_{j,t} z_vk + Wtr_{j,t} ]
                          + T_v d(v_posed_v)/dtheta_{j,t}
  with  z_vk = A_k vtilde_v   (posed position of v under joint k's transform)

so defining S_vj = sum_k w_vk anc_kj z_vk and s_vj = sum_k w_vk anc_kj, the
whole pose Jacobian is

  J[v, :, (j,t)] = Wrot_{j,t} S_vj + s_vj Wtr_{j,t}  (+ pose-blend chain),

three dense contractions over (V, J) — MXU work on O(V·J) tensors, computed
once per Gauss-Newton iteration. Betas are treated as frozen (stage-ii
semantics, chmosh.py:502-514); d/d trans is the identity.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from moshpp_tpu.models.body_model import (SurfaceModel, _ancestor_matrix,
                                          _fk_g, _rel_trans,
                                          effective_weights,
                                          fullpose_from_pose)
from moshpp_tpu.ops.marker_transform import MarkerFrameIndices, _frames
from moshpp_tpu.ops.rodrigues import rodrigues


class VertsAndJacobian(NamedTuple):
    verts: jnp.ndarray   # (V, 3) posed vertices
    jac: jnp.ndarray     # (V, 3, 3 + pose_dof) d verts / d (trans, pose)


def _rodrigues_with_grad(theta: jnp.ndarray):
    """(J, 3) axis-angles -> (R (J, 3, 3), dR (J, 3, 3, 3)); dR[j, :, :, t] =
    dR_j/dtheta_{j,t}. Primal-only (no tangent batch)."""
    R = rodrigues(theta)
    dR = jax.vmap(jax.jacfwd(rodrigues))(theta)
    return R, dR


def lbs_verts_and_jacobian(model: SurfaceModel,
                           pose: jnp.ndarray,
                           betas: jnp.ndarray,
                           trans: jnp.ndarray) -> VertsAndJacobian:
    """Posed vertices and their full (trans, pose) Jacobian for one frame.

    Exactly matches `lbs_forward(model, pose, betas, trans)` (same skinning
    support via `effective_weights`, same precision context) — validated
    against `jax.jacfwd` in tests/test_jacobians.py. Betas are constants.
    """
    parents = model.parents
    J = model.num_joints
    info = model.info

    with jax.default_matmul_precision("high"):
        nb = betas.shape[-1]
        fullpose = fullpose_from_pose(model, pose)
        theta = fullpose.reshape(J, 3)
        R, dR = _rodrigues_with_grad(theta)

        v_shaped = model.v_template + jnp.einsum(
            "vcb,b->vc", model.shapedirs[..., :nb], betas)
        joints = model.joint_template + jnp.einsum(
            "jcb,b->jc", model.joint_shapedirs[..., :nb], betas)

        # pose blendshapes (primal) + their theta-derivative
        V = model.v_template.shape[0]
        if model.posedirs.shape[-1]:
            eye3 = jnp.eye(3, dtype=R.dtype)
            feat = (R[1:] - eye3).reshape(-1)
            v_posed = v_shaped + jnp.einsum("vcp,p->vc", model.posedirs, feat)
            pd5 = model.posedirs.reshape(V, 3, J - 1, 3, 3)
            # d v_posed / d theta_{j,t}; joint 0 contributes nothing
            dvp = jnp.einsum("vcjab,jabt->vcjt", pd5, dR[1:])
            dvp = jnp.concatenate(
                [jnp.zeros((V, 3, 1, 3), dvp.dtype), dvp], axis=2)
        else:
            v_posed = v_shaped
            dvp = None

        # FK primal
        G = _fk_g(joints, R, parents)
        corr = jnp.einsum("jab,jb->ja", G[:, :3, :3], joints)
        A_rot = G[:, :3, :3]                       # (J, 3, 3)
        A_tr = G[:, :3, 3] - corr                  # (J, 3)

        w = effective_weights(model)               # (V, J)
        T_rot = jnp.einsum("vj,jab->vab", w, A_rot)
        T_tr = jnp.einsum("vj,ja->va", w, A_tr)
        verts = jnp.einsum("vab,vb->va", T_rot, v_posed) + T_tr + trans

        # ---- pose Jacobian --------------------------------------------------
        # per-joint generators W_{j,t} from the local-rotation derivative
        t_rel = _rel_trans(joints, parents)
        pidx = jnp.asarray([max(p, 0) for p in parents], jnp.int32)
        root = jnp.asarray([1.0 if p < 0 else 0.0 for p in parents],
                           R.dtype)[:, None, None]
        eye4 = jnp.eye(4, dtype=R.dtype)
        Gp = root * eye4 + (1.0 - root) * G[pidx]
        Q = Gp[:, :3, :3]
        b = Gp[:, :3, 3]

        dRRt = jnp.einsum("jabt,jcb->jact", dR, R)             # (J,3,3,3)
        u = -jnp.einsum("jabt,jb->jat", dRRt, t_rel)           # (J,3,3)
        W_rot = jnp.einsum("jab,jbct,jdc->jadt", Q, dRRt, Q)   # (J,3,3,3)
        W_tr = (-jnp.einsum("jabt,jb->jat", W_rot, b)
                + jnp.einsum("jab,jbt->jat", Q, u))            # (J,3,3)

        # skinning-weighted posed positions, accumulated over ancestor paths
        z = jnp.einsum("kab,vb->vka", A_rot, v_posed) + A_tr[None, :, :]
        anc = jnp.asarray(_ancestor_matrix(parents))           # (K, J)
        S = jnp.einsum("vka,kj->vja", w[:, :, None] * z, anc)  # (V,J,3)
        s = w @ anc                                            # (V,J)

        Jfk = (jnp.einsum("jabt,vjb->vajt", W_rot, S)
               + jnp.einsum("vj,jat->vajt", s, W_tr))          # (V,3,J,3)
        if dvp is not None:
            Jfk = Jfk + jnp.einsum("vab,vbjt->vajt", T_rot, dvp)
        Jfull = Jfk.reshape(V, 3, 3 * J)

        # chain fullpose -> optimization pose vector (hand-PCA tail)
        if info.has_hands:
            bd = info.body_pose_dof
            Jhand = jnp.einsum("vcH,hH->vch", Jfull[:, :, bd:],
                               model.hands_components)
            Jpose = jnp.concatenate([Jfull[:, :, :bd], Jhand], axis=2)
        else:
            Jpose = Jfull

        # trans columns: identity per vertex
        Jtrans = jnp.broadcast_to(jnp.eye(3, dtype=Jpose.dtype)[None],
                                  (V, 3, 3))
        jac = jnp.concatenate([Jtrans, Jpose], axis=2)
    return VertsAndJacobian(verts=verts, jac=jac)


def _reconstruct_one(tri: jnp.ndarray, cf: jnp.ndarray) -> jnp.ndarray:
    """Marker from its frame-vertex triple (3, 3) and coefficients (3,).
    Mirrors `reconstruct_markers` for a single marker."""
    v0 = tri[0]
    e1 = tri[1] - v0
    e2 = tri[2] - v0
    f1 = e1 / jnp.sqrt(jnp.sum(e1 * e1) + 1e-12)
    c = jnp.cross(e1, e2)
    f2 = c / jnp.sqrt(jnp.sum(c * c) + 1e-12)
    f3 = jnp.cross(f1, f2)
    return v0 + cf[0] * f1 + cf[1] * f2 + cf[2] * f3


def markers_and_jacobian(verts: jnp.ndarray,
                         jac_verts: jnp.ndarray,
                         idx: MarkerFrameIndices,
                         coeffs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Simulated markers (M, 3) and d markers / d x (M, 3, D) from posed
    vertices and their parameter Jacobian (V, 3, D).

    The local-frame reconstruction (TransformedLms, transformed_lm.py:120-162)
    touches only each marker's 3 frame vertices, so its own Jacobian is a tiny
    (3x9) block computed by forward mode over the 9 coordinates, then chained
    into the vertex Jacobian with one einsum.
    """
    v0, f1, f2, f3 = _frames(verts, idx)
    sim = v0 + coeffs[:, 0:1] * f1 + coeffs[:, 1:2] * f2 + coeffs[:, 2:3] * f3

    tri = jnp.stack([verts[idx.c0], verts[idx.c1], verts[idx.c2]], axis=1)
    Jrec = jax.vmap(jax.jacfwd(_reconstruct_one))(tri, coeffs)  # (M,3,3,3)
    Jtri = jnp.stack([jac_verts[idx.c0], jac_verts[idx.c1],
                      jac_verts[idx.c2]], axis=1)               # (M,3,3,D)
    with jax.default_matmul_precision("high"):
        Jm = jnp.einsum("mcvd,mvdp->mcp", Jrec, Jtri)
    return sim, Jm
