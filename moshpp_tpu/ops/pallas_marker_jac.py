"""Fused Pallas TPU kernel: simulated markers + exact (trans, pose) Jacobian.

This is the speed-of-light path for the stage-ii Gauss-Newton system — the
TPU-native replacement for the reference's C++ analytic LBS derivative kernels
(`/root/reference/src/moshpp/models/smpl_fast_derivatives.py:246-263`).

Why a kernel at all: the same math as `ops/lbs_jacobian.py` expressed as XLA
einsums is memory-layout-bound, not FLOP-bound — every intermediate carries
trailing dims of 3/4/9 that tile onto the TPU's (8, 128) vector registers at a
few percent occupancy, so a ~8 MFLOP/frame computation costs ~95 ms at F=4096
on v5e (~25 us/frame). Here the whole chain runs with **frames in the lane
dimension**: every per-joint quantity is a (J, 128-frames) tile, every
contraction over tiny structure dims (3x3 rotations, 52 joints, 9 blend
features) is an unrolled sequence of full-width VPU FMAs or a small MXU dot,
and *no intermediate ever touches HBM*.

Pipeline per frame-block (all in VMEM / registers):

  theta (3, J, F-blk)                                 [only XLA-side prep:
    -> quaternion rodrigues R + hand-derived dR        fullpose hand-PCA GEMM
    -> FK over tree levels; parent gathers are         + transpose]
       one-hot (J, J) matmuls (no scatters/gathers)
    -> skinning transforms A, path generators W = Gp (dL L^-1) Gp^-1
    -> pose-blend features(R)
  per marker (x3 frame vertices):
    -> v_posed = v_shaped + posedirs . feat            (MXU dot)
    -> S_vj = sum_k w_vk anc_kj (A_k v_posed)          (MXU dot over ancestors)
    -> J_fk = W_rot S + s W_tr + T_rot dvp             (unrolled VPU FMAs)
    -> hand-PCA chain                                  (MXU dot)
    -> local-frame reconstruction + hand-derived
       d(marker)/d(frame verts) 3x3 blocks
    -> J_marker rows + simulated marker positions

The math mirrors `ops/lbs_jacobian.py:65-195` exactly (same generator
formulation, same eps guards) and is cross-validated against it in
tests/test_pallas_jac.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshpp_tpu.models.body_model import (SurfaceModel, _ancestor_matrix,
                                          effective_weights)
from moshpp_tpu.ops.marker_transform import MarkerFrameIndices

_EPS = 1e-12          # matches ops/rodrigues._EPS and marker_transform._EPS
BF = 128              # frame block = one full lane tile

# A/B lever for the extras Jacobian: fuse the 3E per-(e, b) weighted (J, BF)
# reductions into one (3E, J, BF) sublane reduce per vertex. Numerically
# identical (same per-slice reduction order); perf effect on Mosaic is
# motion-independent but unmeasured, so it ships default-off until a TPU
# A/B proves it (STATUS.md "Gaps").
import os as _os

# Default ON since the round-4 TPU A/B (tools/bench_variants.py): fusing the
# 3E per-(e,b) extras reductions into one (3E, J, BF) sublane reduce measured
# +11% on smplx+10expr (3,745 -> 4,168 fps, identical 0.3977 mm) and lifted
# smplh+8dmpl to 92% of body-only (4,520.5 fps); numerics pinned identical in
# interpret mode (tests/test_pallas_jac.py). Opt out with =0 for A/Bs.
FUSED_EXTRA_REDUCE = _os.environ.get("MOSHPP_FUSED_EXTRA_REDUCE", "1") == "1"

# Widest extras (dmpl/expression) block the marker kernels unroll INLINE —
# each extra dim adds ~9 unrolled VPU row-ops per vertex plus a (3, J, BF)
# tangent stack, so past ~16 dims compile time and VMEM blow up. Wider
# configs (the reference's production smplx num_expressions=80,
# support_data/conf/moshpp_conf.yaml:30) run the TILED path instead: the
# extras tangent and the E Jacobian columns stream in EXTRA_CHUNK-wide
# grid steps, so E is unbounded at O(E) cost with O(EXTRA_CHUNK) unroll.
INLINE_MAX_EXTRAS = 16
EXTRA_CHUNK = 8


def _tree_level_masks(parents: Tuple[int, ...]) -> np.ndarray:
    """(L, J) 0/1 masks of joints at depth 1..L (root depth-0 excluded)."""
    J = len(parents)
    depth = [0] * J
    for k in range(1, J):
        depth[k] = depth[parents[k]] + 1
    L = max(depth)
    masks = np.zeros((L, J), np.float32)
    for k in range(J):
        if depth[k] > 0:
            masks[depth[k] - 1, k] = 1.0
    return masks


def _parent_onehot(parents: Tuple[int, ...]) -> np.ndarray:
    """(J, J) P with row j = e_parent(j) (root row zero)."""
    J = len(parents)
    P = np.zeros((J, J), np.float32)
    for j, p in enumerate(parents):
        if p >= 0:
            P[j, p] = 1.0
    return P


class MarkerJacTables(NamedTuple):
    """Problem-frozen tables for the fused kernels, as device arrays.

    A plain pytree: jitted solver programs take it as an argument, so one
    compiled program serves every subject with the same (model family, M)
    shapes. Build with `prepare_marker_jac_tables`.
    """
    lvl: jnp.ndarray        # (L, J) tree level masks
    par: jnp.ndarray        # (J, J) parent one-hot
    rootm: jnp.ndarray      # (J, 1) 1.0 on root rows
    jnts: jnp.ndarray       # (J, 3) shaped rest joints
    trel: jnp.ndarray       # (J, 3) parent-relative rest joints
    ancT: jnp.ndarray       # (J, J) ancestor mask transposed
    hc: jnp.ndarray         # (HD, 45*nh) hand PCA components (or (1,1))
    wT: jnp.ndarray         # (J, M*128) banded skinning weight columns
    sT: jnp.ndarray         # (J, M*128) banded (w @ anc) columns
    vshT: jnp.ndarray       # (3, M*128) banded shaped rest positions
    pdrow: jnp.ndarray      # (M*16, 9(J-1)) banded posedirs rows
    pdJ: jnp.ndarray        # (J-1, M*128) banded posedirs columns
    cf: jnp.ndarray         # (M*8, 3) banded marker coefficients
    hands_mean: jnp.ndarray  # (45*nh,) or (0,)
    # extra (dmpl/expression) shape dims: E direction columns of shapedirs /
    # joint_shapedirs (chmosh.py:507-514 dmpl splice, 694-699 expressions).
    # Zero-width arrays when the problem has no extra dims.
    dtrelE: jnp.ndarray     # (J, 3E) parent-relative rest-joint directions
    djntE: jnp.ndarray      # (J, 3E) rest-joint directions
    dvE: jnp.ndarray        # (3E, M*128) banded vertex direction bands

    @property
    def n_extra(self) -> int:
        return self.djntE.shape[1] // 3


def _rodrigues_rows(t0, t1, t2):
    """Quaternion rodrigues on (J, BF) component tiles.

    Identical formula to ops/rodrigues.rodrigues (incl. the +_EPS guard).
    Returns R[a][b] (3x3 nested list of (J, BF)) plus the quaternion pieces
    needed by the hand derivative.
    """
    theta_sq = t0 * t0 + t1 * t1 + t2 * t2
    theta = jnp.sqrt(theta_sq + _EPS)
    half = 0.5 * theta
    w = jnp.cos(half)
    s = jnp.sin(half) / theta
    x, y, z = t0 * s, t1 * s, t2 * s

    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = [[1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)],
         [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)],
         [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)]]
    return R, (w, x, y, z, s, theta)


def _rodrigues_grad_rows(tvec, quat):
    """dR[t][a][b] (J, BF): hand derivative of `_rodrigues_rows`.

    Chain rule through q(v): dw/dv_t = -0.5 s v_t,
    dq_i/dv_t = delta_it s + v_i v_t (0.5 w - s)/theta^2.
    """
    w, x, y, z, s, theta = quat
    g = (0.5 * w - s) / (theta * theta)
    dR = []
    for t in range(3):
        vt = tvec[t]
        dw = -0.5 * s * vt
        dq = [g * tvec[i] * vt + (s if i == t else 0.0) for i in range(3)]
        dx, dy, dz = dq
        dxx, dyy, dzz = 2 * x * dx, 2 * y * dy, 2 * z * dz
        dxy = dx * y + x * dy
        dxz = dx * z + x * dz
        dyz = dy * z + y * dz
        dwx = dw * x + w * dx
        dwy = dw * y + w * dy
        dwz = dw * z + w * dz
        dR.append([
            [-2.0 * (dyy + dzz), 2.0 * (dxy - dwz), 2.0 * (dxz + dwy)],
            [2.0 * (dxy + dwz), -2.0 * (dxx + dzz), 2.0 * (dyz - dwx)],
            [2.0 * (dxz - dwy), 2.0 * (dyz + dwx), -2.0 * (dxx + dyy)]])
    return dR


def _dotc(a, b):
    """Small MXU matmul at full f32 precision."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _gather_rows(P, arrs):
    """Row gather of (J, BF) tiles expressed as one one-hot matmul.

    arrs: list of (J, BF); returns [P @ a for a in arrs] via a single
    (J, J) @ (J, n*BF) MXU dot (lane-concat trick).
    """
    cat = jnp.concatenate(arrs, axis=1)
    out = _dotc(P, cat)
    n = len(arrs)
    return [out[:, i * BF:(i + 1) * BF] for i in range(n)]


def _mat3mul(A, B):
    """3x3 matrix product on nested lists of (1, BF) rows."""
    return [[sum(A[a][k] * B[k][b] for k in range(3)) for b in range(3)]
            for a in range(3)]


def _skew(v):
    """[v]x as a nested list; v = (v0, v1, v2) of (1, BF)."""
    z = jnp.zeros_like(v[0])
    return [[z, -v[2], v[1]],
            [v[2], z, -v[0]],
            [-v[1], v[0], z]]


def _frame_rest_geometry(trel_ref, jnts_ref, dtrelE_ref, djntE_ref,
                         extra_ref, n_extra):
    """Rest-joint geometry, shifted per frame by the extra shape dims.

    Without extras, returns the constant (J, 1) coordinate columns (the
    compiled program is then identical to the extras-free kernel). With
    extras, trel/jnts become (J, BF) tiles:
        trel_f = trel + sum_e x_e * dtrel_e,  jnts_f likewise
    plus the raw (J, 3E) direction tables and the (1, BF) extra rows for the
    tangent-FK / Jacobian-column passes.
    """
    trel = [trel_ref[:, c:c + 1] for c in range(3)]            # (J, 1)
    jnts = [jnts_ref[:, c:c + 1] for c in range(3)]
    if not n_extra:
        return trel, jnts, None, None, None
    ex = [extra_ref[e:e + 1, :] for e in range(n_extra)]       # (1, BF)
    dtrelE = dtrelE_ref[:]                                     # (J, 3E)
    djntE = djntE_ref[:]
    trel_f = [trel[c] + sum(dtrelE[:, e * 3 + c:e * 3 + c + 1] * ex[e]
                            for e in range(n_extra)) for c in range(3)]
    jnts_f = [jnts[c] + sum(djntE[:, e * 3 + c:e * 3 + c + 1] * ex[e]
                            for e in range(n_extra)) for c in range(3)]
    return trel_f, jnts_f, dtrelE, djntE, ex


def _smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                 trel_ref, dtrelE_ref, djntE_ref, extra_ref, ancT_ref,
                 grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 datrE_ref, *, parents, has_pb, n_extra,
                 shift_ref=None, q_ref=None):
    """Per-frame-block FK pipeline: rodrigues + dR + tree FK + generators.

    Grid (nf,). All outputs are (k, J, BF) stacks with a static structure
    index leading and frames in lanes, consumed by `_marker_kernel`.

    With n_extra > 0 the FK runs on per-frame rest joints (extras shift both
    vertices and joints through joint_shapedirs) and dA_tr/dx_e stacks are
    emitted for the E extra Jacobian columns — in closed form after the FK
    (G_tr is linear in the rest offsets; one chain-mask matmul against the
    final parent rotations), not by carrying 3E tangent tiles through every
    level of the FK loop.
    """
    J = len(parents)
    L = lvl_ref.shape[0]

    th = [theta_ref[t] for t in range(3)]                      # (J, BF)
    R, quat = _rodrigues_rows(*th)
    dR = _rodrigues_grad_rows(th, quat)

    trel, jnts, dtrelE, djntE, _ = _frame_rest_geometry(
        trel_ref, jnts_ref, dtrelE_ref, djntE_ref, extra_ref, n_extra)
    if shift_ref is not None:
        # tiled-extras mode: per-frame rest-geometry shifts precomputed in
        # XLA (one (J*6, E) x (E, F) matmul) instead of unrolled over E
        trel = [trel[c] + shift_ref[c] for c in range(3)]
        jnts = [jnts[c] + shift_ref[3 + c] for c in range(3)]
    G_rot = [[R[a][b] for b in range(3)] for a in range(3)]
    G_tr = [jnp.broadcast_to(trel[a], th[0].shape) for a in range(3)]
    par = par_ref[:]
    for lev in range(L):
        flat = [G_rot[a][b] for a in range(3) for b in range(3)] + G_tr
        gp = _gather_rows(par, flat)
        gp_rot = [[gp[a * 3 + b] for b in range(3)] for a in range(3)]
        gp_tr = gp[9:12]
        m = lvl_ref[lev][:, None]                              # (J, 1)
        new_rot = [[sum(gp_rot[a][k] * R[k][b] for k in range(3))
                    for b in range(3)] for a in range(3)]
        new_tr = [sum(gp_rot[a][k] * trel[k] for k in range(3)) + gp_tr[a]
                  for a in range(3)]
        for a in range(3):
            for b in range(3):
                G_rot[a][b] = m * new_rot[a][b] + (1.0 - m) * G_rot[a][b]
            G_tr[a] = m * new_tr[a] + (1.0 - m) * G_tr[a]

    # skinning transforms: A_rot = G_rot, A_tr = G_tr - G_rot @ rest_joint
    A_tr = [G_tr[a] - sum(G_rot[a][b] * jnts[b] for b in range(3))
            for a in range(3)]

    # parent transforms for the generators (root parent = identity)
    flat = [G_rot[a][b] for a in range(3) for b in range(3)] + G_tr
    gp = _gather_rows(par, flat)
    rootm = rootm_ref[:]                                       # (J, 1)
    eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    Q = [[rootm * eye[a][b] + (1.0 - rootm) * gp[a * 3 + b]
          for b in range(3)] for a in range(3)]
    bb = [(1.0 - rootm) * gp[9 + a] for a in range(3)]
    if q_ref is not None:
        # tiled-extras mode: the chunked tangent kernel re-derives the
        # closed-form dA_tr/dx_e from Q + G_rot per extras chunk
        for a in range(3):
            for b in range(3):
                q_ref[a * 3 + b, :, :] = jnp.broadcast_to(
                    Q[a][b], (J, th[0].shape[-1]))

    if n_extra:
        # closed-form extras tangent: G_tr is LINEAR in the rest offsets, so
        # instead of carrying 3E tangent tiles through every FK level,
        #   dG_tr_e[j] = sum_{k in chain(j)} Gp_rot[k] . dtrel_e[k]
        # with Gp_rot = Q (parent global rotations, root = identity) — one
        # chain-mask matmul after the FK. anc[m, j] = ancT[j, m], so the
        # chain sum is a dim-0 contraction against the existing ancT table.
        Y = [sum(Q[a][b] * dtrelE[:, e * 3 + b:e * 3 + b + 1]
                 for b in range(3))
             for e in range(n_extra) for a in range(3)]        # (J, BF) each
        dcat = jax.lax.dot_general(
            ancT_ref[:], jnp.concatenate(Y, axis=1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (J, 3E*BF)
        # dA_tr/dx_e = dG_tr_e - G_rot @ djnt_e (A_rot: no extra dependence)
        for e in range(n_extra):
            for a in range(3):
                i = e * 3 + a
                datrE_ref[i, :, :] = (
                    dcat[:, i * BF:(i + 1) * BF]
                    - sum(G_rot[a][b] * djntE[:, e * 3 + b:e * 3 + b + 1]
                          for b in range(3)))

    # dRRt[a][c][t] = sum_b dR[t][a][b] R[c][b];  u = -dRRt @ t_rel
    dRRt = [[[sum(dR[t][a][b] * R[c][b] for b in range(3))
              for t in range(3)] for c in range(3)] for a in range(3)]
    u = [[-sum(dRRt[a][b][t] * trel[b] for b in range(3))
          for t in range(3)] for a in range(3)]
    # W_rot = Q dRRt Q^T, W_tr = -W_rot b + Q u
    tmp = [[[sum(Q[a][b] * dRRt[b][c][t] for b in range(3))
             for t in range(3)] for c in range(3)] for a in range(3)]
    W_rot = [[[sum(tmp[a][c][t] * Q[d][c] for c in range(3))
               for t in range(3)] for d in range(3)] for a in range(3)]
    W_tr = [[-sum(W_rot[a][b][t] * bb[b] for b in range(3))
             + sum(Q[a][b] * u[b][t] for b in range(3))
             for t in range(3)] for a in range(3)]

    for a in range(3):
        for b in range(3):
            grot_ref[a * 3 + b, :, :] = G_rot[a][b]
            for t in range(3):
                wrot_ref[(a * 3 + b) * 3 + t, :, :] = W_rot[a][b][t]
                dr_ref[(a * 3 + b) * 3 + t, :, :] = dR[t][a][b]
        atr_ref[a, :, :] = A_tr[a]
        for t in range(3):
            wtr_ref[a * 3 + t, :, :] = W_tr[a][t]

    if has_pb:
        feats = [R[a][b][1:, :] - (1.0 if a == b else 0.0)
                 for a in range(3) for b in range(3)]
        feat_ref[:, :] = jnp.stack(feats, axis=1).reshape((J - 1) * 9, BF)
    else:
        feat_ref[:, :] = jnp.zeros_like(feat_ref)


def _smalls_kernel(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                   trel_ref,
                   grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                   *, parents, has_pb):
    _smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref, trel_ref,
                 None, None, None, None,
                 grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 None, parents=parents, has_pb=has_pb, n_extra=0)


def _smalls_kernel_ext(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                       trel_ref, dtrelE_ref, djntE_ref, extra_ref, ancT_ref,
                       grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                       feat_ref, datrE_ref, *, parents, has_pb, n_extra):
    _smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref, trel_ref,
                 dtrelE_ref, djntE_ref, extra_ref, ancT_ref,
                 grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 datrE_ref, parents=parents, has_pb=has_pb, n_extra=n_extra)


def _smalls_kernel_tiled(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                         trel_ref, shift_ref,
                         grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                         feat_ref, q_ref, *, parents, has_pb):
    """Tiled-extras smalls: FK on precomputed shifted rest geometry + Q out.

    The E-dependence enters only through `shift_ref` (a (6, J, BF) block of
    XLA-precomputed trel/joint offsets), so this program's size is E-free;
    the extras tangent streams separately through `_extras_tangent_kernel`.
    """
    _smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref, trel_ref,
                 None, None, None, None,
                 grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 None, parents=parents, has_pb=has_pb, n_extra=0,
                 shift_ref=shift_ref, q_ref=q_ref)


def _extras_tangent_kernel(q_ref, grot_ref, dtrelE_ref, djntE_ref, ancT_ref,
                           datrE_ref, *, n_chunk):
    """One extras chunk of the closed-form tangent dA_tr/dx_e.

    Grid (nf, nec); per step emits the (3*EXTRA_CHUNK, J, BF) tangent stack
    for extras [ei*EC, (ei+1)*EC) from the FK outputs Q (parent global
    rotations) and G_rot. Same math as `_smalls_impl`'s inline n_extra block
    (G_tr linear in the rest offsets -> one chain-mask matmul), unrolled only
    EXTRA_CHUNK wide so E is unbounded.
    """
    Q = [[q_ref[a * 3 + b] for b in range(3)] for a in range(3)]
    G_rot = [[grot_ref[a * 3 + b] for b in range(3)] for a in range(3)]
    # chunk tables arrive chunk-major (1, J, 3*EC): Mosaic requires the
    # last-two block dims to be (8, 128)-divisible or full, and (J, 3*EC)
    # blocks of a (J, 3*E) array satisfy neither on real hardware
    dtrelE = dtrelE_ref[0]                                     # (J, 3*EC)
    djntE = djntE_ref[0]
    BFk = Q[0][0].shape[-1]
    Y = [sum(Q[a][b] * dtrelE[:, e * 3 + b:e * 3 + b + 1] for b in range(3))
         for e in range(n_chunk) for a in range(3)]            # (J, BF) each
    dcat = jax.lax.dot_general(
        ancT_ref[:], jnp.concatenate(Y, axis=1),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                   # (J, 3EC*BF)
    for e in range(n_chunk):
        for a in range(3):
            i = e * 3 + a
            datrE_ref[i, :, :] = (
                dcat[:, i * BFk:(i + 1) * BFk]
                - sum(G_rot[a][b] * djntE[:, e * 3 + b:e * 3 + b + 1]
                      for b in range(3)))


def _extras_cols_kernel(datrE_ref, uv_ref, wT_ref, dvE_ref, jme_ref,
                        *, n_chunk):
    """One (frame-block, marker, extras-chunk) step of the E extra columns.

    Consumes the tangent chunk plus the base marker kernel's per-marker
    U/V factors (U = local-frame chain dms, V = dms @ T_rot, pre-weighted in
    the folded variant):
        jm_ext[c, e] = sum_k [ sum_d U_k[c][d] * (w_k . dA_tr_e[d])
                             + sum_z V_k[c][z] * dv[e][z][k] ]
    which is exactly the inline kernel's extras math with the marker-frame
    chain distributed over the sum.
    """
    uv = uv_ref[0]                                             # (54, BF)
    datrE = datrE_ref[:]                                       # (3EC, J, BF)
    wT = wT_ref[:]                                             # (J, 128)
    dv = dvE_ref[:]                                            # (3EC, 128)
    acc = [[None] * n_chunk for _ in range(3)]
    for k in range(3):
        wcol = wT[:, k:k + 1]                                  # (J, 1)
        wdat = jnp.sum(wcol[None, :, :] * datrE, axis=1)       # (3EC, BF)
        for c in range(3):
            u0 = k * 9 + c * 3
            for e in range(n_chunk):
                t = sum(uv[u0 + d:u0 + d + 1, :]
                        * wdat[e * 3 + d:e * 3 + d + 1, :]
                        for d in range(3))
                t = t + sum(uv[27 + u0 + z:28 + u0 + z, :]
                            * dv[e * 3 + z:e * 3 + z + 1, k:k + 1]
                            for z in range(3))
                acc[c][e] = t if acc[c][e] is None else acc[c][e] + t
    for c in range(3):
        jme_ref[c, :, :] = jnp.concatenate(acc[c], axis=0)


def _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref,
                 ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref, pdrow_ref,
                 pdJ_ref, cf_ref, wo_ref,
                 datrE_ref, dvE_ref, extra_ref,
                 out_ref, jm_ref,
                 *, num_joints, body_dof, hand_dof, has_pb, n_extra,
                 vpshift_ref=None, uv_ref=None):
    """One (frame-block, marker) program.

    Smalls blocks depend only on the frame index, so Mosaic keeps them
    VMEM-resident across the marker-major grid sweep; per-marker tables are
    128-aligned bands so every lane index is static (Mosaic forbids dynamic
    lane slicing).

    wo_ref = None: out_ref gets simulated markers, jm_ref the raw Jacobian.
    With wo_ref (rows [w, obs_xyz, 0...] per marker): out_ref gets the
    weighted residual (sim - obs) * w and jm_ref the weighted Jacobian.

    n_extra > 0 appends E extra (dmpl/expression) columns: per vertex
    d v/dx_e = T_rot dv_e + sum_j w_j dA_tr_e[j], pushed through the same
    local-frame chain as the pose columns.
    """
    J = num_joints

    G_rot = [[grot_ref[a * 3 + b] for b in range(3)] for a in range(3)]
    A_tr = [atr_ref[a] for a in range(3)]
    W_rot = [[[wrot_ref[(a * 3 + b) * 3 + t] for t in range(3)]
              for b in range(3)] for a in range(3)]
    W_tr = [[wtr_ref[a * 3 + t] for t in range(3)] for a in range(3)]
    dR = [[[dr_ref[(a * 3 + b) * 3 + t] for b in range(3)]
           for a in range(3)] for t in range(3)]
    if has_pb:
        feat = feat_ref[:]                                     # (9(J-1), BF)
    trans = [trans_ref[pl.ds(c, 1), :] for c in range(3)]      # (1, BF)
    ancT = ancT_ref[:]
    hc = hc_ref[:] if hand_dof else None
    wT = wT_ref[:]                                             # (J, 128)
    sT = sT_ref[:]
    vshT = vshT_ref[:]                                         # (3, 128)
    if has_pb:
        pdJb = pdJ_ref[:]                                      # (J-1, 128)
    if n_extra:
        dvband = dvE_ref[:]                                    # (3E, 128)
        ex = [extra_ref[e:e + 1, :] for e in range(n_extra)]   # (1, BF)

    verts = []
    Jp = []
    JpE = []
    Trots = []
    for k in range(3):
        wcol = wT[:, k:k + 1]                                  # (J, 1)
        scol = sT[:, k:k + 1]
        vsh = vshT[:, k:k + 1]                                 # (3, 1)
        if has_pb:
            pd3 = pdrow_ref[pl.ds(k * 3, 3), :]                # (3, 9(J-1))
            pb = _dotc(pd3, feat)                              # (3, BF)
            vp = [vsh[c:c + 1, :] + pb[c:c + 1, :] for c in range(3)]
        else:
            vp = [jnp.broadcast_to(vsh[c:c + 1, :], (1, BF))
                  for c in range(3)]
        if n_extra:
            vp = [vp[c] + sum(dvband[e * 3 + c:e * 3 + c + 1, k:k + 1]
                              * ex[e] for e in range(n_extra))
                  for c in range(3)]
        if vpshift_ref is not None:
            # tiled-extras mode: per-frame vertex offsets precomputed in XLA
            vp = [vp[c] + vpshift_ref[0, k * 3 + c:k * 3 + c + 1, :]
                  for c in range(3)]

        # z_b = A_rot[b] @ v_posed + A_tr[b]; y = w * z; S = ancT @ y
        zb = [sum(G_rot[b][c] * vp[c] for c in range(3)) + A_tr[b]
              for b in range(3)]
        ycat = jnp.concatenate([wcol * zb[b] for b in range(3)], axis=1)
        Scat = _dotc(ancT, ycat)                               # (J, 3*BF)
        S = [Scat[:, b * BF:(b + 1) * BF] for b in range(3)]

        # T_rot / T_tr for this vertex (weighted skinning transform)
        Trot = [[jnp.sum(wcol * G_rot[a][c], axis=0, keepdims=True)
                 for c in range(3)] for a in range(3)]
        Ttr = [jnp.sum(wcol * A_tr[a], axis=0, keepdims=True)
               for a in range(3)]
        if uv_ref is not None:
            Trots.append(Trot)

        # J_fk[a][t] (J, BF) = W_rot S + s W_tr (+ T_rot dvp)
        Jf = [[sum(W_rot[a][b][t] * S[b] for b in range(3))
               + scol * W_tr[a][t]
               for t in range(3)] for a in range(3)]
        if has_pb:
            dvp = [[sum(pdJb[:, k * 27 + c * 9 + a * 3 + b:
                             k * 27 + c * 9 + a * 3 + b + 1]
                        * dR[t][a][b][1:, :]
                        for a in range(3) for b in range(3))
                    for t in range(3)] for c in range(3)]
            for a in range(3):
                for t in range(3):
                    t3 = sum(Trot[a][c] * dvp[c][t] for c in range(3))
                    Jf[a][t] = jnp.concatenate(
                        [Jf[a][t][:1, :], Jf[a][t][1:, :] + t3], axis=0)

        # column order (j, t) -> optimization pose vector
        Jrows = []
        for a in range(3):
            JJ = jnp.stack([Jf[a][0], Jf[a][1], Jf[a][2]],
                           axis=1).reshape(3 * J, BF)
            if hand_dof:
                Jh = _dotc(hc, JJ[body_dof:3 * J, :])
                JJ = jnp.concatenate([JJ[:body_dof, :], Jh], axis=0)
            Jrows.append(JJ)                                   # (P_out, BF)
        Jp.append(Jrows)

        if n_extra:
            # d v/dx_e (1, BF) rows: skinned joint-shift + direct vertex dir
            if FUSED_EXTRA_REDUCE:
                wdat = jnp.sum(wcol[None, :, :] * datrE_ref[:],
                               axis=1)                         # (3E, BF)
                Je = [[wdat[e * 3 + b:e * 3 + b + 1, :]
                       + sum(Trot[b][c]
                             * dvband[e * 3 + c:e * 3 + c + 1, k:k + 1]
                             for c in range(3))
                       for b in range(3)] for e in range(n_extra)]
            else:
                Je = [[jnp.sum(wcol * datrE_ref[e * 3 + b], axis=0,
                               keepdims=True)
                       + sum(Trot[b][c]
                             * dvband[e * 3 + c:e * 3 + c + 1, k:k + 1]
                             for c in range(3))
                       for b in range(3)] for e in range(n_extra)]
            JpE.append(Je)

        v = [sum(Trot[b][c] * vp[c] for c in range(3)) + Ttr[b] + trans[b]
             for b in range(3)]
        verts.append(v)

    # ---- local-frame reconstruction + its vertex Jacobian -------------------
    cfb = cf_ref[pl.ds(0, 1), :]                               # (1, 3)
    c1, c2, c3 = cfb[:, 0:1], cfb[:, 1:2], cfb[:, 2:3]
    v0, v1, v2 = verts
    e1 = [v1[b] - v0[b] for b in range(3)]
    e2 = [v2[b] - v0[b] for b in range(3)]
    n1 = jnp.sqrt(sum(e * e for e in e1) + _EPS)
    f1 = [e / n1 for e in e1]
    cz = [e1[1] * e2[2] - e1[2] * e2[1],
          e1[2] * e2[0] - e1[0] * e2[2],
          e1[0] * e2[1] - e1[1] * e2[0]]
    n2 = jnp.sqrt(sum(c * c for c in cz) + _EPS)
    f2 = [c / n2 for c in cz]
    f3 = [f1[1] * f2[2] - f1[2] * f2[1],
          f1[2] * f2[0] - f1[0] * f2[2],
          f1[0] * f2[1] - f1[1] * f2[0]]
    sim = [v0[b] + c1 * f1[b] + c2 * f2[b] + c3 * f3[b] for b in range(3)]
    if wo_ref is None:
        wrow = None
        out_ref[0, :, :] = jnp.concatenate(sim, axis=0)
    else:
        wo = wo_ref[:]                                         # (8, BF)
        wrow = wo[0:1, :]
        rw = [(sim[b] - wo[1 + b:2 + b, :]) * wrow for b in range(3)]
        out_ref[0, :, :] = jnp.concatenate(rw, axis=0)

    # d f / d e blocks (exact for the eps-guarded normalization)
    inv1, inv2 = 1.0 / n1, 1.0 / n2
    M1 = [[((1.0 if a == b else 0.0) - f1[a] * f1[b]) * inv1
           for b in range(3)] for a in range(3)]
    M2 = [[((1.0 if a == b else 0.0) - f2[a] * f2[b]) * inv2
           for b in range(3)] for a in range(3)]
    C1 = [[-x for x in row] for row in _skew(e2)]              # d cz / d e1
    C2 = _skew(e1)                                             # d cz / d e2
    A1 = _mat3mul(M2, C1)
    A2 = _mat3mul(M2, C2)
    S1m = _skew(f1)
    S2m = _skew(f2)
    B1 = _mat3mul(S1m, A1)
    B2 = _mat3mul(S1m, A2)
    N1 = _mat3mul(S2m, M1)
    dm1 = [[c1 * M1[a][b] + c2 * A1[a][b] + c3 * (B1[a][b] - N1[a][b])
            for b in range(3)] for a in range(3)]
    dm2 = [[c2 * A2[a][b] + c3 * B2[a][b] for b in range(3)]
           for a in range(3)]
    dm0 = [[(1.0 if a == b else 0.0) - dm1[a][b] - dm2[a][b]
            for b in range(3)] for a in range(3)]
    dms = [dm0, dm1, dm2]

    if uv_ref is not None:
        # tiled-extras mode: export the per-marker local-frame chain so the
        # chunked `_extras_cols_kernel` can emit the E extra columns without
        # re-deriving the marker frame. Rows [0,27): U = dms (k, c, d);
        # rows [27,54): V = dms @ T_rot (k, c, z). Pre-weighted by wrow in
        # the folded-weights variant so jm_ext comes out weighted too.
        rows = []
        for k in range(3):
            for c in range(3):
                for d in range(3):
                    r = dms[k][c][d]
                    rows.append(jnp.broadcast_to(r, (1, BF)) if wrow is None
                                else r * wrow)
        for k in range(3):
            for c in range(3):
                for z in range(3):
                    r = sum(dms[k][c][d] * Trots[k][d][z] for d in range(3))
                    rows.append(r if wrow is None else r * wrow)
        uv_ref[0, :, :] = jnp.concatenate(rows, axis=0)

    for c in range(3):
        row = sum(dms[k][c][d] * Jp[k][d]
                  for k in range(3) for d in range(3))         # (P_out, BF)
        tcol = jnp.concatenate(
            [jnp.full((1, BF), 1.0 if c == j else 0.0, row.dtype)
             for j in range(3)], axis=0)
        pieces = [tcol, row]
        if n_extra:
            pieces.append(jnp.concatenate(
                [sum(dms[k][c][d] * JpE[k][e][d]
                     for k in range(3) for d in range(3))
                 for e in range(n_extra)], axis=0))            # (E, BF)
        out = jnp.concatenate(pieces, axis=0)
        jm_ref[c, :, :] = out if wrow is None else out * wrow


def _marker_kernel(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                   trans_ref,
                   ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref, pdrow_ref,
                   pdJ_ref, cf_ref,
                   sim_ref, jm_ref,
                   *, num_joints, body_dof, hand_dof, has_pb):
    _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref, ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                 pdrow_ref, pdJ_ref, cf_ref, None, None, None, None,
                 sim_ref, jm_ref, num_joints=num_joints, body_dof=body_dof,
                 hand_dof=hand_dof, has_pb=has_pb, n_extra=0)


def _marker_kernel_ext(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                       feat_ref, datrE_ref, trans_ref, extra_ref,
                       ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref, pdrow_ref,
                       pdJ_ref, cf_ref, dvE_ref,
                       sim_ref, jm_ref,
                       *, num_joints, body_dof, hand_dof, has_pb, n_extra):
    _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref, ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                 pdrow_ref, pdJ_ref, cf_ref, None,
                 datrE_ref, dvE_ref, extra_ref,
                 sim_ref, jm_ref, num_joints=num_joints, body_dof=body_dof,
                 hand_dof=hand_dof, has_pb=has_pb, n_extra=n_extra)


def _marker_kernel_tiled(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                         feat_ref, trans_ref, vpshift_ref,
                         ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                         pdrow_ref, pdJ_ref, cf_ref,
                         sim_ref, jm_ref, uv_ref,
                         *, num_joints, body_dof, hand_dof, has_pb):
    _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref, ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                 pdrow_ref, pdJ_ref, cf_ref, None, None, None, None,
                 sim_ref, jm_ref, num_joints=num_joints, body_dof=body_dof,
                 hand_dof=hand_dof, has_pb=has_pb, n_extra=0,
                 vpshift_ref=vpshift_ref, uv_ref=uv_ref)


def _marker_jac_w_kernel_tiled(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                               feat_ref, trans_ref, vpshift_ref,
                               ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                               pdrow_ref, pdJ_ref, cf_ref, wo_ref,
                               rw_ref, jm_ref, uv_ref,
                               *, num_joints, body_dof, hand_dof, has_pb):
    _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref, ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                 pdrow_ref, pdJ_ref, cf_ref, wo_ref, None, None, None,
                 rw_ref, jm_ref, num_joints=num_joints, body_dof=body_dof,
                 hand_dof=hand_dof, has_pb=has_pb, n_extra=0,
                 vpshift_ref=vpshift_ref, uv_ref=uv_ref)


def _sim_smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                     trel_ref, dtrelE_ref, djntE_ref, extra_ref,
                     grot_ref, atr_ref, feat_ref,
                     *, parents, has_pb, n_extra, shift_ref=None):
    """Sim-only smalls: rodrigues + tree FK (no derivative chain).

    With n_extra > 0 the rest joints shift per frame with the extra
    (dmpl/expression) dims, exactly as in `_smalls_impl` — but no tangent FK
    is needed for the primal.
    """
    J = len(parents)
    L = lvl_ref.shape[0]
    th = [theta_ref[t] for t in range(3)]
    R, _ = _rodrigues_rows(*th)

    trel, jnts, _, _, _ = _frame_rest_geometry(
        trel_ref, jnts_ref, dtrelE_ref, djntE_ref, extra_ref, n_extra)
    if shift_ref is not None:
        trel = [trel[c] + shift_ref[c] for c in range(3)]
        jnts = [jnts[c] + shift_ref[3 + c] for c in range(3)]
    G_rot = [[R[a][b] for b in range(3)] for a in range(3)]
    G_tr = [jnp.broadcast_to(trel[a], th[0].shape) for a in range(3)]
    par = par_ref[:]
    for lev in range(L):
        flat = [G_rot[a][b] for a in range(3) for b in range(3)] + G_tr
        gp = _gather_rows(par, flat)
        gp_rot = [[gp[a * 3 + b] for b in range(3)] for a in range(3)]
        gp_tr = gp[9:]
        m = lvl_ref[lev][:, None]
        new_rot = [[sum(gp_rot[a][k] * R[k][b] for k in range(3))
                    for b in range(3)] for a in range(3)]
        new_tr = [sum(gp_rot[a][k] * trel[k] for k in range(3)) + gp_tr[a]
                  for a in range(3)]
        for a in range(3):
            for b in range(3):
                G_rot[a][b] = m * new_rot[a][b] + (1.0 - m) * G_rot[a][b]
            G_tr[a] = m * new_tr[a] + (1.0 - m) * G_tr[a]

    A_tr = [G_tr[a] - sum(G_rot[a][b] * jnts[b] for b in range(3))
            for a in range(3)]
    for a in range(3):
        for b in range(3):
            grot_ref[a * 3 + b, :, :] = G_rot[a][b]
        atr_ref[a, :, :] = A_tr[a]
    if has_pb:
        feats = [R[a][b][1:, :] - (1.0 if a == b else 0.0)
                 for a in range(3) for b in range(3)]
        feat_ref[:, :] = jnp.stack(feats, axis=1).reshape((J - 1) * 9, BF)
    else:
        feat_ref[:, :] = jnp.zeros_like(feat_ref)


def _sim_smalls_kernel(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                       trel_ref,
                       grot_ref, atr_ref, feat_ref,
                       *, parents, has_pb):
    _sim_smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                     trel_ref, None, None, None,
                     grot_ref, atr_ref, feat_ref,
                     parents=parents, has_pb=has_pb, n_extra=0)


def _sim_smalls_kernel_ext(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                           trel_ref, dtrelE_ref, djntE_ref, extra_ref,
                           grot_ref, atr_ref, feat_ref,
                           *, parents, has_pb, n_extra):
    _sim_smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                     trel_ref, dtrelE_ref, djntE_ref, extra_ref,
                     grot_ref, atr_ref, feat_ref,
                     parents=parents, has_pb=has_pb, n_extra=n_extra)


def _sim_smalls_kernel_tiled(theta_ref, lvl_ref, par_ref, rootm_ref,
                             jnts_ref, trel_ref, shift_ref,
                             grot_ref, atr_ref, feat_ref,
                             *, parents, has_pb):
    _sim_smalls_impl(theta_ref, lvl_ref, par_ref, rootm_ref, jnts_ref,
                     trel_ref, None, None, None,
                     grot_ref, atr_ref, feat_ref,
                     parents=parents, has_pb=has_pb, n_extra=0,
                     shift_ref=shift_ref)


def _sim_marker_impl(grot_ref, atr_ref, feat_ref, trans_ref, extra_ref,
                     wT_ref, vshT_ref, pdrow_ref, cf_ref, dvE_ref,
                     sim_ref,
                     *, num_joints, has_pb, n_extra, vpshift_ref=None):
    """Sim-only per-marker program: skinning + local-frame reconstruction."""
    G_rot = [[grot_ref[a * 3 + b] for b in range(3)] for a in range(3)]
    A_tr = [atr_ref[a] for a in range(3)]
    if has_pb:
        feat = feat_ref[:]
    trans = [trans_ref[pl.ds(c, 1), :] for c in range(3)]
    wT = wT_ref[:]
    vshT = vshT_ref[:]
    if n_extra:
        dvband = dvE_ref[:]                                    # (3E, 128)
        ex = [extra_ref[e:e + 1, :] for e in range(n_extra)]   # (1, BF)

    verts = []
    for k in range(3):
        wcol = wT[:, k:k + 1]
        vsh = vshT[:, k:k + 1]
        if has_pb:
            pd3 = pdrow_ref[pl.ds(k * 3, 3), :]
            pb = _dotc(pd3, feat)
            vp = [vsh[c:c + 1, :] + pb[c:c + 1, :] for c in range(3)]
        else:
            vp = [jnp.broadcast_to(vsh[c:c + 1, :], (1, BF))
                  for c in range(3)]
        if n_extra:
            vp = [vp[c] + sum(dvband[e * 3 + c:e * 3 + c + 1, k:k + 1]
                              * ex[e] for e in range(n_extra))
                  for c in range(3)]
        if vpshift_ref is not None:
            vp = [vp[c] + vpshift_ref[0, k * 3 + c:k * 3 + c + 1, :]
                  for c in range(3)]
        Trot = [[jnp.sum(wcol * G_rot[a][c], axis=0, keepdims=True)
                 for c in range(3)] for a in range(3)]
        Ttr = [jnp.sum(wcol * A_tr[a], axis=0, keepdims=True)
               for a in range(3)]
        v = [sum(Trot[b][c] * vp[c] for c in range(3)) + Ttr[b] + trans[b]
             for b in range(3)]
        verts.append(v)

    cfb = cf_ref[pl.ds(0, 1), :]
    c1, c2, c3 = cfb[:, 0:1], cfb[:, 1:2], cfb[:, 2:3]
    v0, v1, v2 = verts
    e1 = [v1[b] - v0[b] for b in range(3)]
    e2 = [v2[b] - v0[b] for b in range(3)]
    n1 = jnp.sqrt(sum(e * e for e in e1) + _EPS)
    f1 = [e / n1 for e in e1]
    cz = [e1[1] * e2[2] - e1[2] * e2[1],
          e1[2] * e2[0] - e1[0] * e2[2],
          e1[0] * e2[1] - e1[1] * e2[0]]
    n2 = jnp.sqrt(sum(c * c for c in cz) + _EPS)
    f2 = [c / n2 for c in cz]
    f3 = [f1[1] * f2[2] - f1[2] * f2[1],
          f1[2] * f2[0] - f1[0] * f2[2],
          f1[0] * f2[1] - f1[1] * f2[0]]
    sim = [v0[b] + c1 * f1[b] + c2 * f2[b] + c3 * f3[b] for b in range(3)]
    sim_ref[0, :, :] = jnp.concatenate(sim, axis=0)


def _sim_marker_kernel(grot_ref, atr_ref, feat_ref, trans_ref,
                       wT_ref, vshT_ref, pdrow_ref, cf_ref,
                       sim_ref,
                       *, num_joints, has_pb):
    _sim_marker_impl(grot_ref, atr_ref, feat_ref, trans_ref, None,
                     wT_ref, vshT_ref, pdrow_ref, cf_ref, None,
                     sim_ref, num_joints=num_joints, has_pb=has_pb,
                     n_extra=0)


def _sim_marker_kernel_ext(grot_ref, atr_ref, feat_ref, trans_ref, extra_ref,
                           wT_ref, vshT_ref, pdrow_ref, cf_ref, dvE_ref,
                           sim_ref,
                           *, num_joints, has_pb, n_extra):
    _sim_marker_impl(grot_ref, atr_ref, feat_ref, trans_ref, extra_ref,
                     wT_ref, vshT_ref, pdrow_ref, cf_ref, dvE_ref,
                     sim_ref, num_joints=num_joints, has_pb=has_pb,
                     n_extra=n_extra)


def _sim_marker_kernel_tiled(grot_ref, atr_ref, feat_ref, trans_ref,
                             vpshift_ref,
                             wT_ref, vshT_ref, pdrow_ref, cf_ref,
                             sim_ref,
                             *, num_joints, has_pb):
    _sim_marker_impl(grot_ref, atr_ref, feat_ref, trans_ref, None,
                     wT_ref, vshT_ref, pdrow_ref, cf_ref, None,
                     sim_ref, num_joints=num_joints, has_pb=has_pb,
                     n_extra=0, vpshift_ref=vpshift_ref)


def _tiled_extra_inputs(tables: MarkerJacTables, x_pad: jnp.ndarray,
                        E: int, M: int, J: int, P: int):
    """XLA-precomputed per-frame inputs for the tiled-extras kernel path.

    The extras' effect on the PRIMAL is linear in the direction tables, so
    the per-frame rest-geometry and vertex offsets are two small matmuls
    ((J*6, E) x (E, F) and (M*9, E) x (E, F)) that XLA fuses; only the
    E Jacobian *columns* need kernel work, which streams in EXTRA_CHUNK
    slabs. Returns (jshift (6, J, Fp) rows [trel_c; jnt_c], vpshift
    (M, 9, Fp) rows k*3+c, padded chunk tables, num chunks).
    """
    extra = x_pad[:, 3 + P:3 + P + E]                          # (Fp, E)
    Fp = x_pad.shape[0]
    dtrel3 = tables.dtrelE.reshape(J, E, 3)
    djnt3 = tables.djntE.reshape(J, E, 3)
    dv = tables.dvE.reshape(E, 3, M, 128)[..., :3]             # [e, c, m, k]
    with jax.default_matmul_precision("highest"):
        sh_tr = jnp.einsum("jec,fe->cjf", dtrel3, extra)
        sh_j = jnp.einsum("jec,fe->cjf", djnt3, extra)
        vpshift = jnp.einsum("ecmk,fe->mkcf", dv, extra)
    jshift = jnp.concatenate([sh_tr, sh_j], axis=0)            # (6, J, Fp)
    vpshift = vpshift.reshape(M, 9, Fp)
    EC = EXTRA_CHUNK
    nec = -(-E // EC)
    pad = nec * EC - E
    # zero-padded direction chunks -> the padded Jacobian columns come out
    # exactly zero and are sliced off after the kernel. Chunk-major
    # (nec, J, 3*EC) layout: the per-step block is then (1, J, 3*EC) with
    # FULL last-two dims, which Mosaic accepts for any EC (a (J, 3*EC)
    # block of a (J, 3*E) array fails the (8, 128)-divisibility rule).
    J_ = tables.dtrelE.shape[0]
    dtrelE_p = jnp.pad(tables.dtrelE, ((0, 0), (0, 3 * pad))) \
        .reshape(J_, nec, 3 * EC).transpose(1, 0, 2)
    djntE_p = jnp.pad(tables.djntE, ((0, 0), (0, 3 * pad))) \
        .reshape(J_, nec, 3 * EC).transpose(1, 0, 2)
    dvE_p = jnp.pad(tables.dvE, ((0, 3 * pad), (0, 0)))
    return jshift, vpshift, dtrelE_p, djntE_p, dvE_p, nec


def marker_sim(model: SurfaceModel,
               tables: MarkerJacTables,
               x: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """Fused simulated markers only: x (F, 3+P) -> sim (F, M, 3).

    The light path for trial-point cost evaluation inside the dogleg loop —
    same math as `marker_sim_and_jacobian`'s primal, no derivative chain.
    """
    info = model.info
    parents = model.parents
    J = model.num_joints
    has_pb = model.posedirs.shape[-1] > 0 and J > 1
    body_dof = info.body_pose_dof
    P = model.pose_dof
    M = tables.cf.shape[0] // 8
    RB = 16
    CB = 8
    pdN = tables.pdrow.shape[1]
    featN = (J - 1) * 9 if has_pb else 8
    E = tables.n_extra

    tiled = E > INLINE_MAX_EXTRAS
    if tiled:
        smalls_kern = functools.partial(_sim_smalls_kernel_tiled,
                                        parents=parents, has_pb=has_pb)
        marker_kern = functools.partial(_sim_marker_kernel_tiled,
                                        num_joints=J, has_pb=has_pb)
    elif E:
        smalls_kern = functools.partial(_sim_smalls_kernel_ext,
                                        parents=parents, has_pb=has_pb,
                                        n_extra=E)
        marker_kern = functools.partial(_sim_marker_kernel_ext, num_joints=J,
                                        has_pb=has_pb, n_extra=E)
    else:
        smalls_kern = functools.partial(_sim_smalls_kernel, parents=parents,
                                        has_pb=has_pb)
        marker_kern = functools.partial(_sim_marker_kernel, num_joints=J,
                                        has_pb=has_pb)
    cspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    F = x.shape[0]
    Fp = -(-F // BF) * BF
    x = jnp.pad(x.astype(jnp.float32), ((0, Fp - F), (0, 0)))
    trans = x[:, :3]
    pose = x[:, 3:3 + P]
    if info.has_hands:
        with jax.default_matmul_precision("highest"):
            hands = tables.hands_mean + pose[:, body_dof:] @ tables.hc
        fullpose = jnp.concatenate([pose[:, :body_dof], hands], axis=1)
    else:
        fullpose = pose
    theta3 = fullpose.reshape(Fp, J, 3).transpose(2, 1, 0)
    trans2 = trans.T

    nf = Fp // BF
    s_in = [
        pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        cspec(), cspec(), cspec(), cspec(), cspec(),
    ]
    s_args = [theta3, tables.lvl, tables.par, tables.rootm, tables.jnts,
              tables.trel]
    if tiled:
        jshift, vpshift, _, _, _, _ = _tiled_extra_inputs(
            tables, x, E, M, J, P)
        s_in.append(pl.BlockSpec((6, J, BF), lambda fi: (0, 0, fi),
                                 memory_space=pltpu.VMEM))
        s_args.append(jshift)
    elif E:
        extra2 = x[:, 3 + P:3 + P + E].T                       # (E, Fp)
        s_in += [cspec(), cspec(),
                 pl.BlockSpec((E, BF), lambda fi: (0, fi),
                              memory_space=pltpu.VMEM)]
        s_args += [tables.dtrelE, tables.djntE, extra2]
    smalls = pl.pallas_call(
        smalls_kern,
        grid=(nf,),
        out_shape=[
            jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),
            jax.ShapeDtypeStruct((3, J, Fp), jnp.float32),
            jax.ShapeDtypeStruct((featN, Fp), jnp.float32),
        ],
        in_specs=s_in,
        out_specs=[
            pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((featN, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(*s_args)

    m_in = [
        pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((featN, BF), lambda fi, mi: (0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, BF), lambda fi, mi: (0, fi),
                     memory_space=pltpu.VMEM),
    ]
    m_args = list(smalls) + [trans2]
    if tiled:
        m_in.append(pl.BlockSpec((1, 9, BF), lambda fi, mi: (mi, 0, fi),
                                 memory_space=pltpu.VMEM))
        m_args.append(vpshift)
    elif E:
        m_in.append(pl.BlockSpec((E, BF), lambda fi, mi: (0, fi),
                                 memory_space=pltpu.VMEM))
        m_args.append(extra2)
    m_in += [
        pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, pdN), lambda fi, mi: (mi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CB, 3), lambda fi, mi: (mi, 0),
                     memory_space=pltpu.VMEM),
    ]
    m_args += [tables.wT, tables.vshT, tables.pdrow, tables.cf]
    if E and not tiled:
        m_in.append(pl.BlockSpec((3 * E, 128), lambda fi, mi: (0, mi),
                                 memory_space=pltpu.VMEM))
        m_args.append(tables.dvE)
    sim_t = pl.pallas_call(
        marker_kern,
        grid=(nf, M),
        out_shape=jax.ShapeDtypeStruct((M, 3, Fp), jnp.float32),
        in_specs=m_in,
        out_specs=pl.BlockSpec((1, 3, BF), lambda fi, mi: (mi, 0, fi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*m_args)
    return sim_t.transpose(2, 0, 1)[:F]


def _marker_jac_w_kernel(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                          feat_ref, trans_ref,
                          ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                          pdrow_ref, pdJ_ref, cf_ref, wo_ref,
                          rw_ref, jm_ref,
                          *, num_joints, body_dof, hand_dof, has_pb):
    _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref, ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                 pdrow_ref, pdJ_ref, cf_ref, wo_ref, None, None, None,
                 rw_ref, jm_ref, num_joints=num_joints, body_dof=body_dof,
                 hand_dof=hand_dof, has_pb=has_pb, n_extra=0)


def _marker_jac_w_kernel_ext(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref,
                             feat_ref, datrE_ref, trans_ref, extra_ref,
                             ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                             pdrow_ref, pdJ_ref, cf_ref, dvE_ref, wo_ref,
                             rw_ref, jm_ref,
                             *, num_joints, body_dof, hand_dof, has_pb,
                             n_extra):
    _marker_impl(grot_ref, atr_ref, wrot_ref, wtr_ref, dr_ref, feat_ref,
                 trans_ref, ancT_ref, hc_ref, wT_ref, sT_ref, vshT_ref,
                 pdrow_ref, pdJ_ref, cf_ref, wo_ref,
                 datrE_ref, dvE_ref, extra_ref,
                 rw_ref, jm_ref, num_joints=num_joints, body_dof=body_dof,
                 hand_dof=hand_dof, has_pb=has_pb, n_extra=n_extra)


def prepare_marker_jac_tables(model: SurfaceModel,
                              idx: MarkerFrameIndices,
                              coeffs: jnp.ndarray,
                              betas: jnp.ndarray,
                              extra_cols=None) -> MarkerJacTables:
    """Freeze a (model, marker set, betas) problem into kernel tables.

    extra_cols: optional (E,) int column indices into shapedirs /
    joint_shapedirs for per-frame extra shape dims (DMPL splice columns
    [num_betas, num_betas+num_dmpls) or expression columns
    [expr_start, expr_start+num_expressions)); the kernels then emit E extra
    Jacobian columns and apply the per-frame rest-joint/vertex offsets.
    """
    parents = model.parents
    J = model.num_joints
    nb = min(int(betas.shape[-1]), model.num_shape_dirs)
    betas64 = np.asarray(betas, np.float64)[:nb]
    has_pb = model.posedirs.shape[-1] > 0 and J > 1
    hand_dof = (model.pose_dof - model.info.body_pose_dof
                if model.info.has_hands else 0)

    stacked = np.asarray(idx.stacked)                          # (M, 3) vids
    M = stacked.shape[0]
    inst = stacked.reshape(-1)                                 # (M*3,)

    w_eff = np.asarray(effective_weights(model))
    v_shaped = (np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :nb],
        betas64)).astype(np.float32)
    jnts = (np.asarray(model.joint_template) + np.einsum(
        "jcb,b->jc", np.asarray(model.joint_shapedirs)[..., :nb],
        betas64)).astype(np.float32)
    trel = jnts.copy()
    for j in range(1, J):
        trel[j] = jnts[j] - jnts[parents[j]]
    anc = _ancestor_matrix(parents)                            # (K, J)

    # per-marker tables, one 128-aligned band per marker so every lane index
    # in the kernel is static (Mosaic forbids dynamic lane slicing)
    def _lane_banded(tbl3, width):
        rows, M_, k = tbl3.shape
        out = np.zeros((rows, M_ * width), np.float32)
        for m in range(M_):
            out[:, m * width:m * width + k] = tbl3[:, m]
        return out

    wt3 = w_eff[inst].T.reshape(J, M, 3)
    st3 = (w_eff[inst] @ anc).T.reshape(J, M, 3)
    vsh3 = v_shaped[inst].T.reshape(3, M, 3)

    pdN = 9 * (J - 1) if has_pb else 8
    RB = 16                                                    # 9 rows used
    pdrow = np.zeros((M * RB, pdN), np.float32)
    J1 = max(J - 1, 1)
    pdJ3 = np.zeros((J1, M, 81), np.float32)
    if has_pb:
        pd = np.asarray(model.posedirs)[inst]                  # (M*3,3,9(J-1))
        for m in range(M):
            pdrow[m * RB:m * RB + 9] = pd[m * 3:(m + 1) * 3].reshape(9, pdN)
        pdJ3 = pd.reshape(M, 3, 3, J - 1, 3, 3).transpose(
            3, 0, 1, 2, 4, 5).reshape(J - 1, M, 81)

    CB = 8                                                     # 1 row used
    cf = np.zeros((M * CB, 3), np.float32)
    cf[::CB] = np.asarray(coeffs)

    if extra_cols is not None and len(extra_cols):
        cols = np.asarray(extra_cols, np.int64)
        E = len(cols)
        assert int(cols.max()) < model.num_shape_dirs, (
            f"extra col {cols.max()} beyond shapedirs width "
            f"{model.num_shape_dirs}")
        djnt3 = np.asarray(model.joint_shapedirs)[..., cols]   # (J, 3, E)
        dtrel3 = djnt3.copy()
        for j in range(1, J):
            dtrel3[j] = djnt3[j] - djnt3[parents[j]]
        # column layout e*3+c to match the kernels' per-(e, coord) reads
        djntE = djnt3.transpose(0, 2, 1).reshape(J, E * 3)
        dtrelE = dtrel3.transpose(0, 2, 1).reshape(J, E * 3)
        dv3 = np.asarray(model.shapedirs)[inst][..., cols]     # (M*3, 3, E)
        # rows e*3+c, band lane k (frame vertex): [e*3+c, m, k] = dv3[m*3+k, c, e]
        dvE3 = dv3.reshape(M, 3, 3, E).transpose(3, 2, 0, 1).reshape(
            E * 3, M, 3)
        dvE = _lane_banded(dvE3.astype(np.float32), 128)
    else:
        djntE = np.zeros((J, 0), np.float32)
        dtrelE = np.zeros((J, 0), np.float32)
        dvE = np.zeros((0, M * 128), np.float32)

    return MarkerJacTables(
        lvl=jnp.asarray(_tree_level_masks(parents)),
        par=jnp.asarray(_parent_onehot(parents)),
        rootm=jnp.asarray([[1.0 if p < 0 else 0.0] for p in parents],
                          jnp.float32),
        jnts=jnp.asarray(jnts),
        trel=jnp.asarray(trel),
        ancT=jnp.asarray(anc.T, jnp.float32),
        hc=jnp.asarray(model.hands_components, jnp.float32)
        if hand_dof else jnp.zeros((1, 1), jnp.float32),
        wT=jnp.asarray(_lane_banded(wt3, 128)),
        sT=jnp.asarray(_lane_banded(st3, 128)),
        vshT=jnp.asarray(_lane_banded(vsh3, 128)),
        pdrow=jnp.asarray(pdrow),
        pdJ=jnp.asarray(_lane_banded(pdJ3, 128)),
        cf=jnp.asarray(cf),
        hands_mean=jnp.asarray(model.hands_mean, jnp.float32)
        if hand_dof else jnp.zeros((0,), jnp.float32),
        dtrelE=jnp.asarray(dtrelE),
        djntE=jnp.asarray(djntE),
        dvE=jnp.asarray(dvE),
    )


def _sim_and_jac_tiled(model: SurfaceModel,
                       tables: MarkerJacTables,
                       x: jnp.ndarray,
                       wo_full=None,
                       interpret: bool = False):
    """Tiled-extras fused markers + Jacobian (E > INLINE_MAX_EXTRAS).

    Four-kernel pipeline so program size is independent of E (the
    reference's production smplx face config is E=80 expression dims,
    support_data/conf/moshpp_conf.yaml:30):

      1. `_smalls_kernel_tiled`  (nf,)          FK on XLA-precomputed shifted
                                                rest geometry; also emits Q
      2. `_extras_tangent_kernel` (nf, nec)     closed-form dA_tr/dx_e in
                                                EXTRA_CHUNK slabs
      3. `_marker_kernel_tiled`  (nf, M)        sim + (trans, pose) columns +
                                                per-marker U/V chain factors
      4. `_extras_cols_kernel`   (nf, nec, M)   the E extra columns

    With `wo_full` (the folded-weights (M*8, Fp) w/obs table) the marker
    kernel emits weighted residuals and U/V come out pre-weighted, so the
    extra columns are weighted too. Returns (out_t (M, 3, Fp),
    jm_full (M*3, 3+P+E, Fp)); callers slice/transpose.
    """
    info = model.info
    parents = model.parents
    J = model.num_joints
    has_pb = model.posedirs.shape[-1] > 0 and J > 1
    body_dof = info.body_pose_dof
    hand_dof = model.pose_dof - body_dof if info.has_hands else 0
    P = model.pose_dof
    E = tables.n_extra
    Dp = 3 + P
    M = tables.cf.shape[0] // 8
    RB = 16
    CB = 8
    pdN = tables.pdrow.shape[1]
    J1 = tables.pdJ.shape[0]
    featN = (J - 1) * 9 if has_pb else 8
    EC = EXTRA_CHUNK
    cspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    Fp = x.shape[0]                    # callers pre-pad to a BF multiple
    nf = Fp // BF
    trans = x[:, :3]
    pose = x[:, 3:3 + P]
    if info.has_hands:
        with jax.default_matmul_precision("highest"):
            hands = tables.hands_mean + pose[:, body_dof:] @ tables.hc
        fullpose = jnp.concatenate([pose[:, :body_dof], hands], axis=1)
    else:
        fullpose = pose
    theta3 = fullpose.reshape(Fp, J, 3).transpose(2, 1, 0)
    trans2 = trans.T
    jshift, vpshift, dtrelE_p, djntE_p, dvE_p, nec = _tiled_extra_inputs(
        tables, x, E, M, J, P)

    smalls_kern = functools.partial(_smalls_kernel_tiled, parents=parents,
                                    has_pb=has_pb)
    s_in = [
        pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        cspec(), cspec(), cspec(), cspec(), cspec(),
        pl.BlockSpec((6, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
    ]
    s_args = [theta3, tables.lvl, tables.par, tables.rootm, tables.jnts,
              tables.trel, jshift]
    s_out_shape = [
        jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),   # grot
        jax.ShapeDtypeStruct((3, J, Fp), jnp.float32),   # atr
        jax.ShapeDtypeStruct((27, J, Fp), jnp.float32),  # wrot
        jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),   # wtr
        jax.ShapeDtypeStruct((27, J, Fp), jnp.float32),  # dr
        jax.ShapeDtypeStruct((featN, Fp), jnp.float32),  # feat
        jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),   # Q
    ]
    s_out = [
        pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((featN, BF), lambda fi: (0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
    ]
    smalls = pl.pallas_call(
        smalls_kern,
        grid=(nf,),
        out_shape=s_out_shape,
        in_specs=s_in,
        out_specs=s_out,
        interpret=interpret,
    )(*s_args)
    grot, atr, wrot, wtr, dr, feat, q = smalls

    datrE = pl.pallas_call(
        functools.partial(_extras_tangent_kernel, n_chunk=EC),
        grid=(nf, nec),
        out_shape=jax.ShapeDtypeStruct((3 * EC * nec, J, Fp), jnp.float32),
        in_specs=[
            pl.BlockSpec((9, J, BF), lambda fi, ei: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, J, BF), lambda fi, ei: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, 3 * EC), lambda fi, ei: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, 3 * EC), lambda fi, ei: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec(),
        ],
        out_specs=pl.BlockSpec((3 * EC, J, BF), lambda fi, ei: (ei, 0, fi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, grot, dtrelE_p, djntE_p, tables.ancT)

    if wo_full is None:
        marker_kern = functools.partial(_marker_kernel_tiled, num_joints=J,
                                        body_dof=body_dof, hand_dof=hand_dof,
                                        has_pb=has_pb)
    else:
        marker_kern = functools.partial(_marker_jac_w_kernel_tiled,
                                        num_joints=J, body_dof=body_dof,
                                        hand_dof=hand_dof, has_pb=has_pb)
    m_in = [
        pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((featN, BF), lambda fi, mi: (0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, BF), lambda fi, mi: (0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 9, BF), lambda fi, mi: (mi, 0, fi),
                     memory_space=pltpu.VMEM),
        cspec(), cspec(),
        pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, pdN), lambda fi, mi: (mi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J1, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CB, 3), lambda fi, mi: (mi, 0),
                     memory_space=pltpu.VMEM),
    ]
    m_args = [grot, atr, wrot, wtr, dr, feat, trans2, vpshift,
              tables.ancT, tables.hc, tables.wT, tables.sT, tables.vshT,
              tables.pdrow, tables.pdJ, tables.cf]
    if wo_full is not None:
        m_in.append(pl.BlockSpec((CB, BF), lambda fi, mi: (mi, fi),
                                 memory_space=pltpu.VMEM))
        m_args.append(wo_full)
    out_t, jm_t, uv = pl.pallas_call(
        marker_kern,
        grid=(nf, M),
        out_shape=[
            jax.ShapeDtypeStruct((M, 3, Fp), jnp.float32),
            jax.ShapeDtypeStruct((M * 3, Dp, Fp), jnp.float32),
            jax.ShapeDtypeStruct((M, 54, Fp), jnp.float32),
        ],
        in_specs=m_in,
        out_specs=[
            pl.BlockSpec((1, 3, BF), lambda fi, mi: (mi, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Dp, BF), lambda fi, mi: (mi, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 54, BF), lambda fi, mi: (mi, 0, fi),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(*m_args)

    jme = pl.pallas_call(
        functools.partial(_extras_cols_kernel, n_chunk=EC),
        grid=(nf, nec, M),      # markers innermost: the tangent chunk stays
                                # VMEM-resident across the marker sweep
        out_shape=jax.ShapeDtypeStruct((M * 3, EC * nec, Fp), jnp.float32),
        in_specs=[
            pl.BlockSpec((3 * EC, J, BF), lambda fi, ei, mi: (ei, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 54, BF), lambda fi, ei, mi: (mi, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 128), lambda fi, ei, mi: (0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * EC, 128), lambda fi, ei, mi: (ei, mi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, EC, BF), lambda fi, ei, mi: (mi, ei, fi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(datrE, uv, tables.wT, dvE_p)

    jm_full = jnp.concatenate([jm_t, jme[:, :E, :]], axis=1)
    return out_t, jm_full


def marker_sim_and_jacobian(model: SurfaceModel,
                            tables: MarkerJacTables,
                            x: jnp.ndarray,
                            interpret: bool = False):
    """Fused markers + (trans, pose) Jacobian for a batch of frames.

    x (F, 3+P) -> (sim (F, M, 3), jm (F, M, 3, 3+P)). Traceable: `tables`
    leaves may be jit arguments; only `model`'s static attributes are read.
    Exactly equivalent to `lbs_verts_and_jacobian` + `markers_and_jacobian`
    (validated in tests/test_pallas_jac.py).

    Two-kernel pipeline: `_smalls_kernel` runs once per 128-frame block;
    `_marker_kernel` runs per (frame block, marker) with the smalls blocks
    staying VMEM-resident across the marker-major grid sweep (splitting keeps
    each program's live set far below the 16 MB VMEM budget — a single
    unrolled kernel stack-allocates every marker's temporaries at once).
    """
    info = model.info
    parents = model.parents
    J = model.num_joints
    has_pb = model.posedirs.shape[-1] > 0 and J > 1
    body_dof = info.body_pose_dof
    hand_dof = model.pose_dof - body_dof if info.has_hands else 0
    P = model.pose_dof
    E = tables.n_extra
    D = 3 + P + E
    M = tables.cf.shape[0] // 8
    RB = 16
    CB = 8
    pdN = tables.pdrow.shape[1]
    J1 = tables.pdJ.shape[0]
    featN = (J - 1) * 9 if has_pb else 8

    if E > INLINE_MAX_EXTRAS:
        F = x.shape[0]
        Fp = -(-F // BF) * BF
        xp = jnp.pad(x.astype(jnp.float32), ((0, Fp - F), (0, 0)))
        sim_t, jm_full = _sim_and_jac_tiled(model, tables, xp,
                                            interpret=interpret)
        sim = sim_t.transpose(2, 0, 1)[:F]
        jm = jm_full.reshape(M, 3, D, Fp).transpose(3, 0, 1, 2)[:F]
        return sim, jm

    if E:
        smalls_kern = functools.partial(_smalls_kernel_ext, parents=parents,
                                        has_pb=has_pb, n_extra=E)
        marker_kern = functools.partial(_marker_kernel_ext, num_joints=J,
                                        body_dof=body_dof, hand_dof=hand_dof,
                                        has_pb=has_pb, n_extra=E)
    else:
        smalls_kern = functools.partial(_smalls_kernel, parents=parents,
                                        has_pb=has_pb)
        marker_kern = functools.partial(_marker_kernel, num_joints=J,
                                        body_dof=body_dof, hand_dof=hand_dof,
                                        has_pb=has_pb)
    cspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def call_kernels(theta3, trans2, extra2, Fp):
        nf = Fp // BF
        s_in = [
            pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            cspec(), cspec(), cspec(), cspec(), cspec(),
        ]
        s_args = [theta3, tables.lvl, tables.par, tables.rootm, tables.jnts,
                  tables.trel]
        s_out_shape = [
            jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),   # grot
            jax.ShapeDtypeStruct((3, J, Fp), jnp.float32),   # atr
            jax.ShapeDtypeStruct((27, J, Fp), jnp.float32),  # wrot
            jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),   # wtr
            jax.ShapeDtypeStruct((27, J, Fp), jnp.float32),  # dr
            jax.ShapeDtypeStruct((featN, Fp), jnp.float32),  # feat
        ]
        s_out = [
            pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, J, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((featN, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
        ]
        if E:
            s_in += [cspec(), cspec(),
                     pl.BlockSpec((E, BF), lambda fi: (0, fi),
                                  memory_space=pltpu.VMEM),
                     cspec()]
            s_args += [tables.dtrelE, tables.djntE, extra2, tables.ancT]
            s_out_shape.append(
                jax.ShapeDtypeStruct((3 * E, J, Fp), jnp.float32))  # datrE
            s_out.append(pl.BlockSpec((3 * E, J, BF),
                                      lambda fi: (0, 0, fi),
                                      memory_space=pltpu.VMEM))
        smalls = pl.pallas_call(
            smalls_kern,
            grid=(nf,),
            out_shape=s_out_shape,
            in_specs=s_in,
            out_specs=s_out,
            interpret=interpret,
        )(*s_args)

        m_in = [
            # smalls: frame-block only -> VMEM-resident across markers
            pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, BF), lambda fi, mi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, J, BF), lambda fi, mi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, J, BF), lambda fi, mi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((featN, BF), lambda fi, mi: (0, fi),
                         memory_space=pltpu.VMEM),
        ]
        m_args = list(smalls)
        if E:
            m_in.append(pl.BlockSpec((3 * E, J, BF),
                                     lambda fi, mi: (0, 0, fi),
                                     memory_space=pltpu.VMEM))
        m_in.append(pl.BlockSpec((3, BF), lambda fi, mi: (0, fi),
                                 memory_space=pltpu.VMEM))
        m_args.append(trans2)
        if E:
            m_in.append(pl.BlockSpec((E, BF), lambda fi, mi: (0, fi),
                                     memory_space=pltpu.VMEM))
            m_args.append(extra2)
        m_in += [
            # shared tables
            cspec(), cspec(),
            # per-marker bands
            pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda fi, mi: (0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, pdN), lambda fi, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J1, 128), lambda fi, mi: (0, mi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 3), lambda fi, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
        ]
        m_args += [tables.ancT, tables.hc, tables.wT, tables.sT,
                   tables.vshT, tables.pdrow, tables.pdJ, tables.cf]
        if E:
            m_in.append(pl.BlockSpec((3 * E, 128), lambda fi, mi: (0, mi),
                                     memory_space=pltpu.VMEM))
            m_args.append(tables.dvE)
        sim_t, jm_t = pl.pallas_call(
            marker_kern,
            grid=(nf, M),
            out_shape=[
                jax.ShapeDtypeStruct((M, 3, Fp), jnp.float32),
                jax.ShapeDtypeStruct((M * 3, D, Fp), jnp.float32),
            ],
            in_specs=m_in,
            out_specs=[
                pl.BlockSpec((1, 3, BF), lambda fi, mi: (mi, 0, fi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, D, BF), lambda fi, mi: (mi, 0, fi),
                             memory_space=pltpu.VMEM),
            ],
            interpret=interpret,
        )(*m_args)
        return sim_t, jm_t

    F = x.shape[0]
    Fp = -(-F // BF) * BF
    x = jnp.pad(x.astype(jnp.float32), ((0, Fp - F), (0, 0)))
    trans = x[:, :3]
    pose = x[:, 3:3 + P]
    if info.has_hands:
        with jax.default_matmul_precision("highest"):
            hands = tables.hands_mean + pose[:, body_dof:] @ tables.hc
        fullpose = jnp.concatenate([pose[:, :body_dof], hands], axis=1)
    else:
        fullpose = pose
    theta3 = fullpose.reshape(Fp, J, 3).transpose(2, 1, 0)
    trans2 = trans.T                                           # (3, Fp)
    extra2 = x[:, 3 + P:3 + P + E].T if E else None            # (E, Fp)
    sim_t, jm_t = call_kernels(theta3, trans2, extra2, Fp)
    sim = sim_t.transpose(2, 0, 1)[:F]
    jm = jm_t.reshape(M, 3, D, Fp).transpose(3, 0, 1, 2)[:F]
    return sim, jm


def build_marker_jacobian_fn(model: SurfaceModel,
                             idx: MarkerFrameIndices,
                             coeffs: jnp.ndarray,
                             betas: jnp.ndarray,
                             interpret: bool = False):
    """Convenience wrapper: freeze tables and return fn(x) -> (sim, jm)."""
    tables = prepare_marker_jac_tables(model, idx, coeffs, betas)
    return functools.partial(marker_sim_and_jacobian, model, tables,
                             interpret=interpret)


def marker_resid_and_wjac(model: SurfaceModel,
                          tables: MarkerJacTables,
                          x: jnp.ndarray,
                          obs: jnp.ndarray,
                          wrow: jnp.ndarray,
                          interpret: bool = False):
    """Weighted-data variant of `marker_sim_and_jacobian`.

    x (F, 3+P), obs (F, M, 3), wrow (F, M) -> (rw (F, M, 3),
    jw (F, M, 3, 3+P)) where rw = (sim - obs) * wrow and jw = J * wrow —
    the Gauss-Newton data rows, pre-weighted in-kernel (no (F, M, 3, D)
    weighting pass in XLA).
    """
    info = model.info
    parents = model.parents
    J = model.num_joints
    has_pb = model.posedirs.shape[-1] > 0 and J > 1
    body_dof = info.body_pose_dof
    hand_dof = model.pose_dof - body_dof if info.has_hands else 0
    P = model.pose_dof
    E = tables.n_extra
    D = 3 + P + E
    M = tables.cf.shape[0] // 8
    RB = 16
    CB = 8
    pdN = tables.pdrow.shape[1]
    J1 = tables.pdJ.shape[0]
    featN = (J - 1) * 9 if has_pb else 8

    F = x.shape[0]
    Fp = -(-F // BF) * BF
    x = jnp.pad(x.astype(jnp.float32), ((0, Fp - F), (0, 0)))
    # wo rows per marker: [w, obs_x, obs_y, obs_z, 0, 0, 0, 0]
    wo = jnp.zeros((M, 8, Fp), jnp.float32)
    wo = wo.at[:, 0, :F].set(wrow.astype(jnp.float32).T)
    wo = wo.at[:, 1:4, :F].set(obs.astype(jnp.float32).transpose(1, 2, 0))
    wo = wo.reshape(M * 8, Fp)

    if E > INLINE_MAX_EXTRAS:
        rw_t, jm_full = _sim_and_jac_tiled(model, tables, x, wo_full=wo,
                                           interpret=interpret)
        rw = rw_t.transpose(2, 0, 1)[:F]
        jw = jm_full.reshape(M, 3, D, Fp).transpose(3, 0, 1, 2)[:F]
        return rw, jw

    trans = x[:, :3]
    pose = x[:, 3:3 + P]
    if info.has_hands:
        with jax.default_matmul_precision("highest"):
            hands = tables.hands_mean + pose[:, body_dof:] @ tables.hc
        fullpose = jnp.concatenate([pose[:, :body_dof], hands], axis=1)
    else:
        fullpose = pose
    theta3 = fullpose.reshape(Fp, J, 3).transpose(2, 1, 0)
    trans2 = trans.T
    extra2 = x[:, 3 + P:3 + P + E].T if E else None            # (E, Fp)

    if E:
        smalls_kern = functools.partial(_smalls_kernel_ext, parents=parents,
                                        has_pb=has_pb, n_extra=E)
        marker_kern = functools.partial(_marker_jac_w_kernel_ext,
                                        num_joints=J, body_dof=body_dof,
                                        hand_dof=hand_dof, has_pb=has_pb,
                                        n_extra=E)
    else:
        smalls_kern = functools.partial(_smalls_kernel, parents=parents,
                                        has_pb=has_pb)
        marker_kern = functools.partial(_marker_jac_w_kernel, num_joints=J,
                                        body_dof=body_dof, hand_dof=hand_dof,
                                        has_pb=has_pb)
    cspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    nf = Fp // BF
    s_in = [
        pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        cspec(), cspec(), cspec(), cspec(), cspec(),
    ]
    s_args = [theta3, tables.lvl, tables.par, tables.rootm, tables.jnts,
              tables.trel]
    s_out_shape = [
        jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),
        jax.ShapeDtypeStruct((3, J, Fp), jnp.float32),
        jax.ShapeDtypeStruct((27, J, Fp), jnp.float32),
        jax.ShapeDtypeStruct((9, J, Fp), jnp.float32),
        jax.ShapeDtypeStruct((27, J, Fp), jnp.float32),
        jax.ShapeDtypeStruct((featN, Fp), jnp.float32),
    ]
    s_out = [
        pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((featN, BF), lambda fi: (0, fi),
                     memory_space=pltpu.VMEM),
    ]
    if E:
        s_in += [cspec(), cspec(),
                 pl.BlockSpec((E, BF), lambda fi: (0, fi),
                              memory_space=pltpu.VMEM),
                 cspec()]
        s_args += [tables.dtrelE, tables.djntE, extra2, tables.ancT]
        s_out_shape.append(
            jax.ShapeDtypeStruct((3 * E, J, Fp), jnp.float32))
        s_out.append(pl.BlockSpec((3 * E, J, BF), lambda fi: (0, 0, fi),
                                  memory_space=pltpu.VMEM))
    smalls = pl.pallas_call(
        smalls_kern,
        grid=(nf,),
        out_shape=s_out_shape,
        in_specs=s_in,
        out_specs=s_out,
        interpret=interpret,
    )(*s_args)

    m_in = [
        pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((27, J, BF), lambda fi, mi: (0, 0, fi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((featN, BF), lambda fi, mi: (0, fi),
                     memory_space=pltpu.VMEM),
    ]
    m_args = list(smalls)
    if E:
        m_in.append(pl.BlockSpec((3 * E, J, BF), lambda fi, mi: (0, 0, fi),
                                 memory_space=pltpu.VMEM))
    m_in.append(pl.BlockSpec((3, BF), lambda fi, mi: (0, fi),
                             memory_space=pltpu.VMEM))
    m_args.append(trans2)
    if E:
        m_in.append(pl.BlockSpec((E, BF), lambda fi, mi: (0, fi),
                                 memory_space=pltpu.VMEM))
        m_args.append(extra2)
    m_in += [
        cspec(), cspec(),
        pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RB, pdN), lambda fi, mi: (mi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J1, 128), lambda fi, mi: (0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((CB, 3), lambda fi, mi: (mi, 0),
                     memory_space=pltpu.VMEM),
    ]
    m_args += [tables.ancT, tables.hc, tables.wT, tables.sT,
               tables.vshT, tables.pdrow, tables.pdJ, tables.cf]
    if E:
        m_in.append(pl.BlockSpec((3 * E, 128), lambda fi, mi: (0, mi),
                                 memory_space=pltpu.VMEM))
        m_args.append(tables.dvE)
    m_in.append(pl.BlockSpec((CB, BF), lambda fi, mi: (mi, fi),
                             memory_space=pltpu.VMEM))
    m_args.append(wo)
    rw_t, jm_t = pl.pallas_call(
        marker_kern,
        grid=(nf, M),
        out_shape=[
            jax.ShapeDtypeStruct((M, 3, Fp), jnp.float32),
            jax.ShapeDtypeStruct((M * 3, D, Fp), jnp.float32),
        ],
        in_specs=m_in,
        out_specs=[
            pl.BlockSpec((1, 3, BF), lambda fi, mi: (mi, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, D, BF), lambda fi, mi: (mi, 0, fi),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(*m_args)
    rw = rw_t.transpose(2, 0, 1)[:F]
    jw = jm_t.reshape(M, 3, D, Fp).transpose(3, 0, 1, 2)[:F]
    return rw, jw
