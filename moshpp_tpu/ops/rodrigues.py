"""Axis-angle <-> rotation-matrix conversion, safe at theta -> 0.

Replaces the reference's cv2.Rodrigues calls (rigid_transformations.py:82) and
the chumpy Rodrigues node used inside the LBS graph, with jit/vmap/jacfwd-safe
closed forms.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rodrigues(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors (..., 3) -> rotation matrices (..., 3, 3).

    Uses the quaternion formulation, which is differentiable through
    theta = 0 (sin(t/2)/t and cos(t/2) are even/analytic in t so the
    sqrt(theta^2 + eps) guard does not bias gradients near zero).
    """
    rotvec = jnp.asarray(rotvec)
    theta_sq = jnp.sum(rotvec * rotvec, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + _EPS)
    half = 0.5 * theta
    # quaternion (w, xyz)
    w = jnp.cos(half)
    xyz = rotvec * (jnp.sin(half) / theta)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    w = w[..., 0]

    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z

    rot = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return rot.reshape(rotvec.shape[:-1] + (3, 3))


def rodrigues_inverse(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle vectors (..., 3).

    Stable for angles in (0, pi); at exactly pi the axis sign is arbitrary.
    """
    rot = jnp.asarray(rot)
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_theta)

    # antisymmetric part gives axis * sin(theta)
    axis_sin = 0.5 * jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)[..., None]
    small = jnp.abs(sin_theta) < 1e-6
    # near theta=0: axis_sin ~ axis*theta, so rotvec ~ axis_sin; near pi use
    # the diagonal formulation.
    scale = jnp.where(small, 1.0, theta[..., None] / jnp.where(small, 1.0, sin_theta))
    rotvec_generic = axis_sin * scale

    # theta ~ pi branch: axis^2 from diagonal of (R + I)/2
    diag = jnp.stack([rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None))
    axis_pi = axis_abs * jnp.where(axis_sin >= 0, 1.0, -1.0)
    rotvec_pi = axis_pi * theta[..., None]

    near_pi = (jnp.pi - theta)[..., None] < 1e-4
    return jnp.where(near_pi, rotvec_pi, rotvec_generic)


def axis_angle_to_quat(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> unit quaternion (..., 4) as (w, xyz).
    Analytic through theta = 0 (same guard as `rodrigues`)."""
    rotvec = jnp.asarray(rotvec)
    theta = jnp.sqrt(jnp.sum(rotvec * rotvec, axis=-1, keepdims=True) + _EPS)
    half = 0.5 * theta
    return jnp.concatenate([jnp.cos(half), rotvec * (jnp.sin(half) / theta)],
                           axis=-1)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) (w, xyz) -> axis-angle (..., 3)."""
    q = jnp.asarray(q)
    # canonicalize sign so w >= 0 (theta in [0, pi])
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True) + _EPS)
    theta = 2.0 * jnp.arctan2(sin_half, w)
    return xyz * (theta / sin_half)


def slerp_axis_angle(a: jnp.ndarray, b: jnp.ndarray,
                     alpha: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation between axis-angle rotations (..., 3).

    alpha broadcasts over the leading dims. Unlike linear interpolation of
    axis-angle vectors (wrong for large inter-anchor rotations — e.g. fast
    spins between stage-ii warm-start anchors), slerp follows the geodesic.
    """
    qa = axis_angle_to_quat(a)
    qb = axis_angle_to_quat(b)
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = qb * jnp.where(dot < 0, -1.0, 1.0)      # shorter arc
    dot = jnp.clip(jnp.abs(dot), -1.0, 1.0)
    omega = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
    so = jnp.sin(omega)
    # small-angle fallback: lerp + normalize (nlerp) is exact in the limit
    small = so < 1e-4
    wa = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * omega) / jnp.where(small, 1.0, so))
    wb = jnp.where(small, alpha, jnp.sin(alpha * omega) / jnp.where(small, 1.0, so))
    q = wa * qa + wb * qb
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + _EPS)
    return quat_to_axis_angle(q)
