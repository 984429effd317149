"""Rigid 6-DoF object model (reference: `models/object_model.py:39-57`).

v = R(pose) @ v0 + trans — used to MoSh scanned rigid props (e.g. GRAB
objects) with the same solver machinery as bodies.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.ops.rodrigues import rodrigues


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidObjectModel:
    v_template: jnp.ndarray  # (V, 3)
    faces: jnp.ndarray       # (F, 3) int32

    @property
    def pose_dof(self) -> int:
        return 3

    def subset(self, vids) -> "RigidObjectModel":
        return dataclasses.replace(self, v_template=self.v_template[np.asarray(vids)])


def rigid_object_forward(model: RigidObjectModel,
                         pose: jnp.ndarray,
                         trans: jnp.ndarray) -> jnp.ndarray:
    """Posed object vertices. Note the reference right-multiplies
    (`v0 @ R`, object_model.py:50); we keep the common `R @ v0` convention —
    the solved pose differs by a transpose, the fitted surface is identical.
    """
    rot = rodrigues(pose)
    return model.v_template @ rot.T + trans
