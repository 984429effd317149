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


def object_as_surface_model(obj: RigidObjectModel, num_betas: int = 1):
    """Embed a rigid object as a degenerate one-joint `SurfaceModel`
    (rotation about the origin + translation == the 6-DoF object model), so
    the stage-ii solver, marker transport and sharding apply unchanged."""
    from moshpp_tpu.models.body_model import SurfaceModel

    V = obj.v_template.shape[0]
    z = jnp.zeros
    return SurfaceModel(
        v_template=obj.v_template,
        shapedirs=z((V, 3, num_betas), jnp.float32),
        posedirs=z((V, 3, 0), jnp.float32),
        weights=jnp.ones((V, 1), jnp.float32),
        joint_template=z((1, 3), jnp.float32),
        joint_shapedirs=z((1, 3, num_betas), jnp.float32),
        hands_components=z((0, 0), jnp.float32),
        hands_mean=z((0,), jnp.float32),
        faces=obj.faces,
        model_type="object",
        parents=(-1,),
        num_betas=num_betas,
        dof_per_hand=0,
    )


def load_rigid_object(ply_fname: str) -> RigidObjectModel:
    """Load a scanned object mesh (object_model.py:42-48)."""
    from moshpp_tpu.io.ply import read_ply
    v, f = read_ply(ply_fname)
    return RigidObjectModel(
        v_template=jnp.asarray(v, jnp.float32),
        faces=jnp.asarray(f if f is not None else np.zeros((0, 3)), jnp.int32))
