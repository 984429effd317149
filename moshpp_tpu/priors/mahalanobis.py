"""Mahalanobis-style animal pose priors (reference:
`prior/horse_body_prior.py:40-71`, `prior/dog_body_prior.py`).
"""

from __future__ import annotations

import dataclasses
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from moshpp_tpu.priors.gmm import MaxMixturePrior, load_gmm_prior


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MahalanobisPrior:
    mean: jnp.ndarray   # (D,)
    prec: jnp.ndarray   # (D, D) precision (or its square-root) matrix


def mahalanobis_residual(prior: MahalanobisPrior, x: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) @ prec — matches smal_horse_prior (horse_body_prior.py:49-50)."""
    return (x - prior.mean) @ prior.prec


def load_horse_prior(fname: str, disable_tail_mouth_ear: bool = True) -> MahalanobisPrior:
    with open(fname, "rb") as f:
        res = pickle.load(f, encoding="latin-1")
    n = 81 if disable_tail_mouth_ear else None
    prec = np.asarray(res["pic"])[:n, :n]
    mean = np.asarray(res["mean_pose"])[:n]
    return MahalanobisPrior(mean=jnp.asarray(mean, jnp.float32),
                            prec=jnp.asarray(prec, jnp.float32))


# 90-degree leg-bend exponential penalty dof (horse_body_prior.py:62-63),
# indices into the rootless body pose
_HORSE_ANGLE_IDS = np.array([6, 7, 8, 11, 12, 13, 20, 21, 22, 25, 26, 27]) - 3


def horse_joint_angle_residual(pose_body: jnp.ndarray) -> jnp.ndarray:
    """exp(angle)^2 penalty on the 12 leg-bend dof (horse_body_prior.py:67-69)."""
    return jnp.exp(pose_body[_HORSE_ANGLE_IDS]) ** 2


# dog GMM is over a 31-joint subset (dog_body_prior.py:56-58)
_DOG_JOINT_IDS = [1, 3, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                  20, 21, 22, 23, 24, 25, 26, 27, 28, 30, 31, 32, 33, 34]
DOG_POSE_IDS = np.arange(105).reshape(-1, 3)[_DOG_JOINT_IDS].reshape(-1)


def load_dog_prior(fname: str) -> MaxMixturePrior:
    """Max-mixture prior over the dog pose subset; apply to
    fullpose[DOG_POSE_IDS]."""
    return load_gmm_prior(fname)
