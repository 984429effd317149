"""Graphical-lasso pose prior (legacy, reference: `prior/gm_prior_ch.py`).

Fits a sparse-precision Gaussian to a pose corpus per subject and exposes a
Mahalanobis whitening residual. Uses sklearn's GraphicalLassoCV when
available, falling back to a shrinkage empirical precision.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from moshpp_tpu.priors.mahalanobis import MahalanobisPrior


def fit_graphical_lasso_prior(pose_samples: np.ndarray,
                              use_sklearn: bool = True) -> MahalanobisPrior:
    """pose_samples: (N, D) corpus of poses; returns a whitening prior whose
    residual is (x - mean) @ chol(precision)."""
    import jax.numpy as jnp
    mean = pose_samples.mean(axis=0)
    prec = None
    if use_sklearn:
        try:
            from sklearn.covariance import GraphicalLassoCV
            gl = GraphicalLassoCV().fit(pose_samples)
            prec = gl.precision_
        except Exception:
            prec = None
    if prec is None:
        cov = np.cov(pose_samples.T) + 1e-4 * np.eye(pose_samples.shape[1])
        prec = np.linalg.inv(cov)
    chol = np.linalg.cholesky(prec)
    return MahalanobisPrior(mean=jnp.asarray(mean, jnp.float32),
                            prec=jnp.asarray(chol, jnp.float32))
