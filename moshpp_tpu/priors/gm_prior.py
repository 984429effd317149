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


class SubjectPriorCache:
    """Per-subject graphical-lasso priors with the reference's cache
    semantics (`gm_prior_ch.py:45-78`): a 'Generic' prior fitted over the
    whole corpus, plus lazily-fitted per-subject priors built from the
    samples whose names contain the subject id — falling back to Generic
    when fewer than `min_samples` match.
    """

    def __init__(self, pose_samples: np.ndarray, sample_names,
                 min_samples: int = 3, use_sklearn: bool = True):
        self._samples = np.asarray(pose_samples)
        self._names = [str(n).lower() for n in sample_names]
        self._min = min_samples
        self._sk = use_sklearn
        self._cache = {"Generic": fit_graphical_lasso_prior(
            self._samples, use_sklearn=use_sklearn)}

    def __getitem__(self, subject_id: str) -> MahalanobisPrior:
        if subject_id not in self._cache:
            sel = [i for i, n in enumerate(self._names)
                   if subject_id.lower() in n]
            if len(sel) < self._min:
                self._cache[subject_id] = self._cache["Generic"]
            else:
                self._cache[subject_id] = fit_graphical_lasso_prior(
                    self._samples[sel], use_sklearn=self._sk)
        return self._cache[subject_id]
