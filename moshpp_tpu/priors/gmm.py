"""Max-mixture GMM pose prior (reference: `prior/gmm_prior_ch.py:42-134`).

The prior residual for pose x is the Mahalanobis whitening of the single
most-likely mixture component (selected by min energy - log weight), plus a
constant sqrt(-log w) row so the least-squares energy equals the mixture
negative log-likelihood up to a constant:

  r_k(x) = sqrt(0.5) * (x - mu_k) @ chol(prec_k)
  k*     = argmin_k |r_k|^2 - log w_k          (switching, stop-gradiented)
  r(x)   = concat(r_{k*}(x), sqrt(-log w_{k*}))

The component switch is recomputed every solver iteration, exactly like
chumpy's on_changed hook (gmm_prior_ch.py:59-62).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaxMixturePrior:
    means: jnp.ndarray      # (K, D)
    chols: jnp.ndarray      # (K, D, D) cholesky factors of the precisions
    sqrt_neg_log_w: jnp.ndarray  # (K,)

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    @property
    def residual_dim(self) -> int:
        return self.means.shape[1] + 1


def gmm_prior_residual(prior: MaxMixturePrior, x: jnp.ndarray) -> jnp.ndarray:
    """Residual vector (D+1,) for pose slice x (D,).

    The argmin component selection runs entirely under stop_gradient, and the
    differentiable path whitens against the *selected* component only — so
    forward-mode tangents cost one DxD matvec, not K of them (the solver
    evaluates this inside jacfwd with O(100) tangent directions).
    """
    xs = jax.lax.stop_gradient(x)
    diff_all = xs[None, :] - prior.means                  # (K, D), no tangents
    r_all = jnp.einsum("kd,kde->ke", diff_all, prior.chols)
    energies = 0.5 * jnp.sum(r_all * r_all, axis=-1) + prior.sqrt_neg_log_w ** 2
    k = jnp.argmin(energies)

    r = jnp.sqrt(0.5) * ((x - prior.means[k]) @ prior.chols[k])
    return jnp.concatenate([r, prior.sqrt_neg_log_w[k][None]])


def _from_moments(means: np.ndarray, covars: np.ndarray,
                  weights: np.ndarray) -> MaxMixturePrior:
    """Builds the prior from raw mixture moments, normalizing weights the way
    the reference does (gmm_prior_ch.py:122-132): divide by the Gaussian
    normalizer ratio so the per-component constant is comparable."""
    precs = np.linalg.inv(covars)
    chols = np.linalg.cholesky(precs)
    sqrdets = np.sqrt(np.linalg.det(covars))
    npose = means.shape[1]
    const = (2 * np.pi) ** (npose / 2.0)
    w = np.asarray(weights, np.float64).ravel()
    w = w / (const * (sqrdets / sqrdets.min()))
    w = np.clip(w, 1e-300, 1.0 - 1e-16)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return MaxMixturePrior(means=f32(means), chols=f32(chols),
                           sqrt_neg_log_w=f32(np.sqrt(-np.log(w))))


def load_gmm_prior(fname: str, npose: Optional[int] = None) -> MaxMixturePrior:
    """Load a mixture prior file.

    Accepts the reference's pose_body_prior.pkl dict format
    ({'covars','means','weights'}, gmm_prior_ch.py:118-120), sklearn-GMM
    attribute pickles (means_/covars_/weights_, :151-153), the dog prior dict
    (gmm_means/gmm_covs/gmm_weights, dog_body_prior.py:69-71) and npz.
    `npose`: truncate to the leading npose dims (63 excludes hands,
    gmm_prior_ch.py:116).
    """
    if fname.endswith(".npz"):
        gmm = dict(np.load(fname, allow_pickle=True))
    else:
        with open(fname, "rb") as f:
            gmm = pickle.load(f, encoding="latin-1")
    if hasattr(gmm, "means_"):
        means, covars, weights = gmm.means_, gmm.covars_, gmm.weights_
    else:
        key = lambda *ks: next(gmm[k] for k in ks if k in gmm)
        means = key("means", "gmm_means")
        covars = key("covars", "gmm_covs", "covs")
        weights = key("weights", "gmm_weights")
    means, covars = np.asarray(means), np.asarray(covars)
    if npose is not None:
        means = means[:, :npose]
        covars = covars[:, :npose, :npose]
    return _from_moments(means, covars, np.asarray(weights))


def make_gmm_prior(dim: int, num_components: int = 8,
                   seed: int = 0, scale: float = 0.2) -> MaxMixturePrior:
    """Synthetic prior for tests/benchmarks (means near zero pose, diagonal-ish
    covariances) — stands in for the license-gated AMASS pose prior."""
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(num_components, dim)) * scale * 0.5
    covars = []
    for _ in range(num_components):
        a = rng.normal(size=(dim, dim)) * 0.1
        covars.append(scale ** 2 * (np.eye(dim) + a @ a.T))
    weights = rng.dirichlet(np.ones(num_components))
    return _from_moments(means, np.stack(covars), weights)


def sample_gmm_prior(prior: MaxMixturePrior, rng: np.random.Generator,
                     n: int) -> np.ndarray:
    """Draw n pose slices from the mixture the prior models.

    For synthetic benchmarks/tests the ground-truth poses must come from the
    SAME distribution the prior was fit to — exactly as real mocap poses come
    from the distribution of the reference's AMASS-trained prior. Feeding the
    solver poses from an unrelated distribution makes the prior adversarial
    and the objective's optimum genuinely moves off the ground truth (the
    round-4 stage-i bench measured a 20 mm 'error' that was entirely this).

    chols are cholesky factors L of the PRECISIONS (P = L L^T), so a sample
    is mean + L^{-T} z with z ~ N(0, I).
    """
    import scipy.linalg

    means = np.asarray(prior.means, np.float64)
    chols = np.asarray(prior.chols, np.float64)
    K, D = means.shape
    # sqrt_neg_log_w stores sqrt(-log w~) of weights divided by the
    # PER-COMPONENT normalizer const * sqrdet_k / sqrdet_min (_from_moments,
    # mirroring gmm_prior_ch.py:126-130). Recover the plain mixture weights
    # by multiplying the per-component factor back: sqrdet_k = sqrt(det cov_k)
    # = 1/|det L_k| = 1/prod(diag(chols[k])) since chols are precision
    # factors. The constant factors (const, sqrdet_min) cancel in the
    # normalization below.
    w_stored = np.exp(-np.asarray(prior.sqrt_neg_log_w, np.float64) ** 2)
    sqrdet = 1.0 / np.abs(
        np.prod(np.diagonal(chols, axis1=1, axis2=2), axis=1))
    w = w_stored * sqrdet
    w = w / w.sum()
    comps = rng.choice(K, size=n, p=w)
    z = rng.standard_normal((n, D))
    out = np.empty((n, D), np.float64)
    for i, k in enumerate(comps):
        out[i] = means[k] + scipy.linalg.solve_triangular(
            chols[k].T, z[i], lower=False)
    return out.astype(np.float32)


def save_gmm_prior_pkl(prior_moments: dict, fname: str) -> None:
    """Write a prior in the reference pkl dict convention for fixtures."""
    with open(fname, "wb") as f:
        pickle.dump(prior_moments, f)
