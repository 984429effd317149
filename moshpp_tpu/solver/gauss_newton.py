"""Batched dogleg trust-region Gauss-Newton solver.

This replaces chumpy's `ch.minimize(method='dogleg')` — the inner hot loop of
every MoSh stage (reference `chmosh.py:231, 410-415, 651-653, 669-671,
703-705`). Where chumpy assembles sparse Jacobians node-by-node on the CPU,
here the whole residual is one traced function, J comes from `jax.jacfwd`
(residual dims are O(100-1000), parameter dims O(60-1000) — forward mode,
dense, MXU-shaped), the normal equations are a tiny Cholesky, and the
iteration is a `lax.while_loop`, so `jax.vmap` solves thousands of mocap
frames in lockstep on one chip.

Conventions match the reference solver's knobs:
  * cost f(x) = |r(x)|^2  (plain sum of squares, like chumpy's printouts)
  * `e_3`: relative-improvement stop — stop when an accepted step improves f
    by less than e_3 * f (chumpy dogleg's e_3 option).
  * `delta_0`: initial trust-region radius; `maxiter` iteration cap.
Frozen parameters are handled with a binary mask folded into the normal
equations (identity rows/cols), so changing free-variable subsets across
annealing steps (chmosh.py:386-406) never retraces with new shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DoglegOptions:
    maxiter: int = 100
    e_3: float = 1e-3          # relative improvement stop (chumpy's e_3)
    delta_0: float = 0.5       # initial trust radius
    delta_max: float = 100.0
    min_delta: float = 1e-10
    accept_ratio: float = 1e-4  # minimum rho to accept a step
    damping: float = 1e-8      # Tikhonov floor on the normal equations
    f_atol: float = 1e-20      # absolute cost floor — stop when |r|^2 below
    g_rtol: float = 1e-7       # gradient stop: |g| <= g_rtol * (1 + f)
    # linear solver for the Gauss-Newton system:
    #   'cholesky'       exact, but TPU factorizations are sequential-panel
    #                    latency-bound for O(100)-dim batched systems
    #   'newton_schulz'  Jacobi-preconditioned iterative inverse — pure
    #                    batched matmuls (MXU), warm-started across dogleg
    #                    iterations; inexact steps are safeguarded by the
    #                    trust-region rho test
    linear_solver: str = "cholesky"
    ns_steps: int = 4          # Newton-Schulz refinement steps per iteration
    # matmul precision for the Jacobian/normal-equation assembly. 'highest'
    # = full f32 (6-pass); 'high' (3-pass) halves Jacobian cost with ~1e-5
    # relative error — ample for GN *directions* (the trust region guards
    # step quality; run the final polish phase at 'highest').
    jac_precision: str = "highest"


class SolveResult(NamedTuple):
    x: jnp.ndarray          # final parameters
    cost: jnp.ndarray       # final |r|^2
    iterations: jnp.ndarray
    converged: jnp.ndarray  # stopped on e_3 (vs maxiter/stalled radius)


class _State(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    f: jnp.ndarray
    delta: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray
    xinv: jnp.ndarray   # (P, P) warm Newton-Schulz inverse (unused: (0, 0))


def _gn_direction_cholesky(g, B):
    """Exact Gauss-Newton direction via Cholesky. Returns (p_gn, ok)."""
    P = g.shape[0]
    eye = jnp.eye(P, dtype=g.dtype)
    L = jnp.linalg.cholesky(B)
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, eye)
    y = jax.scipy.linalg.solve_triangular(L, g, lower=True)
    p_gn = -jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)
    return jnp.where(ok, p_gn, jnp.zeros_like(g)), ok


def _gn_direction_newton_schulz(g, B, xinv, ns_steps):
    """Approximate GN direction via a warm-started Newton-Schulz inverse of
    the Jacobi-preconditioned system. Pure batched matmuls.

    Returns (p_gn, ok, xinv_new). The inverse is of Bt = D B D with
    D = diag(B)^-1/2; across dogleg iterations B changes smoothly (and not at
    all on rejected steps), so a few refinement steps per iteration keep the
    inverse tracking. When the warm inverse has diverged, restart from the
    guaranteed-contractive init Bt^T / (|Bt|_1 |Bt|_inf).
    """
    P = g.shape[0]
    eye = jnp.eye(P, dtype=g.dtype)
    d = jax.lax.rsqrt(jnp.clip(jnp.diagonal(B), 1e-12, None))
    Bt = (d[:, None] * B) * d[None, :]
    gt = d * g

    resid = eye - xinv @ Bt
    bad = (jnp.sum(resid * resid) > 0.25 * P) | ~jnp.all(jnp.isfinite(xinv))
    x0_safe = Bt.T / (jnp.max(jnp.sum(jnp.abs(Bt), axis=0))
                      * jnp.max(jnp.sum(jnp.abs(Bt), axis=1)) + 1e-12)
    X = jnp.where(bad, x0_safe, xinv)
    for _ in range(ns_steps):
        X = X @ (2.0 * eye - Bt @ X)

    p_gn = -(d * (X @ gt))
    # quality gate: direction must be descent and the inverse residual small
    resid2 = eye - X @ Bt
    ok = (jnp.sum(resid2 * resid2) < 0.01 * P) & (g @ p_gn < 0) \
        & jnp.all(jnp.isfinite(p_gn))
    return jnp.where(ok, p_gn, jnp.zeros_like(g)), ok, X


def _dogleg_step(g, B, delta, damping, xinv, linear_solver, ns_steps):
    """Dogleg step p minimizing the quadratic model within |p| <= delta.

    g: (P,) gradient of 0.5-model (here Jᵀr); B: (P,P) Gauss-Newton Hessian.
    Returns (p (P,), xinv_new).
    """
    P = g.shape[0]
    eye = jnp.eye(P, dtype=g.dtype)
    trace = jnp.trace(B)
    lam = damping * (trace / P + 1.0)
    B = B + lam * eye

    if linear_solver == "newton_schulz":
        p_gn, ok, xinv = _gn_direction_newton_schulz(g, B, xinv, ns_steps)
    else:
        p_gn, ok = _gn_direction_cholesky(g, B)
    gn_norm = jnp.where(ok, jnp.linalg.norm(p_gn), jnp.inf)

    # Cauchy (steepest-descent) point
    gBg = g @ (B @ g) + 1e-30
    gg = g @ g
    p_sd = -(gg / gBg) * g
    sd_norm = jnp.linalg.norm(p_sd)

    # regions: GN inside radius | blend on the dogleg path | scaled SD
    def on_segment():
        d = p_gn - p_sd
        a = d @ d + 1e-30
        b = 2.0 * (p_sd @ d)
        c = p_sd @ p_sd - delta * delta
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        t = (-b + jnp.sqrt(disc)) / (2.0 * a)
        return p_sd + jnp.clip(t, 0.0, 1.0) * d

    p = jnp.where(
        (gn_norm <= delta) & ok,
        p_gn,
        jnp.where(sd_norm >= delta,
                  p_sd * (delta / (sd_norm + 1e-30)),
                  jnp.where(ok, on_segment(), p_sd)),
    )
    return p, xinv


def dogleg_solve(residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
                 x0: jnp.ndarray,
                 options: DoglegOptions = DoglegOptions(),
                 param_mask: Optional[jnp.ndarray] = None,
                 e_3=None) -> SolveResult:
    """Minimize |residual_fn(x)|^2 from x0 with dogleg trust-region GN.

    Args:
      residual_fn: x (P,) -> r (R,), shape-static, jit-traceable.
      param_mask: optional (P,) {0,1} — zero entries are frozen at x0.
      e_3: optional traced scalar overriding options.e_3 — lets one compiled
        solve be reused across phases with different stopping tolerances.

    Fully traceable: wrap in jit and/or vmap at the call site.
    """
    opts = options
    e_3 = opts.e_3 if e_3 is None else e_3
    P = x0.shape[0]
    mask = jnp.ones(P, x0.dtype) if param_mask is None else param_mask.astype(x0.dtype)

    jac_fn = jax.jacfwd(residual_fn)

    def cond(s: _State):
        return jnp.logical_and(~s.done, s.it < opts.maxiter)

    def body(s: _State) -> _State:
        with jax.default_matmul_precision(opts.jac_precision):
            J = jac_fn(s.x) * mask[None, :]
            g = J.T @ s.r
            B = J.T @ J
        # freeze masked params exactly: identity rows/cols, zero gradient
        B = B * (mask[:, None] * mask[None, :]) + jnp.diag(1.0 - mask)

        p, xinv = _dogleg_step(g, B, s.delta, opts.damping, s.xinv,
                               opts.linear_solver, opts.ns_steps)
        p = p * mask
        x_new = s.x + p
        r_new = residual_fn(x_new)
        f_new = r_new @ r_new

        pred = -(2.0 * (g @ p) + p @ (B @ p))  # model reduction of f = rᵀr
        actual = s.f - f_new
        rho = actual / jnp.maximum(pred, 1e-30)

        p_norm = jnp.linalg.norm(p)
        accept = (rho > opts.accept_ratio) & jnp.isfinite(f_new)
        # trust-region update (standard Nocedal-Wright schedule)
        delta = jnp.where(
            rho < 0.25,
            0.25 * p_norm,
            jnp.where((rho > 0.75) & (p_norm >= 0.99 * s.delta),
                      jnp.minimum(2.0 * s.delta, opts.delta_max),
                      s.delta),
        )
        delta = jnp.maximum(delta, opts.min_delta)

        x = jnp.where(accept, x_new, s.x)
        r = jnp.where(accept, r_new, s.r)
        f = jnp.where(accept, f_new, s.f)

        small_improvement = accept & (actual < e_3 * jnp.maximum(s.f, 1e-30))
        tiny_cost = f <= opts.f_atol
        tiny_grad = jnp.linalg.norm(g) <= opts.g_rtol * (1.0 + s.f)
        stalled = (~accept) & (delta <= opts.min_delta * 1.001)
        done = small_improvement | stalled | tiny_cost | tiny_grad

        # under vmap the loop runs until ALL batch elements finish; freeze
        # finished problems so extra iterations cannot perturb their results
        frozen = s.done
        x = jnp.where(frozen, s.x, x)
        r = jnp.where(frozen, s.r, r)
        f = jnp.where(frozen, s.f, f)
        delta = jnp.where(frozen, s.delta, delta)
        it = jnp.where(frozen, s.it, s.it + 1)
        return _State(
            x=x, r=r, f=f, delta=delta, it=it, done=s.done | done,
            converged=s.converged | (~frozen & (small_improvement | tiny_cost | tiny_grad)),
            xinv=xinv)

    # Gauss-Newton needs full f32 mantissas: TPU matmuls default to bf16
    # inputs, which stalls convergence at ~mm error. The context applies to
    # every op traced inside (residuals, jacfwd tangents, normal equations).
    xinv0_dim = P if opts.linear_solver == "newton_schulz" else 0
    with jax.default_matmul_precision("highest"):
        r0 = residual_fn(x0)
        s0 = _State(x=x0, r=r0, f=r0 @ r0,
                    delta=jnp.asarray(opts.delta_0, x0.dtype),
                    it=jnp.asarray(0, jnp.int32),
                    done=jnp.asarray(False),
                    converged=jnp.asarray(False),
                    xinv=jnp.zeros((xinv0_dim, xinv0_dim), x0.dtype))
        s = jax.lax.while_loop(cond, body, s0)
    return SolveResult(x=s.x, cost=s.f, iterations=s.it, converged=s.converged)


def batched_dogleg_solve(residual_fn: Callable[..., jnp.ndarray],
                         x0: jnp.ndarray,
                         aux,
                         options: DoglegOptions = DoglegOptions(),
                         param_mask: Optional[jnp.ndarray] = None,
                         e_3=None) -> SolveResult:
    """vmap of `dogleg_solve` over a leading batch axis.

    Args:
      residual_fn: (x (P,), aux_slice) -> r (R,). `aux` is any pytree whose
        leaves carry a leading batch dim (per-frame markers, masks, anchors…).
      x0: (N, P) initial parameters.
      param_mask: optional (P,) shared across the batch or (N, P) per-problem.

    The while_loop inside vmap becomes a single batched loop: every frame
    iterates until *all* frames converge, with per-frame done-masking — the
    TPU-friendly shape (no recompilation, no host sync per frame).
    """
    def solve_one(x0_i, aux_i, mask_i):
        return dogleg_solve(lambda x: residual_fn(x, aux_i), x0_i,
                            options=options, param_mask=mask_i, e_3=e_3)

    if param_mask is None:
        mask = jnp.ones_like(x0)
    elif param_mask.ndim == 1:
        mask = jnp.broadcast_to(param_mask[None, :], x0.shape)
    else:
        mask = param_mask
    return jax.vmap(solve_one)(x0, aux, mask)
