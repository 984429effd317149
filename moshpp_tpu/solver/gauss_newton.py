"""Batched dogleg trust-region Gauss-Newton solver.

This replaces chumpy's `ch.minimize(method='dogleg')` — the inner hot loop of
every MoSh stage (reference `chmosh.py:231, 410-415, 651-653, 669-671,
703-705`). Where chumpy assembles sparse Jacobians node-by-node on the CPU,
here the Gauss-Newton system is one traced function and the iteration is a
single batched `lax.while_loop`, so thousands of mocap frames solve in
lockstep on one chip.

Two ways to provide the problem:

  * `residual_fn`: x -> r. J comes from `jax.jacfwd`, the system from JᵀJ.
    The generic path (stage-i, tests, small problems).
  * `system`: a `GNSystem(system_fn, cost_fn)` where system_fn(x, aux) ->
    (f, g, B) assembles the cost, gradient (Jᵀr) and GN Hessian (JᵀJ)
    directly — used by stage-ii with closed-form LBS Jacobians
    (ops/lbs_jacobian.py) and analytic prior/regularizer blocks, which is
    several times cheaper than autodiff J + explicit row stacking.

Linear solver for the GN direction:

  * 'cholesky' — exact. TPU batched factorizations are sequential-panel
    latency-bound: ~24 ms/iter for 1024 x (117-dim) systems on v5e — the
    single most expensive op in the solve.
  * 'pcg' — Jacobi-preconditioned conjugate gradient, fixed iteration count,
    warm-started from the previous accepted direction. Pure batched matvecs
    (MXU/VPU shaped); inexact steps are safeguarded by the trust-region rho
    test (the dogleg geometry only requires a descent direction). ~3-9
    ms/iter for the same batch. This supersedes the round-1 Newton-Schulz
    experiment, which could not be made trustworthy (divergent warm starts).

Conventions match the reference solver's knobs:
  * cost f(x) = |r(x)|^2  (plain sum of squares, like chumpy's printouts)
  * `e_3`: relative-improvement stop — stop when an accepted step improves f
    by less than e_3 * f (chumpy dogleg's e_3 option).
  * `delta_0`: initial trust-region radius; `maxiter` iteration cap.
Frozen parameters are handled with a binary mask folded into the normal
equations (identity rows/cols), so changing free-variable subsets across
annealing steps (chmosh.py:386-406) never retraces with new shapes.

Straggler compaction (`batched_system_solve`): a batched while_loop runs
until *all* problems converge, so every frame pays for the slowest one. The
compacted driver runs the full batch only while many problems are active,
then argsort-gathers the unconverged ones into a statically-shaped bucket
(F/4, then F/16) and finishes them there — entirely in-graph (no host sync),
so it works inside jit, under shard_map, and per-shard on a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

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
    linear_solver: str = "cholesky"  # 'cholesky' | 'pcg'
    cg_iters: int = 24         # PCG iteration count (static, done-masked)
    # 'auto': in the batched path on TPU the PCG direction runs as a Pallas
    # kernel (solver/pallas_pcg.py — B resident in VMEM, frames in lanes,
    # ~6x the XLA batched-matvec chain); 'xla' forces the matvec chain;
    # 'pallas' forces the kernel (interpret mode off TPU — test-only).
    pcg_backend: str = "auto"
    # matmul precision for the Jacobian/normal-equation assembly. 'highest'
    # = full f32 (6-pass); 'high' (3-pass) halves Jacobian cost with ~1e-5
    # relative error — ample for GN *directions* (the trust region guards
    # step quality; run the final polish phase at 'highest').
    jac_precision: str = "highest"


class GNSystem(NamedTuple):
    """Problem spec for the direct-assembly path.

    system_fn(x, aux) -> (f, g, B): cost |r|^2, gradient Jᵀr (P,), GN
    Hessian JᵀJ (P, P) — all terms included.
    cost_fn(x, aux) -> f: cost only (for trial-point evaluation).
    system_fn_batched: optional (x (N,P), aux) -> batched (f, g, B) —
      used by `batched_system_solve` instead of vmapping `system_fn` when
      the assembly is inherently batched (e.g. the Pallas marker-Jacobian
      kernel, whose frame axis lives in the lane dimension).
    cost_fn_batched: optional (x (N,P), aux) -> (N,) costs, same idea for
      trial-point evaluation (the Pallas sim-only kernel).
    b_frame_minor: when True, system_fn_batched returns B FRAME-MINOR as
      (D, D, N) — the exact layout the fused Pallas direction kernel keeps
      resident in VMEM — so the assembly's (N, D, D) -> (D, D, N) relayout
      (a full HBM round-trip of B per iteration) never happens. Fallback
      paths (XLA PCG, vmapped per-frame step) transpose it back.
    """
    system_fn: Callable
    cost_fn: Callable
    system_fn_batched: Optional[Callable] = None
    cost_fn_batched: Optional[Callable] = None
    b_frame_minor: bool = False


class SolveResult(NamedTuple):
    x: jnp.ndarray          # final parameters
    cost: jnp.ndarray       # final |r|^2
    iterations: jnp.ndarray
    converged: jnp.ndarray  # stopped on e_3 (vs maxiter/stalled radius)


class _State(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    delta: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray
    plin: jnp.ndarray   # (P,) previous GN direction (PCG warm start)


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


def _gn_direction_pcg(g, B, plin, iters):
    """Approximate GN direction via Jacobi-preconditioned CG on B p = -g.

    Fixed `iters` matvecs (batched matmuls — no factorization). Warm-started
    from the previous accepted direction when that is a better initial guess
    than zero. Breakdown (non-positive curvature from round-off) freezes the
    iterate; the returned direction is always the best one seen.
    """
    rhs = -g
    dinv = 1.0 / jnp.clip(jnp.diagonal(B), 1e-12, None)

    # warm start only if it reduces the residual vs x0 = 0
    r_warm = rhs - B @ plin
    use_warm = (r_warm @ r_warm < rhs @ rhs) & jnp.all(jnp.isfinite(plin))
    x = jnp.where(use_warm, plin, jnp.zeros_like(g))
    r = jnp.where(use_warm, r_warm, rhs)

    z = dinv * r
    p = z
    rz = r @ z
    rz0 = jnp.maximum(rz, 1e-30)
    active = rz > 0

    def body(carry):
        x, r, z, p, rz, active = carry
        Bp = B @ p
        pBp = p @ Bp
        step_ok = active & (pBp > 1e-30) & (rz > 1e-12 * rz0)
        alpha = jnp.where(step_ok, rz / jnp.where(pBp > 0, pBp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Bp
        z = dinv * r
        rz_new = r @ z
        beta = jnp.where(step_ok, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(step_ok, z + beta * p, p)
        return x, r, z, p, jnp.where(step_ok, rz_new, rz), step_ok

    carry = (x, r, z, p, rz, active)
    for _ in range(iters):   # static unroll: matvec chain fuses better than
        carry = body(carry)  # a nested while_loop inside the dogleg loop
    x, r, z, p, rz, active = carry
    ok = (g @ x < 0) & jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, jnp.zeros_like(g)), ok


def _damp(B, opts: DoglegOptions):
    """Tikhonov floor scaled by the mean diagonal."""
    P = B.shape[0]
    lam = opts.damping * (jnp.trace(B) / P + 1.0)
    return B + lam * jnp.eye(P, dtype=B.dtype)


def _dogleg_geometry(g, B, delta, p_gn, ok):
    """Dogleg step within |p| <= delta given a (possibly failed) GN
    direction. g/B already masked and damped."""
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

    return jnp.where(
        (gn_norm <= delta) & ok,
        p_gn,
        jnp.where(sd_norm >= delta,
                  p_sd * (delta / (sd_norm + 1e-30)),
                  jnp.where(ok, on_segment(), p_sd)),
    )


def _dogleg_step(g, B, delta, plin, opts: DoglegOptions):
    """Dogleg step p minimizing the quadratic model within |p| <= delta.

    g: (P,) gradient of the |r|^2 model (Jᵀr); B: (P,P) GN Hessian (JᵀJ).
    Returns (p (P,), p_gn (P,) for warm-starting the next linear solve).
    """
    B = _damp(B, opts)
    if opts.linear_solver == "pcg":
        p_gn, ok = _gn_direction_pcg(g, B, plin, opts.cg_iters)
    else:
        p_gn, ok = _gn_direction_cholesky(g, B)
    return _dogleg_geometry(g, B, delta, p_gn, ok), p_gn


def _masked_system(g, B, mask):
    """Freeze masked params exactly: zero gradient, identity rows/cols."""
    g = g * mask
    B = B * (mask[:, None] * mask[None, :]) + jnp.diag(1.0 - mask)
    return g, B


def _pre_step(s: _State, mask, g, B, opts: DoglegOptions):
    """Per-problem: masked system -> dogleg step proposal."""
    g, B = _masked_system(g, B, mask)
    p, p_gn = _dogleg_step(g, B, s.delta, s.plin, opts)
    p = p * mask
    return g, B, p, p_gn


def _post_step(s: _State, g, B, p, p_gn, x_new, f_new,
               opts: DoglegOptions, e_3) -> _State:
    """Per-problem: accept test, trust-region update, stopping flags."""
    pred = -(2.0 * (g @ p) + p @ (B @ p))  # model reduction of f = rᵀr
    return _post_step_from_pred(s, jnp.linalg.norm(g), pred, p, p_gn,
                                x_new, f_new, opts, e_3)


def _post_step_from_pred(s: _State, g_norm, pred, p, p_gn, x_new, f_new,
                         opts: DoglegOptions, e_3) -> _State:
    """`_post_step` with the model reduction and |g| precomputed — the fused
    direction kernel emits both, so the XLA side never re-reads B."""
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
    f = jnp.where(accept, f_new, s.f)

    small_improvement = accept & (actual < e_3 * jnp.maximum(s.f, 1e-30))
    tiny_cost = f <= opts.f_atol
    tiny_grad = g_norm <= opts.g_rtol * (1.0 + s.f)
    stalled = (~accept) & (delta <= opts.min_delta * 1.001)
    done = small_improvement | stalled | tiny_cost | tiny_grad

    # under batching the loop runs until ALL problems finish; freeze
    # finished problems so extra iterations cannot perturb their results
    frozen = s.done
    keep = lambda old, new: jnp.where(frozen, old, new)
    return _State(
        x=keep(s.x, x), f=keep(s.f, f), delta=keep(s.delta, delta),
        it=jnp.where(frozen, s.it, s.it + 1),
        done=s.done | done,
        converged=s.converged | (~frozen & (small_improvement | tiny_cost
                                            | tiny_grad)),
        plin=keep(s.plin, p_gn))


def _body_one(system_fn, cost_fn, opts: DoglegOptions, e_3):
    """One dogleg iteration for one problem (to be vmapped)."""

    def body(s: _State, aux, mask) -> _State:
        f_cur, g, B = system_fn(s.x, aux)
        g, B, p, p_gn = _pre_step(s, mask, g, B, opts)
        x_new = s.x + p
        f_new = cost_fn(x_new, aux)
        return _post_step(s, g, B, p, p_gn, x_new, f_new, opts, e_3)

    return body


def _body_batched_fn(system: GNSystem, opts: DoglegOptions, e_3):
    """One dogleg iteration for the whole batch.

    The system assembly runs through `system_fn_batched` when provided (the
    Pallas path — its frame axis lives in the lane dimension, so it must see
    the batch whole); the per-problem step/accept math is vmapped around it.
    """
    pallas_pcg = (opts.linear_solver == "pcg"
                  and (opts.pcg_backend == "pallas"
                       or (opts.pcg_backend == "auto"
                           and jax.default_backend() == "tpu")))
    if system.system_fn_batched is None and not pallas_pcg:
        return jax.vmap(_body_one(system.system_fn, system.cost_fn,
                                  opts, e_3))
    # the fused direction kernel applies to ANY batched system — including a
    # vmapped per-frame assembly (the XLA fallback for wide extras or
    # jac_backend='xla'), which otherwise also loses the kernel PCG
    sys_b = system.system_fn_batched or jax.vmap(system.system_fn)
    cost_b = system.cost_fn_batched or jax.vmap(system.cost_fn)
    if pallas_pcg:
        # Fused path: masking, damping, PCG, dogleg geometry and the
        # predicted reduction all run inside one Pallas program over the RAW
        # normal equations — the XLA side never materializes the masked or
        # damped (N, D, D) copies of B (3x ~224 MB/iter at F=4096/D=117).
        from moshpp_tpu.solver.pallas_pcg import dogleg_direction_batched
        post_b = jax.vmap(lambda s, gn, pr, p, pg, xn, fn_:
                          _post_step_from_pred(s, gn, pr, p, pg, xn, fn_,
                                               opts, e_3))

        def body(s: _State, aux, mask) -> _State:
            _, g, B = sys_b(s.x, aux)
            g = g * mask
            p, p_gn, pred = dogleg_direction_batched(
                g, B, s.plin, mask, s.delta, opts.cg_iters, opts.damping,
                interpret=jax.default_backend() != "tpu",
                b_frame_minor=system.b_frame_minor)
            x_new = s.x + p
            f_new = cost_b(x_new, aux)
            g_norm = jnp.linalg.norm(g, axis=-1)
            return post_b(s, g_norm, pred, p, p_gn, x_new, f_new)

        return body

    direction_b = jax.vmap(lambda s, m, g, B: _pre_step(s, m, g, B, opts))
    post_b = jax.vmap(lambda s, g, B, p, pg, xn, fn_: _post_step(
        s, g, B, p, pg, xn, fn_, opts, e_3))

    def body(s: _State, aux, mask) -> _State:
        _, g, B = sys_b(s.x, aux)
        if system.b_frame_minor:
            B = jnp.moveaxis(B, -1, 0)
        g, B, p, p_gn = direction_b(s, mask, g, B)
        x_new = s.x + p
        f_new = cost_b(x_new, aux)
        return post_b(s, g, B, p, p_gn, x_new, f_new)

    return body


def _residual_system(residual_fn, jac_precision) -> GNSystem:
    """Generic GNSystem from a residual function via forward-mode J."""
    jac = jax.jacfwd(residual_fn)

    def system_fn(x, aux):
        with jax.default_matmul_precision(jac_precision):
            r = residual_fn(x, aux)
            J = jac(x, aux)
            return r @ r, J.T @ r, J.T @ J

    def cost_fn(x, aux):
        r = residual_fn(x, aux)
        return r @ r

    return GNSystem(system_fn, cost_fn)


def _init_state(x0, f0, opts: DoglegOptions) -> _State:
    b = x0.shape[:-1]
    return _State(
        x=x0, f=f0,
        delta=jnp.full(b, opts.delta_0, x0.dtype),
        it=jnp.zeros(b, jnp.int32),
        done=jnp.zeros(b, bool),
        converged=jnp.zeros(b, bool),
        plin=jnp.zeros_like(x0))


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
    mask = (jnp.ones(P, x0.dtype) if param_mask is None
            else param_mask.astype(x0.dtype))

    sys = _residual_system(lambda x, _: residual_fn(x), opts.jac_precision)
    body = _body_one(sys.system_fn, sys.cost_fn, opts, e_3)

    # Gauss-Newton needs full f32 mantissas: TPU matmuls default to bf16
    # inputs, which stalls convergence at ~mm error. The context applies to
    # every op traced inside (residuals, jacfwd tangents, normal equations).
    with jax.default_matmul_precision("highest"):
        s0 = _init_state(x0, sys.cost_fn(x0, None), opts)
        s = jax.lax.while_loop(
            lambda s: jnp.logical_and(~s.done, s.it < opts.maxiter),
            lambda s: body(s, None, mask), s0)
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
    sys = _residual_system(residual_fn, options.jac_precision)
    return batched_system_solve(sys, x0, aux, options,
                                param_mask=param_mask, e_3=e_3,
                                compact_buckets=())


def batched_system_solve(system: GNSystem,
                         x0: jnp.ndarray,
                         aux,
                         options: DoglegOptions = DoglegOptions(),
                         param_mask: Optional[jnp.ndarray] = None,
                         e_3=None,
                         compact_buckets: Tuple[int, ...] = (4, 16)) -> SolveResult:
    """Batched dogleg with in-graph straggler compaction.

    Runs the batched iteration on all N problems while more than N/b of them
    are active (for each b in `compact_buckets`, in order), gathering the
    stragglers into an N/b-sized bucket between stages via a stable argsort
    on the done flags — no host round-trip, works under jit/shard_map/vmap.

    `compact_buckets=()` disables compaction (plain batched loop).
    """
    opts = options
    e_3 = opts.e_3 if e_3 is None else e_3
    N, P = x0.shape
    if param_mask is None:
        mask = jnp.ones((N, P), x0.dtype)
    elif param_mask.ndim == 1:
        mask = jnp.broadcast_to(param_mask[None, :].astype(x0.dtype), x0.shape)
    else:
        mask = param_mask.astype(x0.dtype)

    body_batched = _body_batched_fn(system, opts, e_3)

    def run_stage(carry, min_active):
        """Iterate while any problem is active and (if min_active > 0) more
        than `min_active` problems are active."""
        s, aux_s, mask_s = carry

        def cond(c):
            s = c[0]
            active = (~s.done) & (s.it < opts.maxiter)
            go = jnp.any(active)
            if min_active > 0:
                go &= jnp.sum(active) > min_active
            return go

        def step(c):
            s, aux_s, mask_s = c
            s = body_batched(s, aux_s, mask_s)
            s = s._replace(done=s.done | (s.it >= opts.maxiter))
            return (s, aux_s, mask_s)

        return jax.lax.while_loop(cond, step, carry)

    with jax.default_matmul_precision("highest"):
        f0 = (system.cost_fn_batched or jax.vmap(system.cost_fn))(x0, aux)
        s = _init_state(x0, f0, opts)

        buckets = [N // b for b in compact_buckets if N // b >= 8]
        if not buckets:
            s = run_stage((s, aux, mask), 0)[0]
        else:
            # level 0: full batch until the active set fits the first bucket
            carry = run_stage((s, aux, mask), buckets[0])
            # shrinking bucket levels; remember gather indices to scatter back
            levels = [carry]          # carries, outermost first
            idxs = []                 # gather index per compaction
            for i, K in enumerate(buckets):
                outer = levels[-1]
                idx = jnp.argsort(outer[0].done)[:K]   # stable: actives first
                sub = jax.tree.map(lambda a: a[idx], outer)
                nxt = buckets[i + 1] if i + 1 < len(buckets) else 0
                sub = run_stage(sub, nxt)
                levels.append(sub)
                idxs.append(idx)
            # scatter solver state back, innermost-out
            inner_s = levels[-1][0]
            for lvl in range(len(idxs) - 1, -1, -1):
                outer_s = levels[lvl][0]
                inner_s = jax.tree.map(
                    lambda a, b: a.at[idxs[lvl]].set(b), outer_s, inner_s)
            s = inner_s

    return SolveResult(x=s.x, cost=s.f, iterations=s.it, converged=s.converged)


def batched_system_solve_traced(system: GNSystem,
                                x0: jnp.ndarray,
                                aux,
                                options: DoglegOptions = DoglegOptions(),
                                param_mask: Optional[jnp.ndarray] = None,
                                e_3=None,
                                record_x: bool = False):
    """`batched_system_solve` with a full per-iteration optimizer trace.

    The debugging stand-in for the reference's live on-step visualization
    (chmosh.py:235-245, 516-519 render the optimizer state at
    verbosity > 1): on a headless TPU the equivalent inspection surface is
    the per-iteration trajectory — cost, trust radius, accept/reject,
    active-set size — dumped post-solve (`tools/profile_stageii.py
    --trace` writes it as CSV, optionally with per-term energies).

    Runs a `lax.scan` over exactly `options.maxiter` iterations with no
    early exit and no straggler compaction, so every iteration is recorded
    at a fixed shape (finished problems are frozen by the body exactly as
    in the production loop — the trajectory up to convergence is
    identical). Returns (SolveResult, trace) where trace holds
    (maxiter, N) arrays `f`, `delta`, `accepted`, `active` (+ `x`
    (maxiter, N, P) when `record_x`, for post-hoc per-term energy
    evaluation). Debug tool: costs maxiter full iterations regardless of
    convergence — do not use on the production path.
    """
    opts = options
    e_3 = opts.e_3 if e_3 is None else e_3
    N, P = x0.shape
    if param_mask is None:
        mask = jnp.ones((N, P), x0.dtype)
    elif param_mask.ndim == 1:
        mask = jnp.broadcast_to(param_mask[None, :].astype(x0.dtype),
                                x0.shape)
    else:
        mask = param_mask.astype(x0.dtype)

    body_batched = _body_batched_fn(system, opts, e_3)

    with jax.default_matmul_precision("highest"):
        f0 = (system.cost_fn_batched or jax.vmap(system.cost_fn))(x0, aux)
        s0 = _init_state(x0, f0, opts)

        def step(s, _):
            x_prev, done_prev = s.x, s.done
            s = body_batched(s, aux, mask)
            # the body's accept decision moves x (a rho-accepted step with
            # p == 0 cannot happen: pred ~ 0 forces rho ~ 0 -> reject), so
            # x != x_prev reproduces it exactly — unlike a cost-decrease
            # test, which miscounts zero-improvement accepts near
            # convergence
            rec = {"f": s.f, "delta": s.delta,
                   "accepted": (~done_prev) & jnp.any(s.x != x_prev, axis=-1),
                   "active": ~done_prev}
            if record_x:
                rec["x"] = s.x
            return s, rec

        s, trace = jax.lax.scan(step, s0, None, length=opts.maxiter)

    res = SolveResult(x=s.x, cost=s.f, iterations=s.it,
                      converged=s.converged)
    return res, trace
