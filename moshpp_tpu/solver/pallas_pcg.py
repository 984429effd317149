"""Pallas TPU kernel for the batched Gauss-Newton PCG direction.

Solves B p = -g per frame with Jacobi-preconditioned conjugate gradient —
the same algorithm as `gauss_newton._gn_direction_pcg` (warm start, breakdown
guards), but with frames in the lane dimension: B lives in VMEM as a
(D, D, 128-frames) block and every matvec is an unrolled sequence of
full-width VPU FMAs, so 24 CG iterations cost ~1-2 ms at F=4096/D=117 where
the XLA batched-matvec chain costs ~11 ms and a batched Cholesky ~60 ms.
Because the kernelized direction is cheap even at high iteration counts, the
polish phase can use PCG with a large `iters` instead of Cholesky — removing
the most expensive op in the stage-ii solve.

B must be symmetric (it is: JᵀJ + quadratic prior blocks), which lets the
matvec index B's *leading* dimension only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BF = 128


def _vmem_params(D: int):
    """Raise the scoped-VMEM limit when the double-buffered (D, D, BF) B
    block outgrows the 16 MB default (D=117 fits; extras-augmented D=125
    needs 16.25 MB). v5e/v5p have 128 MB physical VMEM; budget the two B
    buffers plus the double-buffered (D, BF) vector streams (g, plin, mask,
    3 outputs) and ~2 MB of temporaries, floor at the default. (A flat 2 MB
    slack was 102 KB short at D=206 — the production smplx E=80 config —
    and the remote compiler hard-fails on scoped-vmem stack OOM.)"""
    need = 2 * D * D * BF * 4 + 12 * D * BF * 4 + (2 << 20)
    if need <= (16 << 20):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need, 100 << 20))


# The CG recurrence compiles to O(iters * D) Mosaic ops when python-
# unrolled. Narrow systems keep the unroll (Mosaic pipelines it best:
# 3.3 ms vs 5.1 ms looped at D=117/iters=24/F=4096). Past ~D=160 the
# unrolled program sizes explode compile time (the smplx E=80 width D=206
# took ~45-60 min of remote compile per phase program); wide systems run
# the same body under lax.fori_loop (compile O(D)) at ~1.5x direction
# runtime. The `active` flag is carried as f32 in the looped form: an i1
# vector in a Mosaic loop carry crashes the layout pass
# ("scf.yield ... in_layout" internal error).
CG_LOOP_MIN_D = 161


def _cg_iterate(cg_body, iters, D, x, r, z, p, rz, active):
    if D < CG_LOOP_MIN_D:
        carry = (x, r, z, p, rz, active.astype(jnp.float32))
        for _ in range(iters):
            carry = cg_body(None, carry)
        return carry[:5]
    out = jax.lax.fori_loop(0, iters, cg_body,
                            (x, r, z, p, rz, active.astype(jnp.float32)))
    return out[:5]


def _pcg_kernel(g_ref, b_ref, plin_ref, p_ref, ok_ref, *, iters, D):
    """One 128-frame block: Jacobi-PCG on B p = -g, warm-started from plin.

    Mirrors gauss_newton._gn_direction_pcg exactly (same guards), with all
    (D,)-vectors as (D, BF) tiles and scalars as (1, BF) rows.
    """
    g = g_ref[:]                                   # (D, BF)
    plin = plin_ref[:]
    B = b_ref                                      # (D, D, BF) ref, symmetric

    def matvec(v):
        # out[d] = sum_e B[e][d] * v[e]  (B symmetric -> leading-dim slices)
        out = B[0] * v[0:1, :]
        for e in range(1, D):
            out = out + B[e] * v[e:e + 1, :]
        return out

    def rdot(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)   # (1, BF)

    rhs = -g
    diag = jnp.concatenate([B[e][e:e + 1, :] for e in range(D)], axis=0)
    dinv = 1.0 / jnp.clip(diag, 1e-12, None)

    # warm start only if it reduces the residual vs x0 = 0
    r_warm = rhs - matvec(plin)
    finite = jnp.all(jnp.isfinite(plin), axis=0, keepdims=True)
    use_warm = (rdot(r_warm, r_warm) < rdot(rhs, rhs)) & finite
    x = jnp.where(use_warm, plin, jnp.zeros_like(g))
    r = jnp.where(use_warm, r_warm, rhs)

    z = dinv * r
    p = z
    rz = rdot(r, z)
    rz0 = jnp.maximum(rz, 1e-30)
    active = rz > 0

    def cg_body(_, carry):
        x, r, z, p, rz, active_f = carry
        Bp = matvec(p)
        pBp = rdot(p, Bp)
        step_ok = (active_f > 0) & (pBp > 1e-30) & (rz > 1e-12 * rz0)
        alpha = jnp.where(step_ok, rz / jnp.where(pBp > 0, pBp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Bp
        z = dinv * r
        rz_new = rdot(r, z)
        beta = jnp.where(step_ok, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(step_ok, z + beta * p, p)
        rz = jnp.where(step_ok, rz_new, rz)
        return x, r, z, p, rz, step_ok.astype(jnp.float32)

    x, r, z, p, rz = _cg_iterate(cg_body, iters, D, x, r, z, p, rz, active)

    ok = (rdot(g, x) < 0) & jnp.all(jnp.isfinite(x), axis=0, keepdims=True)
    p_ref[:, :] = jnp.where(ok, x, jnp.zeros_like(x))
    ok_ref[:, :] = ok.astype(jnp.float32)


def _direction_kernel(g_ref, b_ref, plin_ref, mask_ref, delta_ref,
                      p_ref, pgn_ref, pred_ref, *, iters, D, damping):
    """Fused dogleg direction for one 128-frame block.

    Takes the RAW normal equations B (no masked/damped copies in HBM) and
    folds parameter masking + Tikhonov damping into the matvec:

        B_md v = mask * (B @ (mask * v)) + (1 - mask) * v + lam * v

    which equals (mask mask^T * B + diag(1-mask) + lam I) v — exactly the
    system `gauss_newton._masked_system` + `_damp` materialize, at zero HBM
    traffic. Then runs Jacobi-PCG, the dogleg geometry (GN-inside / Cauchy /
    segment blend) and the predicted model reduction in-VMEM, so XLA never
    reads B again after the normal-equation contraction.

    g must arrive PRE-MASKED (g * mask — cheap in XLA, needed outside for
    the gradient-norm stop anyway); plin is masked in-kernel since phase
    transitions can leave stale components in frozen dims.
    """
    g = g_ref[:]                                   # (D, BF), pre-masked
    mask = mask_ref[:]                             # (D, BF) 0/1
    plin = plin_ref[:] * mask
    delta = delta_ref[:]                           # (1, BF)
    B = b_ref                                      # (D, D, BF) raw, symmetric

    def rdot(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)   # (1, BF)

    # damping scale from the masked diagonal (matches _damp on the masked B)
    diag = jnp.concatenate([B[e][e:e + 1, :] for e in range(D)], axis=0)
    diag_m = mask * diag + (1.0 - mask)
    lam = damping * (jnp.sum(diag_m, axis=0, keepdims=True) / D + 1.0)

    def matvec(v):
        vm = v * mask
        out = B[0] * vm[0:1, :]
        for e in range(1, D):
            out = out + B[e] * vm[e:e + 1, :]
        return mask * out + (1.0 - mask) * v + lam * v

    dinv = 1.0 / jnp.clip(diag_m + lam, 1e-12, None)

    rhs = -g
    # warm start only if it reduces the residual vs x0 = 0
    r_warm = rhs - matvec(plin)
    finite = jnp.all(jnp.isfinite(plin), axis=0, keepdims=True)
    use_warm = (rdot(r_warm, r_warm) < rdot(rhs, rhs)) & finite
    x = jnp.where(use_warm, plin, jnp.zeros_like(g))
    r = jnp.where(use_warm, r_warm, rhs)

    z = dinv * r
    p = z
    rz = rdot(r, z)
    rz0 = jnp.maximum(rz, 1e-30)
    active = rz > 0

    def cg_body(_, carry):
        x, r, z, p, rz, active_f = carry
        Bp = matvec(p)
        pBp = rdot(p, Bp)
        step_ok = (active_f > 0) & (pBp > 1e-30) & (rz > 1e-12 * rz0)
        alpha = jnp.where(step_ok, rz / jnp.where(pBp > 0, pBp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Bp
        z = dinv * r
        rz_new = rdot(r, z)
        beta = jnp.where(step_ok, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(step_ok, z + beta * p, p)
        rz = jnp.where(step_ok, rz_new, rz)
        return x, r, z, p, rz, step_ok.astype(jnp.float32)

    x, r, z, p, rz = _cg_iterate(cg_body, iters, D, x, r, z, p, rz, active)

    ok = (rdot(g, x) < 0) & jnp.all(jnp.isfinite(x), axis=0, keepdims=True)
    p_gn = jnp.where(ok, x, jnp.zeros_like(x))
    pgn_ref[:, :] = p_gn

    # ---- dogleg geometry (mirrors gauss_newton._dogleg_geometry) ----------
    gn_norm = jnp.where(ok, jnp.sqrt(rdot(p_gn, p_gn)), jnp.inf)
    gBg = rdot(g, matvec(g)) + 1e-30
    gg = rdot(g, g)
    p_sd = -(gg / gBg) * g
    sd_norm = jnp.sqrt(rdot(p_sd, p_sd))

    d = p_gn - p_sd
    a = rdot(d, d) + 1e-30
    b2 = 2.0 * rdot(p_sd, d)
    c = rdot(p_sd, p_sd) - delta * delta
    disc = jnp.maximum(b2 * b2 - 4.0 * a * c, 0.0)
    t = jnp.clip((-b2 + jnp.sqrt(disc)) / (2.0 * a), 0.0, 1.0)
    seg = p_sd + t * d

    step = jnp.where(
        (gn_norm <= delta) & ok,
        p_gn,
        jnp.where(sd_norm >= delta,
                  p_sd * (delta / (sd_norm + 1e-30)),
                  jnp.where(ok, seg, p_sd)))
    step = step * mask
    p_ref[:, :] = step

    # predicted model reduction -(2 g.p + p B_md p) for the rho accept test
    pred_ref[:, :] = -(2.0 * rdot(g, step) + rdot(step, matvec(step)))


def dogleg_direction_batched(g: jnp.ndarray,
                             B: jnp.ndarray,
                             plin: jnp.ndarray,
                             mask: jnp.ndarray,
                             delta: jnp.ndarray,
                             iters: int,
                             damping: float,
                             interpret: bool = False,
                             b_frame_minor: bool = False):
    """Fully-fused batched dogleg direction from RAW normal equations.

    (g_masked (N,D), B raw symmetric, plin (N,D), mask (N,D),
    delta (N,)) -> (p (N,D) dogleg step, p_gn (N,D) warm start,
    pred (N,) model reduction). Replaces the XLA chain
    masked-copy -> damped-copy -> kernel-transpose -> geometry -> pred,
    which wrote three full (N,D,D) copies of B per iteration.

    B is (N, D, D) by default; with `b_frame_minor` it arrives already in
    the kernel's (D, D, N) layout (the frame-minor assembly path) and the
    per-iteration relayout of B disappears entirely.
    """
    N, D = g.shape
    Np = -(-N // BF) * BF
    gt = jnp.pad(g, ((0, Np - N), (0, 0))).T               # (D, Np)
    pt = jnp.pad(plin, ((0, Np - N), (0, 0))).T
    # pad mask with zeros: padded frames solve the identity system
    mt = jnp.pad(mask.astype(g.dtype), ((0, Np - N), (0, 0))).T
    dt = jnp.pad(delta, (0, Np - N))[None, :]              # (1, Np)
    if b_frame_minor:
        Bt = jnp.pad(B, ((0, 0), (0, 0), (0, Np - N)))
    else:
        Bt = jnp.pad(B, ((0, Np - N), (0, 0), (0, 0))).transpose(1, 2, 0)

    kern = functools.partial(_direction_kernel, iters=iters, D=D,
                             damping=damping)
    p_t, pgn_t, pred_t = pl.pallas_call(
        kern,
        grid=(Np // BF,),
        out_shape=[
            jax.ShapeDtypeStruct((D, Np), jnp.float32),
            jax.ShapeDtypeStruct((D, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(D),
    )(gt, Bt, pt, mt, dt)
    return p_t.T[:N], pgn_t.T[:N], pred_t[0, :N]


def pcg_direction_batched(g: jnp.ndarray,
                          B: jnp.ndarray,
                          plin: jnp.ndarray,
                          iters: int,
                          interpret: bool = False):
    """Batched GN direction: (g (N,D), B (N,D,D) symmetric, plin (N,D)) ->
    (p_gn (N,D), ok (N,) bool). Drop-in for vmapped `_gn_direction_pcg`."""
    N, D = g.shape
    Np = -(-N // BF) * BF
    gt = jnp.pad(g, ((0, Np - N), (0, 0))).T               # (D, Np)
    pt = jnp.pad(plin, ((0, Np - N), (0, 0))).T
    # identity-pad B so padded frames stay finite
    Bp_ = jnp.pad(B, ((0, Np - N), (0, 0), (0, 0)))
    if Np > N:
        eye = jnp.broadcast_to(jnp.eye(D, dtype=B.dtype), (Np - N, D, D))
        Bp_ = Bp_.at[N:].set(eye)
    Bt = Bp_.transpose(1, 2, 0)                            # (D, D, Np)

    kern = functools.partial(_pcg_kernel, iters=iters, D=D)
    p_t, ok_t = pl.pallas_call(
        kern,
        grid=(Np // BF,),
        out_shape=[
            jax.ShapeDtypeStruct((D, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D, BF), lambda fi: (0, 0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((D, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BF), lambda fi: (0, fi),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(D),
    )(gt, Bt, pt)
    return p_t.T[:N], ok_t[0, :N] > 0.5
