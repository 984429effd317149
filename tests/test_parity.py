"""Solver-independent parity fixture (the 'chumpy-free parity harness').

Round-1 gap: every accuracy number was validated against the same JAX stack
that produced it. Real chumpy outputs need the license-gated SMPL files and
the reference installed, neither of which exists here — but the *objective
assembly* can still be pinned independently: scipy's trust-region
least-squares solver, fed the identically-assembled stage-ii residual rows
(data + GMM max-mixture prior + regularizers with the reference's weight
semantics), must land on the same optimum as the in-house batched dogleg.
Any error in residual weighting, prior whitening, or Jacobian assembly would
move the two optima apart.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import least_squares

from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import (StageIIOptions, make_stageii_residual,
                                         make_stageii_system, _param_masks,
                                         prepare_stageii_problem, rigid_init)
from moshpp_tpu.priors import make_gmm_prior
from moshpp_tpu.solver.gauss_newton import (DoglegOptions, GNSystem,
                                            batched_system_solve)

# solver-compile-heavy: excluded from the fast pre-commit gate
# (pytest -m 'not slow'); the full suite remains the CI bar
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_problem():
    rng = np.random.default_rng(7)
    model = make_synthetic_model("smplh", num_verts=300, seed=7, dof_per_hand=6)
    # single-component prior: the max-mixture argmin makes the objective
    # piecewise (optima legitimately depend on the solver's path through
    # component switches); one component keeps it smooth so the two
    # independent solvers must land on the SAME optimum
    prior = make_gmm_prior(dim=63, num_components=1, seed=3, scale=0.3)
    betas = (rng.normal(size=16) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    M, F = 16, 3
    vids = rng.choice(can_v.shape[0], M, replace=False)
    latents = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
    poses = (rng.normal(size=(F, model.pose_dof)) * 0.12).astype(np.float32)
    trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

    def sim(p, t):
        return reconstruct_markers(lbs_forward(model, p, jnp.asarray(betas), t),
                                   idx, coeffs)

    obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
    # a little observation noise so the optimum is weight-sensitive: with
    # exact data every weighting lands at the same zero-residual solution
    obs = obs + rng.normal(size=obs.shape).astype(np.float32) * 5e-4

    opts = StageIIOptions(optimize_fingers=True, maxiter=200,
                          smoothing_sweeps=0)
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)
    residual = make_stageii_residual(prob, opts, prior, "smplh")
    system = make_stageii_system(prob, opts, prior, "smplh")
    _, step2 = _param_masks(prob.sub_model, opts, "smplh")

    P = prob.sub_model.pose_dof
    aux_np = {
        "markers": jnp.asarray(obs), "mask": jnp.ones((F, M), jnp.float32),
        "wt_data": jnp.full((F,), 400.0 * 46.0 / M, jnp.float32),
        "anneal": jnp.ones((F,)), "wt_pose_scale": jnp.ones((F,)),
        "velo_anchor": jnp.zeros((F, P)), "velo_on": jnp.zeros((F,)),
        "extra_anchor": jnp.zeros((F, 0)), "extra_on": jnp.zeros((F,)),
    }
    x0 = np.asarray(rigid_init(prob, opts, jnp.asarray(obs),
                               jnp.ones((F, M))))
    return dict(prob=prob, opts=opts, prior=prior, residual=residual,
                system=system, mask=np.asarray(step2), aux=aux_np, x0=x0,
                obs=obs, F=F, M=M)


def _scipy_solve(tp, f):
    """Independent optimum of frame f via scipy trust-region least squares
    on the identical residual rows (free dofs only)."""
    residual = tp["residual"]
    aux_f = jax.tree.map(lambda a: a[f], tp["aux"])
    free = np.where(tp["mask"] > 0)[0]
    x_full = tp["x0"][f].copy()

    r_jit = jax.jit(lambda x: residual(x, aux_f))
    jac_jit = jax.jit(jax.jacfwd(lambda x: residual(x, aux_f)))

    def r_np(xf):
        x = x_full.copy()
        x[free] = xf
        return np.asarray(r_jit(jnp.asarray(x)), np.float64)

    def j_np(xf):
        x = x_full.copy()
        x[free] = xf
        return np.asarray(jac_jit(jnp.asarray(x)), np.float64)[:, free]

    sol = least_squares(r_np, x_full[free], jac=j_np, method="trf",
                        xtol=1e-12, ftol=1e-12, gtol=1e-12, max_nfev=400)
    x = x_full.copy()
    x[free] = sol.x
    return x, float(sol.cost * 2.0)   # scipy cost = 0.5 |r|^2


class TestScipyParity:
    def test_batched_dogleg_matches_scipy_optimum(self, tiny_problem):
        tp = tiny_problem
        res = batched_system_solve(
            tp["system"], jnp.asarray(tp["x0"]), tp["aux"],
            DoglegOptions(maxiter=200, e_3=1e-10, linear_solver="cholesky"),
            param_mask=jnp.asarray(tp["mask"]), compact_buckets=())

        for f in range(tp["F"]):
            x_sp, cost_sp = _scipy_solve(tp, f)
            cost_jax = float(res.cost[f])
            # same basin, same objective: costs agree to ~1e-4 relative
            assert abs(cost_jax - cost_sp) <= 2e-4 * max(cost_sp, 1e-12), (
                f"frame {f}: jax cost {cost_jax:.8f} vs scipy {cost_sp:.8f}")

            # simulated markers from both optima agree to < 0.1 mm
            from moshpp_tpu.pipeline.stageii import simulate_markers
            sim_jax = np.asarray(simulate_markers(tp["prob"], tp["opts"],
                                                  res.x[f]))
            sim_sp = np.asarray(simulate_markers(tp["prob"], tp["opts"],
                                                 jnp.asarray(x_sp)))
            d_mm = np.linalg.norm(sim_jax - sim_sp, axis=-1).max() * 1000
            assert d_mm < 0.1, f"frame {f}: optima differ by {d_mm:.4f} mm"

    def test_pcg_path_matches_scipy_optimum(self, tiny_problem):
        tp = tiny_problem
        res = batched_system_solve(
            tp["system"], jnp.asarray(tp["x0"]), tp["aux"],
            DoglegOptions(maxiter=300, e_3=1e-10, linear_solver="pcg",
                          cg_iters=40),
            param_mask=jnp.asarray(tp["mask"]), compact_buckets=())
        x_sp, cost_sp = _scipy_solve(tp, 0)
        # pcg is the inexact bulk-phase solver (the polish phase always runs
        # the exact Cholesky path): within 0.2% of the true optimum here
        assert abs(float(res.cost[0]) - cost_sp) <= 2e-3 * max(cost_sp, 1e-12)


@pytest.fixture(scope="module")
def stagei_step():
    """One frozen stage-i annealing step on a tiny problem: the packed
    shared-betas + latents + per-frame pose system (chmosh.py:313-406)."""
    from moshpp_tpu.pipeline.stagei import (StageIOptions, build_stagei_step,
                                            prepare_stagei_context)

    rng = np.random.default_rng(11)
    model = make_synthetic_model("smplh", num_verts=300, seed=7,
                                 dof_per_hand=6)
    prior = make_gmm_prior(dim=63, num_components=1, seed=3, scale=0.3)
    M, F = 10, 2
    betas_true = (rng.normal(size=16) * 0.3).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas_true)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    vids = rng.choice(can_v.shape[0], M, replace=False)
    latents_true = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents_true))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents_true), idx)
    poses = (rng.normal(size=(F, model.pose_dof)) * 0.1).astype(np.float32)
    trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

    def sim(p, t):
        return reconstruct_markers(
            lbs_forward(model, p, jnp.asarray(betas_true), t), idx, coeffs)

    obs = np.asarray(jax.vmap(sim)(jnp.asarray(poses), jnp.asarray(trans)))
    obs = obs + rng.normal(size=obs.shape).astype(np.float32) * 5e-4

    opts = StageIOptions(maxiter=300, num_betas=16)
    ctx, (betas, latents, poses0, trans0, _) = prepare_stagei_context(
        model, obs, np.ones((F, M), bool), vids,
        np.full(M, 0.0095, np.float32), {"body": np.ones(M, bool)},
        opts=opts, prior=prior)
    residual, pmask = build_stagei_step(ctx, betas, latents, anneal=1.0,
                                        detailed=True)
    x0 = np.asarray(ctx.lay.pack(betas, latents, poses0, trans0, None))
    return dict(ctx=ctx, residual=residual, pmask=pmask, x0=x0)


class TestStageIScipyParity:
    def test_packed_system_matches_scipy_optimum(self, stagei_step):
        """The in-house dogleg on the packed stage-i step lands on the same
        optimum as scipy trust-region least squares on the identical rows —
        pinning shared-betas coupling, init/surf/prior weighting, and the
        packed-layout Jacobian assembly against an independent solver."""
        from scipy.optimize import least_squares

        from moshpp_tpu.solver.gauss_newton import dogleg_solve

        sp = stagei_step
        residual, pmask, x0 = sp["residual"], sp["pmask"], sp["x0"]
        lay = sp["ctx"].lay

        res = jax.jit(lambda xx: dogleg_solve(
            residual, xx, DoglegOptions(maxiter=300, e_3=1e-10, delta_0=0.5),
            param_mask=jnp.asarray(pmask)))(jnp.asarray(x0))

        free = np.where(pmask > 0)[0]
        r_jit = jax.jit(residual)
        jac_jit = jax.jit(jax.jacfwd(residual))

        def r_np(xf):
            x = x0.copy()
            x[free] = xf
            return np.asarray(r_jit(jnp.asarray(x)), np.float64)

        def j_np(xf):
            x = x0.copy()
            x[free] = xf
            return np.asarray(jac_jit(jnp.asarray(x)), np.float64)[:, free]

        sol = least_squares(r_np, x0[free], jac=j_np, method="trf",
                            xtol=1e-12, ftol=1e-12, gtol=1e-12, max_nfev=400)
        cost_sp = float(sol.cost * 2.0)
        cost_jax = float(res.cost)
        assert abs(cost_jax - cost_sp) <= 2e-4 * max(cost_sp, 1e-12), (
            f"jax cost {cost_jax:.8f} vs scipy {cost_sp:.8f}")

        # latent markers are pinned by the anchor+surface rows (no gauge
        # freedom): both optima must place them within 0.2 mm
        x_sp = x0.copy()
        x_sp[free] = sol.x
        _, lat_jax, _, _, _ = lay.split(np.asarray(res.x))
        _, lat_sp, _, _, _ = lay.split(x_sp)
        d_mm = np.linalg.norm(np.asarray(lat_jax) - lat_sp, axis=1).max() * 1e3
        assert d_mm < 0.2, f"latents differ by {d_mm:.4f} mm"
