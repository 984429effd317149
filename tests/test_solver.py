"""Dogleg Gauss-Newton solver tests: linear problems (exact in one step),
Rosenbrock-style nonlinear LSQ vs scipy, masked parameters, batching."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.solver import DoglegOptions, dogleg_solve, batched_dogleg_solve
from moshpp_tpu.priors import make_gmm_prior, gmm_prior_residual


class TestDoglegLinear:
    def test_linear_least_squares_exact(self, rng):
        A = jnp.asarray(rng.normal(size=(20, 6)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(20,)), jnp.float32)
        res = dogleg_solve(lambda x: A @ x - b, jnp.zeros(6),
                           DoglegOptions(maxiter=50, delta_0=10.0, e_3=1e-8))
        x_ref, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-4)

    def test_converged_flag(self):
        res = dogleg_solve(lambda x: x - 3.0, jnp.zeros(3))
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 3.0, atol=1e-3)


class TestDoglegNonlinear:
    def test_rosenbrock_lsq(self):
        # rosenbrock as residuals: [10(y - x^2), 1 - x]; optimum (1, 1)
        def r(x):
            return jnp.asarray([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        res = dogleg_solve(r, jnp.asarray([-1.2, 1.0]),
                           DoglegOptions(maxiter=200, e_3=1e-12, delta_0=0.5))
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    def test_matches_scipy_on_exponential_fit(self, rng):
        from scipy.optimize import least_squares
        t = np.linspace(0, 3, 40)
        y = 2.5 * np.exp(-1.3 * t) + 0.1
        t_j, y_j = jnp.asarray(t, jnp.float32), jnp.asarray(y, jnp.float32)

        def r(x):
            return x[0] * jnp.exp(-x[1] * t_j) + x[2] - y_j

        res = dogleg_solve(r, jnp.asarray([1.0, 1.0, 0.0]),
                           DoglegOptions(maxiter=200, e_3=1e-10, delta_0=1.0))
        ref = least_squares(
            lambda x: x[0] * np.exp(-x[1] * t) + x[2] - y, [1.0, 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-3)

    def test_param_mask_freezes(self):
        def r(x):
            return x - jnp.asarray([5.0, 7.0, 9.0])

        mask = jnp.asarray([1.0, 0.0, 1.0])
        res = dogleg_solve(r, jnp.zeros(3), param_mask=mask)
        out = np.asarray(res.x)
        np.testing.assert_allclose(out[[0, 2]], [5.0, 9.0], atol=1e-3)
        assert out[1] == 0.0


class TestBatchedDogleg:
    def test_batch_independent_problems(self, rng):
        targets = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)

        def r(x, tgt):
            return jnp.concatenate([x - tgt, (x[:1] ** 2 - tgt[:1])])

        res = batched_dogleg_solve(r, jnp.zeros((16, 4)), targets,
                                   DoglegOptions(maxiter=100, e_3=1e-9))
        for i in range(16):
            one = dogleg_solve(lambda x: r(x, targets[i]), jnp.zeros(4),
                               DoglegOptions(maxiter=100, e_3=1e-9))
            # batched linalg kernels reorder float reductions, so parameter
            # paths can drift a few ulps-compounded; optima must still agree
            np.testing.assert_allclose(np.asarray(res.x[i]), np.asarray(one.x), atol=2e-3)
            np.testing.assert_allclose(float(res.cost[i]), float(one.cost),
                                       rtol=1e-4, atol=1e-6)

    def test_jit_and_vmap_compose(self, rng):
        targets = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)

        @jax.jit
        def solve_all(t):
            return batched_dogleg_solve(lambda x, tt: x - tt,
                                        jnp.zeros((8, 3)), t).x

        out = np.asarray(solve_all(targets))
        np.testing.assert_allclose(out, np.asarray(targets), atol=1e-3)


class TestGMMPrior:
    def test_residual_energy_is_min_component(self, rng):
        prior = make_gmm_prior(dim=10, num_components=4, seed=3)
        x = jnp.asarray(rng.normal(size=(10,)), jnp.float32)
        r = gmm_prior_residual(prior, x)
        assert r.shape == (11,)
        # energy must equal min over components of mahalanobis/2 - log w
        diff = x[None] - prior.means
        rs = np.sqrt(0.5) * np.einsum("kd,kde->ke", np.asarray(diff), np.asarray(prior.chols))
        energies = (rs ** 2).sum(-1) + np.asarray(prior.sqrt_neg_log_w) ** 2
        np.testing.assert_allclose(float((np.asarray(r) ** 2).sum()),
                                   energies.min(), rtol=1e-5)

    def test_gradient_pulls_to_nearest_mean(self):
        prior = make_gmm_prior(dim=6, num_components=3, seed=5)

        def energy(x):
            r = gmm_prior_residual(prior, x)
            return jnp.sum(r * r)

        k = 1
        x0 = prior.means[k]
        g = np.asarray(jax.grad(energy)(x0 + 0.0))
        assert np.all(np.isfinite(g))
        # at a mean, gradient of its own component's term is ~0 if that
        # component is selected
        r = gmm_prior_residual(prior, x0)
        comp_energy = float(jnp.sum(r * r))
        diff = np.zeros_like(np.asarray(x0))
        # descending the energy must not increase it
        x1 = x0 - 0.01 * g
        assert float(energy(x1)) <= comp_energy + 1e-4

    def test_solver_with_prior_converges(self, rng):
        prior = make_gmm_prior(dim=5, num_components=4, seed=7)
        target = jnp.asarray(rng.normal(size=(5,)), jnp.float32)

        def r(x):
            return jnp.concatenate([3.0 * (x - target), 0.3 * gmm_prior_residual(prior, x)])

        res = dogleg_solve(r, jnp.zeros(5), DoglegOptions(maxiter=100, e_3=1e-8))
        # data term dominates: solution near target (prior shrinks it ~20%)
        assert np.linalg.norm(np.asarray(res.x) - np.asarray(target)) < 0.45
        assert float(res.cost) < float(jnp.sum(r(jnp.zeros(5)) ** 2))


class TestPCGDirection:
    def test_pcg_matches_cholesky_solution(self, rng):
        """PCG-driven dogleg must reach the same optimum as the exact path."""
        A = jnp.asarray(rng.normal(size=(60, 12)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(60,)), jnp.float32)

        def r(x):
            return A @ x - b

        o_exact = dogleg_solve(r, jnp.zeros(12),
                               DoglegOptions(maxiter=60, e_3=1e-10, delta_0=5.0))
        o_pcg = dogleg_solve(r, jnp.zeros(12),
                             DoglegOptions(maxiter=60, e_3=1e-10, delta_0=5.0,
                                           linear_solver="pcg", cg_iters=24))
        np.testing.assert_allclose(np.asarray(o_pcg.x), np.asarray(o_exact.x),
                                   atol=1e-3)

    def test_pcg_nonlinear(self):
        def r(x):
            return jnp.asarray([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        res = dogleg_solve(r, jnp.asarray([-1.2, 1.0]),
                           DoglegOptions(maxiter=200, e_3=1e-12, delta_0=0.5,
                                         linear_solver="pcg", cg_iters=16))
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    def test_pcg_respects_param_mask(self, rng):
        A = jnp.asarray(rng.normal(size=(30, 5)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(30,)), jnp.float32)
        mask = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0])
        res = dogleg_solve(lambda x: A @ x - b, jnp.zeros(5),
                           DoglegOptions(maxiter=80, e_3=1e-10, delta_0=5.0,
                                         linear_solver="pcg", cg_iters=20),
                           param_mask=mask)
        x = np.asarray(res.x)
        assert x[1] == 0.0 and x[3] == 0.0
        # solution of the reduced problem
        Ar = np.asarray(A)[:, [0, 2, 4]]
        xr, *_ = np.linalg.lstsq(Ar, np.asarray(b), rcond=None)
        np.testing.assert_allclose(x[[0, 2, 4]], xr, atol=1e-3)


class TestCompaction:
    def test_compacted_matches_plain(self, rng):
        """In-graph straggler compaction must not change results: problems
        with very different iteration counts land on the same optima."""
        from moshpp_tpu.solver.gauss_newton import (GNSystem,
                                                    batched_system_solve,
                                                    _residual_system)
        N, P = 64, 4
        targets = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
        # mix of easy (linear) and hard (very nonlinear) problems
        hard = jnp.asarray((np.arange(N) % 7 == 0).astype(np.float32))

        def residual(x, aux):
            t, h = aux
            easy = x - t
            curved = jnp.concatenate([10.0 * (x[1:] - x[:-1] ** 2),
                                      (1.0 - x[:1])])
            return easy + h * curved

        sys = _residual_system(residual, "highest")
        opts = DoglegOptions(maxiter=150, e_3=1e-10, delta_0=1.0)
        aux = (targets, hard)
        x0 = jnp.zeros((N, P))
        plain = batched_system_solve(sys, x0, aux, opts, compact_buckets=())
        comp = batched_system_solve(sys, x0, aux, opts, compact_buckets=(4, 16))
        np.testing.assert_allclose(np.asarray(comp.x), np.asarray(plain.x),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(comp.cost),
                                   np.asarray(plain.cost), atol=1e-5)

    def test_compaction_under_jit(self, rng):
        from moshpp_tpu.solver.gauss_newton import (batched_system_solve,
                                                    _residual_system)
        sys = _residual_system(lambda x, t: x - t, "highest")
        targets = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)

        @jax.jit
        def run(t):
            return batched_system_solve(sys, jnp.zeros((32, 3)), t,
                                        DoglegOptions(maxiter=40),
                                        compact_buckets=(4,))
        res = run(targets)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(targets),
                                   atol=1e-3)


@pytest.mark.slow
class TestPallasPCG:
    def test_kernel_matches_xla_pcg(self, rng):
        from moshpp_tpu.solver.gauss_newton import _gn_direction_pcg
        from moshpp_tpu.solver.pallas_pcg import pcg_direction_batched
        N, D = 5, 17
        A = rng.normal(size=(N, D, D)).astype(np.float32)
        B = jnp.asarray(A @ A.transpose(0, 2, 1) + 3.0 * np.eye(D))
        g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        plin = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.1)

        p_k, ok_k = pcg_direction_batched(g, B, plin, iters=20,
                                          interpret=True)
        p_r, ok_r = jax.vmap(
            lambda g, B, pl_: _gn_direction_pcg(g, B, pl_, 20))(g, B, plin)
        np.testing.assert_array_equal(np.asarray(ok_k), np.asarray(ok_r))
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_r),
                                   rtol=2e-4, atol=1e-5)

    def test_deep_pcg_direction_contract(self, rng):
        """What the dogleg needs from PCG: a finite descent direction that
        decreases the quadratic model (f32 CG is not an exact solver —
        chaotic drift past its round-off floor is safeguarded by the outer
        trust region)."""
        from moshpp_tpu.solver.pallas_pcg import pcg_direction_batched
        N, D = 8, 12
        A = rng.normal(size=(N, D, D)).astype(np.float32)
        B = jnp.asarray(A @ A.transpose(0, 2, 1) + 1.0 * np.eye(D))
        g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        p, ok = pcg_direction_batched(g, B, jnp.zeros_like(g), iters=48,
                                      interpret=True)
        p, ok = np.asarray(p), np.asarray(ok)
        assert ok.all()
        descent = np.einsum("nd,nd->n", np.asarray(g), p)
        assert (descent < 0).all()
        assert np.isfinite(p).all()

    def test_fused_direction_matches_xla_chain(self, rng):
        """The fused direction kernel (mask+damp+PCG+geometry+pred in-VMEM,
        raw B input) must reproduce the XLA chain masked_system -> damp ->
        pcg -> dogleg_geometry -> pred exactly (same guards, same order)."""
        from moshpp_tpu.solver.gauss_newton import (DoglegOptions, _damp,
                                                    _dogleg_geometry,
                                                    _gn_direction_pcg,
                                                    _masked_system)
        from moshpp_tpu.solver.pallas_pcg import dogleg_direction_batched
        N, D = 6, 17
        opts = DoglegOptions(damping=1e-8, cg_iters=20)
        A = rng.normal(size=(N, D, D)).astype(np.float32)
        B = jnp.asarray(A @ A.transpose(0, 2, 1) + 3.0 * np.eye(D))
        g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        plin = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.1)
        mask = jnp.asarray(
            (rng.uniform(size=(N, D)) > 0.3).astype(np.float32))
        delta = jnp.asarray(rng.uniform(0.05, 2.0, size=N).astype(np.float32))

        gm = g * mask
        p_k, pgn_k, pred_k = dogleg_direction_batched(
            gm, B, plin, mask, delta, iters=20, damping=opts.damping,
            interpret=True)

        def ref_one(g, B, plin, mask, delta):
            g, B = _masked_system(g, B, mask)
            B = _damp(B, opts)
            p_gn, ok = _gn_direction_pcg(g, B, plin * mask, 20)
            p = _dogleg_geometry(g, B, delta, p_gn, ok) * mask
            pred = -(2.0 * (g @ p) + p @ (B @ p))
            return p, p_gn, pred

        p_r, pgn_r, pred_r = jax.vmap(ref_one)(g, B, plin, mask, delta)
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_r),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pgn_k), np.asarray(pgn_r),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pred_k), np.asarray(pred_r),
                                   rtol=2e-3, atol=1e-6)

    def test_fused_direction_over_vmapped_system(self, rng):
        """pcg_backend='pallas' routes a system WITHOUT batched assembly fns
        (the XLA fallback for wide extras / jac_backend='xla') through the
        fused direction kernel; the solve must land where the plain vmapped
        dogleg lands."""
        from moshpp_tpu.solver.gauss_newton import (DoglegOptions, GNSystem,
                                                    batched_system_solve)

        N, D = 12, 9
        A = rng.normal(size=(D, D)).astype(np.float32)
        Q = jnp.asarray(A @ A.T + 2.0 * np.eye(D, dtype=np.float32))
        t = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

        def system_fn(x, aux):
            r = x - aux["t"]
            return r @ Q @ r, 2.0 * (Q @ r), 2.0 * Q

        def cost_fn(x, aux):
            r = x - aux["t"]
            return r @ Q @ r

        sysm = GNSystem(system_fn, cost_fn, None, None)
        x0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        aux = {"t": t}
        res_k = batched_system_solve(
            sysm, x0, aux,
            DoglegOptions(maxiter=60, e_3=1e-10, linear_solver="pcg",
                          cg_iters=30, pcg_backend="pallas"),
            compact_buckets=())
        res_r = batched_system_solve(
            sysm, x0, aux,
            DoglegOptions(maxiter=60, e_3=1e-10, linear_solver="pcg",
                          cg_iters=30, pcg_backend="xla"),
            compact_buckets=())
        # quadratic objective: both must reach the optimum t
        np.testing.assert_allclose(np.asarray(res_k.x), np.asarray(t),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(res_k.x), np.asarray(res_r.x),
                                   atol=1e-3)


class TestTracedSolve:
    def test_traced_matches_plain(self, rng):
        """The traced debug solve must converge to the same optima as the
        production loop and record a coherent per-iteration trajectory."""
        from moshpp_tpu.solver.gauss_newton import (_residual_system,
                                                    batched_system_solve,
                                                    batched_system_solve_traced)
        N, P = 16, 3
        targets = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
        sys = _residual_system(
            lambda x, t: jnp.concatenate([x - t, 0.5 * (x[:1] ** 2)]),
            "highest")
        opts = DoglegOptions(maxiter=30, e_3=1e-10, delta_0=1.0)
        x0 = jnp.zeros((N, P))
        plain = batched_system_solve(sys, x0, targets, opts,
                                     compact_buckets=())
        traced, trace = batched_system_solve_traced(sys, x0, targets, opts,
                                                    record_x=True)
        np.testing.assert_allclose(np.asarray(traced.x), np.asarray(plain.x),
                                   atol=1e-5)
        assert trace["f"].shape == (30, N)
        assert trace["x"].shape == (30, N, P)
        # costs are monotone non-increasing (rejected steps keep f)
        f = np.asarray(trace["f"])
        assert np.all(f[1:] <= f[:-1] + 1e-6)
        # the active flag matches the recorded iteration counts
        active_iters = np.asarray(trace["active"]).sum(0)
        np.testing.assert_array_equal(active_iters,
                                      np.asarray(traced.iterations))
        # x freezes bit-exactly once a problem is done (jnp.where carry)
        done_at = np.asarray(traced.iterations)
        for n in (0, N - 1):
            xs = np.asarray(trace["x"][:, n])
            tail = xs[done_at[n]:]
            np.testing.assert_array_equal(
                tail, np.broadcast_to(xs[done_at[n]], tail.shape))


class TestGMMPriorSampling:
    def test_samples_score_well_under_the_prior(self, rng):
        """sample_gmm_prior must draw from the modeled mixture: sampled
        poses score far better under the prior residual than poses from an
        unrelated distribution (the round-4 stage-i harness bug)."""
        from moshpp_tpu.priors import (gmm_prior_residual, make_gmm_prior,
                                       sample_gmm_prior)
        prior = make_gmm_prior(dim=12, num_components=4, seed=7, scale=0.3)
        xs = sample_gmm_prior(prior, rng, 64)
        assert xs.shape == (64, 12) and np.all(np.isfinite(xs))
        en = lambda arr: float(np.mean([
            np.sum(np.asarray(gmm_prior_residual(prior, jnp.asarray(x))) ** 2)
            for x in arr]))
        e_samples = en(xs)
        # a wide unrelated distribution scores far worse; and the samples'
        # energy is near the mixture's expected mahalanobis (~dim/2 + const)
        e_far = en(rng.normal(size=(64, 12)).astype(np.float32))
        assert e_samples < 0.4 * e_far, (e_samples, e_far)
        assert e_samples < 3.0 * 12, e_samples
    def test_component_frequencies_match_true_weights(self, rng):
        """Weight recovery must undo _from_moments' per-component normalizer
        (w / (const * sqrdet_k / sqrdet_min)): with strongly differing
        covariance determinants, the biased recovery exp(-snlw^2) would
        oversample the low-volume component by ~sqrdet ratio. Build a prior
        from KNOWN weights and check sampled component frequencies."""
        from moshpp_tpu.priors.gmm import _from_moments, sample_gmm_prior
        d = 6
        means = np.array([[-8.0] * d, [8.0] * d])       # well separated
        covars = np.stack([np.eye(d) * 0.01, np.eye(d) * 1.0])
        true_w = np.array([0.3, 0.7])                    # det ratio 1e-12
        prior = _from_moments(means, covars, true_w)
        xs = sample_gmm_prior(prior, rng, 4000)
        frac0 = float(np.mean(xs[:, 0] < 0))             # component 0 share
        assert abs(frac0 - true_w[0]) < 0.03, frac0
        # first moment follows from the weights too
        mix_mean = true_w @ means
        assert np.linalg.norm(xs.mean(0) - mix_mean) < 0.5
