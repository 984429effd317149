#!/usr/bin/env python
"""Profiling harness for the stage-ii solver: per-phase wall time and
iteration distribution, on TPU (default) or CPU (--cpu).

Usage: python tools/profile_stageii.py [--frames N] [--cpu] [--maxiter K]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--markers", type=int, default=46)
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dof-per-hand", type=int, default=24)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/moshpp_tpu_jax_cache")
    import jax.numpy as jnp

    from moshpp_tpu.models import make_synthetic_model, lbs_forward
    from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                                 reconstruct_markers,
                                                 select_frame_indices)
    from moshpp_tpu.ops.surface import vertex_normals
    from moshpp_tpu.pipeline.stageii import (StageIIOptions,
                                             make_stageii_residual,
                                             prepare_stageii_problem,
                                             rigid_init)
    from moshpp_tpu.priors import make_gmm_prior
    from moshpp_tpu.solver.gauss_newton import (DoglegOptions,
                                                batched_dogleg_solve)
    import moshpp_tpu.pipeline.stageii as s2

    rng = np.random.default_rng(0)
    model = make_synthetic_model("smplh", num_verts=6890, seed=3,
                                 dof_per_hand=args.dof_per_hand)
    prior = make_gmm_prior(dim=63, num_components=8, seed=1, scale=0.3)

    V = model.v_template.shape[0]
    vids = rng.choice(V, args.markers, replace=False)
    betas = (rng.normal(size=16) * 0.4).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)

    F = args.frames
    P = model.pose_dof
    poses = np.zeros((F, P), np.float32)
    poses[0] = rng.normal(size=P) * 0.15
    for t in range(1, F):
        poses[t] = 0.97 * poses[t - 1] + rng.normal(size=P).astype(np.float32) * 0.02
    trans = np.cumsum(rng.normal(size=(F, 3)) * 0.005, 0).astype(np.float32)

    def sim(p, t):
        return reconstruct_markers(lbs_forward(model, p, jnp.asarray(betas), t),
                                   idx, coeffs)

    obs = np.asarray(jax.jit(jax.vmap(sim))(jnp.asarray(poses), jnp.asarray(trans)))
    maskf = jnp.ones((F, args.markers), jnp.float32)
    obs = jnp.asarray(obs)

    opts = StageIIOptions(maxiter=args.maxiter, smoothing_sweeps=2,
                          optimize_fingers=True)
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)

    residual = make_stageii_residual(prob, opts, prior, "smplh")
    step1_mask, step2_mask = s2._param_masks(prob.sub_model, opts, "smplh")

    n_obs = jnp.sum(maskf, axis=1)
    wt_data = opts.wt("data") * 46.0 / jnp.maximum(n_obs, 1.0)
    anneal = jnp.ones((F,))

    def aux_for(scale):
        z = jnp.zeros((F,), jnp.float32)
        return {
            "markers": obs, "mask": maskf, "wt_data": wt_data, "anneal": anneal,
            "wt_pose_scale": jnp.full((F,), scale, jnp.float32),
            "velo_anchor": jnp.zeros((F, P), jnp.float32), "velo_on": z,
            "extra_anchor": jnp.zeros((F, 0), jnp.float32), "extra_on": z,
        }

    dl = DoglegOptions(maxiter=args.maxiter, delta_0=0.5)

    @jax.jit
    def step(x, aux, pmask, e3):
        r = batched_dogleg_solve(residual, x, aux, dl, param_mask=pmask, e_3=e3)
        return r.x, r.iterations, r.cost

    x = rigid_init(prob, opts, obs, maskf)
    x = jax.block_until_ready(x)

    phases = [("anneal10", 10.0, step1_mask, 1e-3),
              ("anneal5", 5.0, step1_mask, 1e-3),
              ("anneal1", 1.0, step1_mask, 1e-3),
              ("step1", 1.0, step1_mask, 1e-2),
              ("step2", 1.0, step2_mask, 1e-2),
              ("sweep1", 1.0, step2_mask, 1e-2),
              ("sweep2", 1.0, step2_mask, 1e-2),
              ("polish", 1.0, step2_mask, 1e-4)]

    # warmup compile
    _ = jax.block_until_ready(step(x, aux_for(10.0), step1_mask, jnp.float32(1e-3)))

    total = 0.0
    for name, scale, pmask, e3 in phases:
        t0 = time.perf_counter()
        x, its, cost = step(x, aux_for(scale), pmask, jnp.float32(e3))
        x = jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        total += dt
        its = np.asarray(its)
        print(f"{name:9s} {dt*1000:8.1f} ms  iters p50={np.percentile(its,50):.0f} "
              f"p90={np.percentile(its,90):.0f} max={its.max()}  "
              f"cost p50={np.percentile(np.asarray(cost),50):.3e}")

    # final error
    from moshpp_tpu.pipeline.stageii import simulate_markers
    sims = jax.vmap(lambda xi: simulate_markers(prob, opts, xi))(x)
    err = np.asarray(jnp.sqrt(jnp.sum((sims - obs) ** 2, -1)))
    print(f"TOTAL {total:.2f}s -> {F/total:.1f} frames/s | "
          f"mean marker err {err.mean()*1000:.3f} mm")


if __name__ == "__main__":
    main()
