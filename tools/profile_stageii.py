#!/usr/bin/env python
"""Profiling harness for the stage-ii solver.

Reports: end-to-end fused-solve wall time + throughput, per-phase iteration
counts and per-term energies (from the solver's telemetry scan), and
optionally isolated per-iteration microbenchmarks of the Gauss-Newton system
assembly. TPU by default, --cpu for host runs.

`--trace` additionally runs one full-system phase as a TRACED solve
(solver.gauss_newton.batched_system_solve_traced) and writes a
per-iteration CSV — cost, trust radius, accept/active fractions, and mean
per-term energies — the headless stand-in for the reference's live on-step
visualization (chmosh.py:235-245, 516-519) when debugging diverging
solves.

Usage: python tools/profile_stageii.py [--frames N] [--cpu] [--maxiter K]
       [--linear-solver pcg|cholesky] [--micro]
       [--trace] [--trace-out FILE.csv]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--markers", type=int, default=46)
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dof-per-hand", type=int, default=24)
    ap.add_argument("--linear-solver", default="pcg")
    ap.add_argument("--cg-iters", type=int, default=24)
    ap.add_argument("--anchor-stride", type=int, default=8)
    ap.add_argument("--micro", action="store_true",
                    help="also time one fused GN iteration in isolation")
    ap.add_argument("--trace", action="store_true",
                    help="write a per-iteration optimizer trace CSV for one"
                         " full-system phase")
    ap.add_argument("--trace-out", default="/tmp/stageii_trace.csv")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from moshpp_tpu.utils.cache import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp

    from moshpp_tpu.models import make_synthetic_model, lbs_forward
    from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                                 reconstruct_markers,
                                                 select_frame_indices)
    from moshpp_tpu.ops.surface import vertex_normals
    from moshpp_tpu.pipeline.stageii import (StageIIOptions,
                                             mosh_stageii_solve,
                                             prepare_stageii_problem)
    from moshpp_tpu.priors import make_gmm_prior

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
    mask = np.ones((F, args.markers), bool)

    opts = StageIIOptions(maxiter=args.maxiter, smoothing_sweeps=2,
                          optimize_fingers=True,
                          linear_solver=args.linear_solver,
                          cg_iters=args.cg_iters,
                          anchor_stride=args.anchor_stride)
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)

    t0 = time.perf_counter()
    res, report = mosh_stageii_solve(prob, opts, obs, mask, prior=prior,
                                     model_type="smplh", return_report=True)
    jax.block_until_ready(res.trans)
    compile_plus = time.perf_counter() - t0

    t0 = time.perf_counter()
    res, report = mosh_stageii_solve(prob, opts, obs, mask, prior=prior,
                                     model_type="smplh", return_report=True)
    jax.block_until_ready(res.trans)
    dt = time.perf_counter() - t0

    print(f"phase      iters/frame   " +
          "  ".join(f"{t:>10s}" for t in report.term_names))
    for i, name in enumerate(report.phase_names):
        row = "  ".join(f"{report.energies_after[i, j]:10.3e}"
                        for j in range(len(report.term_names)))
        print(f"{name:10s} {report.iterations[i]:11.1f}   {row}")

    err = np.asarray(res.data_err)
    print(f"\nfirst call (incl compile): {compile_plus:.1f}s")
    print(f"TOTAL {dt:.2f}s -> {F/dt:.1f} frames/s | "
          f"mean marker err {err.mean()*1000:.3f} mm")

    if args.trace:
        import csv

        from moshpp_tpu.pipeline.stageii import (make_stageii_system,
                                                 rigid_init,
                                                 stageii_term_energies)
        from moshpp_tpu.solver.gauss_newton import (
            DoglegOptions, batched_system_solve_traced)

        system = make_stageii_system(prob, opts, prior, "smplh")
        maskf = jnp.asarray(mask, jnp.float32)
        n_obs = jnp.sum(maskf, axis=1)
        aux = {"markers": jnp.asarray(obs), "mask": maskf,
               "wt_data": opts.wt("data") * 46.0 / jnp.maximum(n_obs, 1.0),
               "anneal": jnp.ones((F,)),
               "wt_pose_scale": jnp.ones((F,)),
               "velo_anchor": jnp.zeros((F, P)), "velo_on": jnp.zeros((F,)),
               "extra_anchor": jnp.zeros((F, 0)),
               "extra_on": jnp.zeros((F,))}
        x0 = rigid_init(prob, opts, jnp.asarray(obs), maskf)
        dl = DoglegOptions(maxiter=args.maxiter, delta_0=0.5,
                           linear_solver=args.linear_solver,
                           cg_iters=args.cg_iters)
        res_t, trace = jax.jit(
            lambda x, a: batched_system_solve_traced(
                system, x, a, dl, e_3=1e-4, record_x=True))(x0, aux)
        jax.block_until_ready(res_t.x)

        en_fn = stageii_term_energies(prob, opts, prior, "smplh")
        en_b = jax.jit(lambda xs: jax.tree.map(
            jnp.mean, jax.vmap(en_fn)(xs, aux)))
        terms = sorted(jax.eval_shape(en_b, trace["x"][0]).keys())
        rows = []
        for i in range(args.maxiter):
            e = en_b(trace["x"][i])
            rows.append({
                "iter": i,
                "active_frac": float(jnp.mean(trace["active"][i])),
                "accept_frac": float(jnp.mean(trace["accepted"][i])),
                "mean_f": float(jnp.mean(trace["f"][i])),
                "mean_delta": float(jnp.mean(trace["delta"][i])),
                **{t: float(e[t]) for t in terms},
            })
        with open(args.trace_out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"\nper-iteration trace ({args.maxiter} iters x {F} frames) "
              f"-> {args.trace_out}")
        for r in rows[:3] + rows[-2:]:
            print("  " + "  ".join(f"{k}={v:.3g}" if k != "iter"
                                   else f"it={v}" for k, v in r.items()))

    if args.micro:
        from moshpp_tpu.pipeline.stageii import make_stageii_system
        from moshpp_tpu.solver.pallas_pcg import dogleg_direction_batched
        system = make_stageii_system(prob, opts, prior, "smplh")
        D = 3 + prob.sub_model.pose_dof
        x = jnp.asarray(np.concatenate([trans, poses], 1))
        aux = {"markers": jnp.asarray(obs), "mask": jnp.asarray(mask, jnp.float32),
               "wt_data": jnp.full((F,), 8.7), "anneal": jnp.ones((F,)),
               "wt_pose_scale": jnp.ones((F,)),
               "velo_anchor": jnp.zeros((F, P)), "velo_on": jnp.zeros((F,)),
               "extra_anchor": jnp.zeros((F, 0)), "extra_on": jnp.zeros((F,))}
        K = 10

        def bench_fn(name, fn, inp):
            # scan with the carry folded into the input: every iteration's
            # body depends on the previous result, so XLA can neither hoist
            # the (otherwise loop-invariant) computation nor elide it
            @jax.jit
            def run(c):
                def body(s, _):
                    out = fn(c + s)
                    return jnp.sum(out) * 1e-30, None
                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
                return s
            jax.block_until_ready(run(inp))
            t0 = time.perf_counter()
            jax.block_until_ready(run(inp))
            print(f"{name}: {(time.perf_counter()-t0)/K*1000:.2f} ms/iter")

        bench_fn("system assembly (xla per-frame vmap)",
                 lambda c: jax.vmap(system.system_fn)(c, aux)[1], x)
        if system.system_fn_batched is not None:
            bench_fn("system assembly (pallas batched)",
                     lambda c: system.system_fn_batched(c, aux)[1], x)

        f0, g0, B0 = jax.jit(system.system_fn_batched or
                             jax.vmap(system.system_fn))(x, aux)
        pm = jnp.ones((F, D), jnp.float32)
        delta = jnp.full((F,), 0.3, jnp.float32)
        interp = jax.default_backend() != "tpu"
        bench_fn(
            f"fused dogleg direction ({opts.cg_iters} cg iters)",
            lambda g: dogleg_direction_batched(
                g, B0, jnp.zeros_like(g), pm, delta,
                iters=opts.cg_iters, damping=1e-5, interpret=interp,
                b_frame_minor=system.b_frame_minor)[0], g0)


if __name__ == "__main__":
    main()
