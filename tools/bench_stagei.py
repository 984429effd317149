#!/usr/bin/env python
"""Benchmark: stage-I solve wall time + parameter-recovery quality.

Stage-i runs once per subject (vs stage-ii once per frame), so the metrics
are seconds per subject and subjects/hour/chip at the production
configuration: real-scale SMPL+H body (6890 verts), 46 markers, 12 frames,
the full 4-step annealing schedule with maxiter=100 per step
(chmosh.py:313-415). The reference solves the same 12-frame shared-beta
problem in minutes on CPU.

Stage-i's deliverable IS shape + latent markers (chmosh.py:443-455 returns
betas/markers_latent/vids), so besides the optimized data residual this
bench reports what those outputs are worth against the synthetic ground
truth:
  * betas recovery error (RMS over the 16 shape coefficients),
  * latent marker placement error (mm, canonical space),
  * vid-snap accuracy (exact hit rate + mm distance between the snapped
    and true vertex),
  * v2v: mean vertex-to-vertex surface distance between the solved and
    ground-truth bodies over the stage-i frames.

`--subjects S` solves S independent subjects in ONE batched dogleg
(`mosh_stagei_solve_batched` — the subject axis of the reference's
independent per-process jobs, run_tools.py:45-67, becomes a TPU batch
axis) and reports subjects/hour/chip.

`--scipy-anchor` additionally solves the same 4-step annealed objective
with scipy trust-region least squares (identical residual rows + free-dof
masks, jacfwd Jacobians) from the same init, pinning the "prior-data
equilibrium" residual to an independent optimizer.

Usage: python tools/bench_stagei.py [--subjects N] [--cpu] [--maxiter K]
                                    [--scipy-anchor]
Prints one JSON line: {"metric": "stagei_seconds_per_subject", ...}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_world(args, model, prior, jnp, jax):
    """Ground-truth subject + sampled stage-i frames (one subject)."""
    from moshpp_tpu.models import lbs_forward
    from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                                 reconstruct_markers,
                                                 select_frame_indices)
    from moshpp_tpu.ops.surface import vertex_normals
    from moshpp_tpu.priors import sample_gmm_prior

    rng = np.random.default_rng(args.seed)
    V = model.v_template.shape[0]
    vids = np.random.default_rng(0).choice(V, args.markers, replace=False)
    betas_gt = (rng.normal(size=16) * 0.4).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas_gt)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents_gt = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents_gt))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents_gt), idx)

    F, P = args.frames, model.pose_dof
    # ground-truth body poses are drawn FROM the prior's mixture: real
    # stage-i frames come from the same distribution the (AMASS-trained)
    # prior models. An unrelated random pose distribution makes the prior
    # adversarial and the objective's optimum moves ~20 mm off the truth —
    # that measures the harness, not the solver.
    poses = np.zeros((F, P), np.float32)
    poses[:, 3:66] = sample_gmm_prior(prior, rng, F)
    poses[:, :3] = rng.normal(size=(F, 3)) * 0.3          # free root
    poses[:, 66:] = rng.normal(size=(F, P - 66)) * 0.05   # mild hand pca

    trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)

    def sim(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas_gt), t)
        return reconstruct_markers(verts, idx, coeffs)

    obs = np.asarray(jax.jit(jax.vmap(sim))(jnp.asarray(poses),
                                            jnp.asarray(trans)))
    return dict(vids=vids, betas=betas_gt, latents=latents_gt,
                poses=poses, trans=trans, obs=obs)


def _recovery_metrics(model, world, res, jax, jnp):
    """What stage-i is for: betas / latent placement / vid snap / v2v."""
    from moshpp_tpu.models import lbs_forward

    betas_rms = float(np.sqrt(np.mean((res.betas - world["betas"]) ** 2)))
    lat_mm = float(np.mean(np.linalg.norm(
        res.markers_latent - world["latents"], axis=-1))) * 1000.0

    snap = np.array([res.markers_latent_vids[l] for l in res.latent_labels])
    hit = float(np.mean(snap == world["vids"]))
    cv = np.asarray(model.v_template)
    snap_mm = float(np.mean(np.linalg.norm(
        cv[snap] - cv[world["vids"]], axis=-1))) * 1000.0

    fwd = jax.jit(jax.vmap(lambda b, p, t: lbs_forward(model, p, b, t),
                           in_axes=(None, 0, 0)))
    v_true = fwd(jnp.asarray(world["betas"]), jnp.asarray(world["poses"]),
                 jnp.asarray(world["trans"]))
    v_sol = fwd(jnp.asarray(res.betas), jnp.asarray(res.poses),
                jnp.asarray(res.trans))
    v2v_mm = float(jnp.mean(jnp.linalg.norm(v_sol - v_true, axis=-1))) * 1000.0
    return {
        "betas_rms": round(betas_rms, 5),
        "latent_err_mm": round(lat_mm, 3),
        "vid_snap_hit_rate": round(hit, 3),
        "vid_snap_dist_mm": round(snap_mm, 3),
        "v2v_mm": round(v2v_mm, 3),
    }


def _scipy_anchor(model, world, layout, opts, prior, jax, jnp):
    """Independent scipy solve of the SAME annealed objective.

    Follows the same 4-step schedule (same frozen structure per step, same
    free-dof masks, same init chain) with scipy.optimize.least_squares TRF
    on the free parameters; Jacobians via jax.jacfwd on CPU. Returns the
    anchored mean data residual (mm)."""
    from scipy.optimize import least_squares

    from moshpp_tpu.pipeline.stagei import (StageIOptions, _stagei_outputs,
                                            build_stagei_step,
                                            prepare_stagei_context)

    vids, m2b, type_masks = layout
    ctx, state = prepare_stagei_context(
        model, world["obs"], np.ones(world["obs"].shape[:2], bool),
        vids, m2b, type_masks, opts=opts, prior=prior)
    betas, latents, poses, trans, exprs = state
    lay = ctx.lay
    annealing = tuple(opts.wt("annealing"))

    for tidx, anneal in enumerate(annealing):
        detailed = tidx > len(annealing) - 3
        residual, pmask = build_stagei_step(ctx, betas, latents, anneal,
                                            detailed)
        free = np.where(pmask > 0)[0]
        # np.array copy: asarray on a jax array yields a read-only view
        x_full = np.array(lay.pack(betas, latents, poses, trans, None))

        r_jit = jax.jit(residual)
        jac_jit = jax.jit(jax.jacfwd(residual))

        def r_np(xf):
            x = x_full.copy(); x[free] = xf
            return np.asarray(r_jit(jnp.asarray(x, jnp.float32)), np.float64)

        def j_np(xf):
            x = x_full.copy(); x[free] = xf
            J = np.asarray(jac_jit(jnp.asarray(x, jnp.float32)), np.float64)
            return J[:, free]

        sol = least_squares(r_np, x_full[free], jac=j_np, method="trf",
                            max_nfev=60, xtol=1e-10)
        x_full[free] = sol.x
        betas, latents, poses, trans, _ = lay.split(
            jnp.asarray(x_full, jnp.float32))

    out = _stagei_outputs(ctx, [f"M{i:02d}" for i in range(lay.M)],
                          betas, latents, poses, trans, None)
    return float(out.errs["data_mean_m"]) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--markers", type=int, default=46)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--dof-per-hand", type=int, default=24)
    ap.add_argument("--subjects", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scipy-anchor", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from moshpp_tpu.utils.cache import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp

    from moshpp_tpu.models import make_synthetic_model
    from moshpp_tpu.pipeline.stagei import (StageIOptions, mosh_stagei_solve,
                                            mosh_stagei_solve_batched)
    from moshpp_tpu.priors import make_gmm_prior

    model = make_synthetic_model("smplh", num_verts=args.verts, seed=3,
                                 dof_per_hand=args.dof_per_hand)
    prior = make_gmm_prior(dim=63, num_components=8, seed=1, scale=0.3)

    worlds = []
    for s in range(args.subjects):
        a = argparse.Namespace(**vars(args)); a.seed = args.seed + s
        worlds.append(_make_world(a, model, prior, jnp, jax))
    vids = worlds[0]["vids"]
    labels = [f"M{i:02d}" for i in range(args.markers)]
    type_masks = {"body": np.ones(args.markers, bool)}
    m2b = np.full(args.markers, 0.0095, np.float32)
    opts = StageIOptions(maxiter=args.maxiter)

    S = args.subjects
    if S == 1:
        w = worlds[0]
        mask = np.ones(w["obs"].shape[:2], bool)

        def solve():
            return [mosh_stagei_solve(model, w["obs"], mask, labels, vids,
                                      m2b, type_masks, opts=opts,
                                      prior=prior)]
    else:
        obs = np.stack([w["obs"] for w in worlds])
        mask = np.ones(obs.shape[:3], bool)

        def solve():
            return mosh_stagei_solve_batched(model, obs, mask, labels, vids,
                                             m2b, type_masks, opts=opts,
                                             prior=prior)

    res = solve()                      # warmup / compile
    jax.block_until_ready(res[0].betas)

    t0 = time.perf_counter()
    res = solve()
    jax.block_until_ready(res[-1].betas)
    dt = time.perf_counter() - t0

    err_mm = float(np.mean([r.errs["data_mean_m"] for r in res])) * 1000.0
    rec = [_recovery_metrics(model, worlds[s], res[s], jax, jnp)
           for s in range(S)]
    rec_mean = {k: round(float(np.mean([r[k] for r in rec])), 5)
                for k in rec[0]}

    detail = {
        "frames": args.frames, "markers": args.markers, "verts": args.verts,
        "pose_dof": model.pose_dof, "subjects": S,
        "mean_marker_err_mm": round(err_mm, 4),
        "recovery": rec_mean,
        "subjects_per_hour": round(3600.0 * S / dt, 1),
        "device": str(jax.devices()[0]),
    }
    if args.scipy_anchor:
        t1 = time.perf_counter()
        detail["scipy_anchor_err_mm"] = round(
            _scipy_anchor(model, worlds[0], (vids, m2b, type_masks),
                          opts, prior, jax, jnp), 4)
        detail["scipy_anchor_seconds"] = round(time.perf_counter() - t1, 1)

    print(json.dumps({
        "metric": "stagei_seconds_per_subject",
        "value": round(dt / S, 3),
        "unit": "s",
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
