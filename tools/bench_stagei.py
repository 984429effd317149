#!/usr/bin/env python
"""Benchmark: stage-I solve wall time (shape + latent markers + 12 poses).

Stage-i runs once per subject (vs stage-ii once per frame), so the metric is
seconds per subject at the production configuration: real-scale SMPL+H body
(6890 verts), 46 markers, 12 frames, the full 4-step annealing schedule with
maxiter=100 per step (chmosh.py:313-415). The reference solves the same
12-frame shared-beta problem in minutes on CPU.

Usage: python tools/bench_stagei.py [--frames N] [--cpu] [--maxiter K]
Prints one JSON line: {"metric": "stagei_seconds_per_subject", ...}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--markers", type=int, default=46)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--dof-per-hand", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
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
    from moshpp_tpu.pipeline.stagei import StageIOptions, mosh_stagei_solve
    from moshpp_tpu.priors import make_gmm_prior, sample_gmm_prior

    rng = np.random.default_rng(0)
    model = make_synthetic_model("smplh", num_verts=args.verts, seed=3,
                                 dof_per_hand=args.dof_per_hand)
    prior = make_gmm_prior(dim=63, num_components=8, seed=1, scale=0.3)

    # ground-truth subject + sampled stage-i frames
    V = model.v_template.shape[0]
    vids = rng.choice(V, args.markers, replace=False)
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
    mask = np.ones((F, args.markers), bool)
    labels = [f"M{i:02d}" for i in range(args.markers)]
    type_masks = {"body": np.ones(args.markers, bool)}
    m2b = np.full(args.markers, 0.0095, np.float32)

    opts = StageIOptions(maxiter=args.maxiter)

    def solve():
        return mosh_stagei_solve(model, obs, mask, labels, vids, m2b,
                                 type_masks, opts=opts, prior=prior)

    res = solve()                      # warmup / compile
    jax.block_until_ready(res.betas)

    t0 = time.perf_counter()
    res = solve()
    jax.block_until_ready(res.betas)
    dt = time.perf_counter() - t0

    err_mm = float(res.errs["data_mean_m"]) * 1000.0
    print(json.dumps({
        "metric": "stagei_seconds_per_subject",
        "value": round(dt, 3),
        "unit": "s",
        "detail": {
            "frames": F, "markers": args.markers, "verts": args.verts,
            "pose_dof": P, "mean_marker_err_mm": round(err_mm, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
