#!/usr/bin/env python
"""Hands-v2v null-space mitigation experiment (STATUS r5, VERDICT r4 item 5).

Round-4 diagnosis: markers sit on the body, so the ~48 hand-PCA dofs are
observable only through the pose prior — batched solving weakens the
implicit temporal regularizer the reference gets for free from sequential
warm starts + its velocity term (chmosh.py:596-655), and hands wander in the
prior's null space (8.25 mm v2v at 0.415 mm marker fit).

This experiment measures, on the bench world (same generator as bench.py,
smaller F), hands v2v vs marker fit across the two available levers:
  (a) `velo_hands`: extra temporal-smoothness weight on hand dofs only —
      the reference's implicit regularizer made explicit;
  (b) `poseH`: stronger hand prior pull-to-zero (the reference's per-part
      weight tables, moshpp_conf.yaml:103-173, expose exactly this knob).

Output: one JSON line per config {config, marker_err_mm, v2v_body_mm,
v2v_hands_mm, seconds} plus a final recommendation line. Acceptance per
VERDICT: hands v2v materially below 8.25 mm at <= 0.5 mm marker fit, or a
recorded negative result.

Usage: python tools/experiment_hands.py [--frames 512] [--maxiter 100]
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
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--maxiter", type=int, default=100)
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
    from moshpp_tpu.pipeline.stageii import (DEFAULT_STAGEII_WEIGHTS,
                                             StageIIOptions,
                                             mosh_stageii_solve,
                                             prepare_stageii_problem)
    from moshpp_tpu.priors import make_gmm_prior

    F, M = args.frames, 46
    rng = np.random.default_rng(0)
    model = make_synthetic_model("smplh", num_verts=6890, seed=3,
                                 dof_per_hand=24)
    prior = make_gmm_prior(dim=63, num_components=8, seed=1, scale=0.3)

    V = model.v_template.shape[0]
    vids = rng.choice(V, M, replace=False)
    betas = (rng.normal(size=16) * 0.4).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)

    P = model.pose_dof
    poses = np.zeros((F, P), np.float32)
    poses[0] = rng.normal(size=P) * 0.15
    for t in range(1, F):
        poses[t] = 0.97 * poses[t - 1] + rng.normal(size=P).astype(np.float32) * 0.02
    trans = np.cumsum(rng.normal(size=(F, 3)) * 0.005, 0).astype(np.float32)

    def sim(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas), t)
        return reconstruct_markers(verts, idx, coeffs)

    obs = jnp.asarray(jax.jit(jax.vmap(sim))(jnp.asarray(poses),
                                             jnp.asarray(trans)))
    mask = jnp.ones((F, M), bool)

    # v2v decomposition machinery (same as bench.py)
    sub = np.linspace(0, F - 1, 64).astype(int)
    fwd = jax.jit(jax.vmap(
        lambda p, t: lbs_forward(model, p, jnp.asarray(betas), t)))
    v_true = fwd(jnp.asarray(poses[sub]), jnp.asarray(trans[sub]))
    n_body_joints = 1 + model.info.body_pose_dof // 3
    dom_joint = np.argmax(np.asarray(model.weights), axis=1)
    body_vert = dom_joint < n_body_joints

    def run(name, **wt_over):
        wts = dict(DEFAULT_STAGEII_WEIGHTS)
        wts.update(wt_over)
        opts = StageIIOptions(maxiter=args.maxiter, smoothing_sweeps=2,
                              optimize_fingers=True, weights=wts)
        prob = prepare_stageii_problem(model, betas, latents, opts=opts)
        t0 = time.perf_counter()
        res = mosh_stageii_solve(prob, opts, obs, mask, prior=prior,
                                 model_type="smplh")
        jax.block_until_ready(res.trans)
        dt = time.perf_counter() - t0
        v_sol = fwd(jnp.asarray(np.asarray(res.pose)[sub]),
                    jnp.asarray(np.asarray(res.trans)[sub]))
        v2v = jnp.linalg.norm(v_sol - v_true, axis=-1)
        out = {
            "config": name, **wt_over,
            "marker_err_mm": round(
                float(np.mean(np.asarray(res.data_err))) * 1000.0, 4),
            "v2v_body_mm": round(
                float(jnp.mean(v2v[:, body_vert])) * 1000.0, 3),
            "v2v_hands_mm": round(
                float(jnp.mean(v2v[:, ~body_vert])) * 1000.0, 3),
            "seconds": round(dt, 2),
        }
        print(json.dumps(out), flush=True)
        return out

    results = [run("baseline")]
    for vh in (4.0, 16.0, 64.0):
        results.append(run(f"velo_hands_x{vh:g}", velo_hands=vh))
    for ph in (2.0, 4.0, 8.0):
        results.append(run(f"poseH_x{ph:g}", poseH=ph))
    # combine the best of each family
    best_vh = min(results[1:4], key=lambda r: r["v2v_hands_mm"])
    best_ph = min(results[4:7], key=lambda r: r["v2v_hands_mm"])
    results.append(run("combined", velo_hands=best_vh["velo_hands"],
                       poseH=best_ph["poseH"]))

    ok = [r for r in results if r["marker_err_mm"] <= 0.5]
    best = min(ok, key=lambda r: r["v2v_hands_mm"]) if ok else None
    print(json.dumps({
        "recommendation": best["config"] if best else "none",
        "baseline_hands_mm": results[0]["v2v_hands_mm"],
        "best_hands_mm": best["v2v_hands_mm"] if best else None,
        "constraint": "marker_err_mm <= 0.5",
    }))


if __name__ == "__main__":
    main()
