#!/usr/bin/env python
"""A/B bench harness: bench.py protocol with model-family + StageIIOptions
overrides. The committed form of the round-2/3 tuning harness — bench.py is
the driver-facing single number; this measures everything else.

Usage:
  python tools/bench_variants.py '{"model_type": "smplx", "optimize_face":
      true, "num_expressions": 10, "repeat": 3}'

Extra (non-StageIIOptions) keys: repeat (default 2, best-of), frames
(default 4096), model_type (default smplh), num_shape_dirs / dof_per_hand
(synthetic-model knobs). Everything else goes into StageIIOptions, so any
solver lever (fold_weights, compact_buckets, cg_iters_polish, ...) can be
A/B'd. Env levers (e.g. MOSHPP_FUSED_EXTRA_REDUCE=1) are set outside.

Headline variants (STATUS.md):
  {"model_type": "smplh"}                                           body+hands
  {"model_type": "smplh", "optimize_dynamics": true}                + 8 dmpls
  {"model_type": "smplx"}                                           body+hands
  {"model_type": "smplx", "optimize_face": true}                    + 10 exprs
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from moshpp_tpu.utils.cache import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp

    from moshpp_tpu.models import make_synthetic_model, lbs_forward
    from moshpp_tpu.models.body_model import pose_part_ids
    from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                                 reconstruct_markers,
                                                 select_frame_indices)
    from moshpp_tpu.ops.surface import vertex_normals
    from moshpp_tpu.pipeline.stageii import (StageIIOptions,
                                             mosh_stageii_solve,
                                             prepare_stageii_problem)
    from moshpp_tpu.priors import make_gmm_prior

    over = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    repeat = over.pop("repeat", 2)
    FRAMES = over.pop("frames", 4096)
    model_type = over.pop("model_type", "smplh")
    mk = {}
    for k in ("num_shape_dirs", "dof_per_hand"):
        if k in over:
            mk[k] = over.pop(k)
    mk.setdefault("dof_per_hand", 24)
    if model_type in ("smpl", "animal_horse", "animal_dog"):
        mk.pop("dof_per_hand")
    MARKERS = 46
    rng = np.random.default_rng(0)

    model = make_synthetic_model(model_type, num_verts=6890, seed=3, **mk)
    pdim = len(pose_part_ids(model_type, optimize_toes=True)["body"])
    prior = make_gmm_prior(dim=pdim, num_components=8, seed=1, scale=0.3)

    V = model.v_template.shape[0]
    vids = rng.choice(V, MARKERS, replace=False)
    betas = (rng.normal(size=16) * 0.4).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)

    P = model.pose_dof
    poses = np.zeros((FRAMES, P), np.float32)
    poses[0] = rng.normal(size=P) * 0.15
    for t in range(1, FRAMES):
        poses[t] = (0.97 * poses[t - 1]
                    + rng.normal(size=P).astype(np.float32) * 0.02)
    trans = np.cumsum(rng.normal(size=(FRAMES, 3)) * 0.005,
                      0).astype(np.float32)

    def sim(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas), t)
        return reconstruct_markers(verts, idx, coeffs)

    obs = np.asarray(jax.jit(jax.vmap(sim))(jnp.asarray(poses),
                                            jnp.asarray(trans)))
    mask = np.ones((FRAMES, MARKERS), bool)

    base = dict(maxiter=100, smoothing_sweeps=2)
    if model.dof_per_hand:
        base["optimize_fingers"] = True
    if "compact_buckets" in over:
        over["compact_buckets"] = tuple(over["compact_buckets"])
    base.update(over)
    opts = StageIIOptions(**base)
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)
    if prob.pallas_tables is not None:
        print(f"# n_extra={prob.pallas_tables.n_extra}", file=sys.stderr)

    def solve(pr, o, m):
        return mosh_stageii_solve(pr, opts, o, m, prior=prior,
                                  model_type=model_type)

    t0 = time.perf_counter()
    res = solve(prob, jnp.asarray(obs), jnp.asarray(mask))   # compile
    jax.block_until_ready(res.trans)
    # wall time of the first solve = compile+run (compile-cache-warm if the
    # cache has entries; run with a fresh MOSHPP_JAX_CACHE to measure cold).
    # Recorded for the E=80 operational-viability question (VERDICT r4 #2).
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        res = solve(prob, jnp.asarray(obs), jnp.asarray(mask))
        jax.block_until_ready(res.trans)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    err_mm = float(np.mean(np.asarray(res.data_err))) * 1000.0
    print(json.dumps({
        "fps": round(FRAMES / dt, 1), "err_mm": round(err_mm, 4),
        "times": [round(t, 4) for t in times],
        "first_solve_seconds": round(compile_s, 1),
        "model_type": model_type, "overrides": base,
        "fused_extra_reduce": __import__(
            "moshpp_tpu.ops.pallas_marker_jac", fromlist=["x"]
        ).FUSED_EXTRA_REDUCE,   # module truth (env default is ON since r4)
    }))


if __name__ == "__main__":
    main()
