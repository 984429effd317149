#!/usr/bin/env python
"""Benchmark: stage-II mocap solve throughput (frames/sec/chip).

Protocol: a real-scale SMPL+H problem — 10k-vertex synthetic body (same
tensor shapes and FLOP profile as the licensed SMPL+H model), 46 markers,
dof_per_hand=24 (pose dof 114), 8-component GMM body prior — solving BATCH
frames of synthetic mocap generated from ground-truth motion, with the full
production schedule (3 annealed prior solves + step-1 + step-2 + 2 smoothing
sweeps, maxiter=100, the reference's stage-ii configuration).

Prints one JSON line: frames/sec/chip vs the 5k north-star
(BASELINE.json). The reference implementation solves these frames
sequentially on CPU at O(1) fps.
"""

import json
import time

import numpy as np


def main():
    import os
    import jax
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

    FRAMES = int(os.environ.get("BENCH_FRAMES", "4096"))
    MARKERS = 46
    rng = np.random.default_rng(0)

    model = make_synthetic_model("smplh", num_verts=6890, seed=3,
                                 dof_per_hand=24)
    prior = make_gmm_prior(dim=63, num_components=8, seed=1, scale=0.3)

    # ground-truth subject + motion
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
        poses[t] = 0.97 * poses[t - 1] + rng.normal(size=P).astype(np.float32) * 0.02
    trans = np.cumsum(rng.normal(size=(FRAMES, 3)) * 0.005, 0).astype(np.float32)

    def sim(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas), t)
        return reconstruct_markers(verts, idx, coeffs)

    obs = np.asarray(jax.jit(jax.vmap(sim))(jnp.asarray(poses), jnp.asarray(trans)))
    mask = np.ones((FRAMES, MARKERS), bool)

    # combined body+hands solve (BASELINE.json config 3); on the synthetic
    # skeleton the hand-PCA dofs move real surface area, so they must be free
    opts = StageIIOptions(maxiter=100, smoothing_sweeps=2, optimize_fingers=True)
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)

    def solve(pr, o, m):
        # one compiled dogleg step shared by all 7 phases (jit_step inside)
        return mosh_stageii_solve(pr, opts, o, m, prior=prior,
                                  model_type="smplh")

    # warmup / compile
    res = solve(prob, jnp.asarray(obs), jnp.asarray(mask))
    jax.block_until_ready(res.trans)

    t0 = time.perf_counter()
    res = solve(prob, jnp.asarray(obs), jnp.asarray(mask))
    jax.block_until_ready(res.trans)
    dt = time.perf_counter() - t0

    fps = FRAMES / dt
    err_mm = float(np.mean(np.asarray(res.data_err))) * 1000.0

    # independent accuracy metric (outside the timed region): mean
    # vertex-to-vertex surface distance between the solved body and the
    # ground-truth body on a frame subsample — parameter recovery, not the
    # optimized marker objective, so it cannot flatter the solver
    sub = np.linspace(0, FRAMES - 1, 64).astype(int)
    fwd = jax.jit(jax.vmap(
        lambda p, t: lbs_forward(model, p, jnp.asarray(betas), t)))
    v_true = fwd(jnp.asarray(poses[sub]), jnp.asarray(trans[sub]))
    v_sol = fwd(jnp.asarray(np.asarray(res.pose)[sub]),
                jnp.asarray(np.asarray(res.trans)[sub]))
    v2v_mm = float(jnp.mean(
        jnp.linalg.norm(v_sol - v_true, axis=-1))) * 1000.0

    print(json.dumps({
        "metric": "stageii_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 5000.0, 3),
        "detail": {
            "frames": FRAMES, "markers": MARKERS, "pose_dof": P,
            "mean_marker_err_mm": round(err_mm, 4),
            "v2v_surface_err_mm": round(v2v_mm, 4),
            "solve_seconds": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }))


def _backend_alive(timeout_s=90):
    """Cheap probe: can a fresh interpreter see a device and run one op?

    The tunneled TPU backend sometimes HANGS at init during outages (rather
    than erroring), so the probe gets its own hard timeout — this keeps a
    dead backend from eating a whole heavy-bench attempt. A silent fallback
    to CPU counts as DEAD (the metric is frames/sec/*chip*) unless the run
    explicitly targets CPU via JAX_PLATFORMS/MOSHPP_BENCH_ALLOW_CPU."""
    import os
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); (x @ x).block_until_ready(); "
            "print(jax.devices()[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code], env=os.environ,
                           capture_output=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    if r.returncode != 0:
        return False
    platform = r.stdout.decode().strip().splitlines()[-1] if r.stdout else ""
    cpu_ok = (os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
              or os.environ.get("MOSHPP_BENCH_ALLOW_CPU"))
    return platform != "cpu" or cpu_ok


def _main_with_retries():
    """Re-exec the bench in a child process with retries.

    The tunneled TPU backend occasionally fails at init or compile with a
    transient UNAVAILABLE (or hangs entirely during an outage); a failed
    backend cannot be re-initialized in-process, so probe first, then run
    in a fresh interpreter with a hard per-attempt timeout. The child's
    stdout (the one JSON line) passes straight through."""
    import os
    import subprocess
    import sys

    if os.environ.get("MOSHPP_BENCH_INNER"):
        main()
        return

    # wait (bounded) for the backend before burning heavy attempts
    for probe in range(10):
        if _backend_alive():
            break
        print(f"bench: backend probe {probe + 1}/10 failed",
              file=sys.stderr)
        if probe == 9:
            print("bench: backend unavailable after ~35 min of probing; "
                  "giving up (a heavy attempt would also fail)",
                  file=sys.stderr)
            sys.exit(69)      # EX_UNAVAILABLE
        time.sleep(120)

    rc = 1
    for attempt in range(3):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "MOSHPP_BENCH_INNER": "1"},
                timeout=int(os.environ.get("MOSHPP_BENCH_TIMEOUT", "2400")),
            ).returncode
        except subprocess.TimeoutExpired:
            rc = 124
        if rc == 0:
            break
        print(f"bench attempt {attempt + 1} failed (rc={rc}); retrying",
              file=sys.stderr)
        time.sleep(90)
    sys.exit(rc)


if __name__ == "__main__":
    _main_with_retries()
