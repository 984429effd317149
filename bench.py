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

Timing protocol: median of BENCH_REPEATS (default 5) fully-synced solves
after a compile warmup — the tunneled chip shows ~4% run-to-run variance,
so a single sample cannot resolve a few-% regression. The detail block
additionally reports a measured hot-step roofline: the fused GN system
assembly (marker Jacobian kernels + normal-equation contraction) and the
fused dogleg-direction kernel are timed in isolation at the production
shape, and compared against an explicit per-iteration HBM-traffic model,
giving both bytes/s-vs-HBM-peak and FLOP/s-vs-MXU-peak utilizations so the
JSON states how much headroom remains and on which axis (measured r4: the
assembly runs at ~7% of HBM peak and <1% of bf16 FLOP peak — the step is
bound by Pallas kernel VPU time + the small-GEMM NE contraction, not by
memory, i.e. real headroom exists on both axes).
"""

import json
import time

import numpy as np

# TPU v5e (v5 lite) public specs: 819 GB/s HBM bandwidth, 197 bf16 TFLOP/s.
HBM_PEAK_GB_S = 819.0
BF16_PEAK_TFLOP_S = 197.0

# Window-probe nominals: the same two fixed-shape probe programs measured in
# a KNOWN-GOOD chip window (round 5). The tunneled chip shows whole windows
# that run ~20% slow on identical code+cache (STATUS round 4), which a raw
# throughput capture cannot distinguish from a code regression. The probes
# are solver-independent, so probe/nominal identifies the window speed inside
# the artifact itself. The RAW fps stays the number of record; the normalized
# figure is diagnostic.
PROBE_NOMINAL = {
    # measured round 5 in a good window (ideal: 0.70 ms at 197 TFLOP/s,
    # 0.625 ms at 819 GB/s — 95% / 75% of peak, so this window was healthy)
    "matmul_ms": 0.734,     # (4096,4096)x(4096,4096) bf16->f32 MXU chain
    "stream_ms": 0.832,     # 256 MB f32 axpy HBM-stream chain
}


def _make_window_probes(jax, jnp):
    """Two jitted fixed-shape probes: MXU matmul chain + HBM stream chain.

    Timing protocol: each probe is a `lax.scan` of K DEPENDENT iterations
    inside one program (the tunneled runtime dedups identical independent
    dispatches and adds ~30 ms of RTT per call, so naive per-op loops
    measure dispatch, not execution — verified by calibration). Per-iteration
    time comes from differencing a long and a short chain, which cancels the
    RTT and any fixed program overhead."""
    a0 = jnp.ones((4096, 4096), jnp.bfloat16)              # 137.4 GFLOP/iter
    big = jnp.ones((64, 1024, 1024), jnp.float32)          # 512 MB rw/iter
    K_LONG, K_SHORT = 60, 10

    def _mm_chain(k):
        @jax.jit
        def run(a):
            def body(c, _):
                c = jax.lax.dot_general(
                    c, a, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # 1/4096 is a power of two: the all-ones chain stays exactly
                # all-ones, no overflow, and the scale can't be folded away
                return (c * (1.0 / 4096.0)).astype(jnp.bfloat16), None
            c, _ = jax.lax.scan(body, a, None, length=k)
            return jnp.sum(c.astype(jnp.float32))
        return run

    def _st_chain(k):
        @jax.jit
        def run(x):
            def body(c, _):
                return c * 1.0000001 + 1e-7, None
            c, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(c)
        return run

    chains = {"mm": (_mm_chain(K_LONG), _mm_chain(K_SHORT), a0),
              "st": (_st_chain(K_LONG), _st_chain(K_SHORT), big)}
    for lng, sht, arg in chains.values():   # compile warmup
        jax.block_until_ready(lng(arg))
        jax.block_until_ready(sht(arg))

    def _t(fn, arg):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        return time.perf_counter() - t0

    def sample():
        out = []
        for lng, sht, arg in chains.values():
            dt = _t(lng, arg) - _t(sht, arg)
            out.append(max(dt, 1e-9) / (K_LONG - K_SHORT) * 1e3)
        return tuple(out)

    return sample


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

    # median-of-N timing: the tunneled chip shows ~4% run-to-run variance.
    # A fixed-shape window probe (MXU matmul + HBM stream) runs interleaved
    # with the solve samples: whole windows run ~20% slow on identical
    # code+cache, and probe/nominal makes that visible inside the artifact.
    probe = _make_window_probes(jax, jnp)
    probe()  # compile warmup
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    times, probes = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = solve(prob, jnp.asarray(obs), jnp.asarray(mask))
        jax.block_until_ready(res.trans)
        times.append(time.perf_counter() - t0)
        probes.append(probe())
    dt = float(np.median(times))
    probe_mm = float(np.median([p[0] for p in probes]))
    probe_st = float(np.median([p[1] for p in probes]))
    # window speed: how fast this window runs vs the pinned good-window
    # nominals (<1 = slow window). Geometric mean of the two probe ratios.
    window_speed = float(np.sqrt(
        (PROBE_NOMINAL["matmul_ms"] / probe_mm)
        * (PROBE_NOMINAL["stream_ms"] / probe_st)))

    fps = FRAMES / dt
    err_mm = float(np.mean(np.asarray(res.data_err))) * 1000.0

    # independent accuracy metric (outside the timed region): mean
    # vertex-to-vertex surface distance between the solved body and the
    # ground-truth body on a frame subsample — parameter recovery, not the
    # optimized marker objective, so it cannot flatter the solver.
    # Decomposed over OBSERVED vs UNOBSERVED surface: the 46 markers sit on
    # the body, so the ~48 hand-PCA dofs are only constrained through the
    # pose prior — hand v2v measures the prior's null-space wander, not
    # solver quality; body v2v is the number that must be sub-mm.
    sub = np.linspace(0, FRAMES - 1, 64).astype(int)
    fwd = jax.jit(jax.vmap(
        lambda p, t: lbs_forward(model, p, jnp.asarray(betas), t)))
    v_true = fwd(jnp.asarray(poses[sub]), jnp.asarray(trans[sub]))
    v_sol = fwd(jnp.asarray(np.asarray(res.pose)[sub]),
                jnp.asarray(np.asarray(res.trans)[sub]))
    v2v = jnp.linalg.norm(v_sol - v_true, axis=-1)          # (64, V)
    n_body_joints = 1 + model.info.body_pose_dof // 3
    dom_joint = np.argmax(np.asarray(model.weights), axis=1)
    body_vert = dom_joint < n_body_joints
    v2v_mm = float(jnp.mean(v2v)) * 1000.0
    v2v_body_mm = float(jnp.mean(v2v[:, body_vert])) * 1000.0
    v2v_hand_mm = float(jnp.mean(v2v[:, ~body_vert])) * 1000.0

    # The roofline section compiles two standalone programs (the fused
    # assembly + the direction kernel outside the solve loop) — several
    # minutes cold, cached afterwards. MOSHPP_BENCH_ROOFLINE=0 skips it;
    # any failure degrades to an error note instead of killing the bench.
    if os.environ.get("MOSHPP_BENCH_ROOFLINE", "1") == "1":
        try:
            roofline = _roofline(jax, jnp, prob, opts, prior, obs, mask,
                                 FRAMES, MARKERS, P, model)
        except Exception as e:  # noqa: BLE001 - report, don't kill the bench
            roofline = {"error": f"{type(e).__name__}: {e}"[:200]}
    else:
        roofline = {"skipped": True}

    print(json.dumps({
        "metric": "stageii_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 5000.0, 3),
        "detail": {
            "frames": FRAMES, "markers": MARKERS, "pose_dof": P,
            "mean_marker_err_mm": round(err_mm, 4),
            "v2v_surface_err_mm": round(v2v_mm, 4),
            "v2v_body_mm": round(v2v_body_mm, 4),
            "v2v_hands_mm": round(v2v_hand_mm, 4),
            "solve_seconds": round(dt, 3),
            "solve_seconds_all": [round(t, 3) for t in times],
            "window_probe": {
                "matmul_ms": round(probe_mm, 3),
                "stream_ms": round(probe_st, 3),
                "matmul_ms_all": [round(p[0], 3) for p in probes],
                "stream_ms_all": [round(p[1], 3) for p in probes],
                "nominal": PROBE_NOMINAL,
                "window_speed": round(window_speed, 3),
                "fps_window_normalized": round(fps / window_speed, 1),
            },
            "device": str(jax.devices()[0]),
            "roofline": roofline,
        },
    }))


def _roofline(jax, jnp, prob, opts, prior, obs, mask, F, M, P, model):
    """Measured hot-step roofline at the production shape.

    Times the two programs that dominate a dogleg iteration in isolation —
    (1) the fused GN system assembly (marker-Jacobian Pallas kernels + the
    normal-equation contraction) and (2) the fused dogleg-direction kernel —
    and compares each against an explicit HBM-traffic model. The traffic
    model (f32 bytes, per iteration over all F frames):

      assembly:  smalls FK streams write+read ((9+3+27+9+27)*J + feat) ...
                 jm write (F*3M*D), jm read for the NE einsum (counted
                 twice: B and g contractions), B write (F*D^2)
      direction: B read once (resident in VMEM across all CG iterations,
                 solver/pallas_pcg.py) + vector I/O

    FLOPs: NE contraction 2*F*3M*D^2 dominates assembly; direction is
    cg_iters * 2*F*D^2 VPU FMAs. The workload is HBM-bound (arithmetic
    intensity ~13 FLOP/byte < v5e's ~240 balance point at f32), so
    bytes/s vs HBM peak is the figure of merit.
    """
    from moshpp_tpu.pipeline.stageii import make_stageii_system, rigid_init
    from moshpp_tpu.solver.pallas_pcg import dogleg_direction_batched

    D = 3 + P
    J = model.num_joints
    featN = (J - 1) * 9

    system = make_stageii_system(prob, opts, prior, "smplh")
    sys_b = system.system_fn_batched or jax.vmap(system.system_fn)
    obs_j = jnp.asarray(obs, jnp.float32)
    maskf = jnp.asarray(mask, jnp.float32)
    n_obs = jnp.sum(maskf, axis=1)
    aux = {"markers": obs_j, "mask": maskf,
           "wt_data": opts.wt("data") * 46.0 / jnp.maximum(n_obs, 1.0),
           "anneal": jnp.ones((F,), jnp.float32),
           "wt_pose_scale": jnp.full((F,), 10.0, jnp.float32),
           "velo_anchor": jnp.zeros((F, P), jnp.float32),
           "velo_on": jnp.zeros((F,), jnp.float32),
           "extra_anchor": jnp.zeros((F, 0), jnp.float32),
           "extra_on": jnp.zeros((F,), jnp.float32)}
    x0 = rigid_init(prob, opts, obs_j, maskf)

    asm = jax.jit(lambda x, a: sys_b(x, a))
    out = jax.block_until_ready(asm(x0, aux))
    g, B = out[1], out[2]          # B frame-minor (D, D, N) on the fused path

    def timeit(fn, *args, n=10):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    t_asm = timeit(asm, x0, aux)

    pmask = jnp.ones((F, D), jnp.float32)
    delta = jnp.full((F,), 0.5, jnp.float32)
    plin = jnp.zeros((F, D), jnp.float32)
    dirk = jax.jit(lambda g_, B_, p_, m_, d_: dogleg_direction_batched(
        g_, B_, p_, m_, d_, iters=opts.cg_iters, damping=1e-8,
        b_frame_minor=system.b_frame_minor))
    t_dir = timeit(dirk, g, B, plin, pmask, delta)

    jm_b = F * 3 * M * D * 4
    b_b = F * D * D * 4
    smalls_b = ((9 + 3 + 27 + 9 + 27) * J + featN) * F * 4
    asm_bytes = 2 * smalls_b + jm_b + 2 * jm_b + b_b
    dir_bytes = b_b + 6 * F * D * 4
    asm_gflop = (2 * F * 3 * M * D * (D + 2)) / 1e9
    dir_gflop = (opts.cg_iters * 2 * F * D * D) / 1e9

    def row(t, by, gf):
        return {"ms": round(t * 1e3, 3),
                "model_hbm_mb": round(by / 2**20, 1),
                "gflop": round(gf, 2),
                "achieved_gb_s": round(by / t / 1e9, 1),
                "hbm_utilization": round(by / t / 1e9 / HBM_PEAK_GB_S, 3),
                "achieved_tflop_s": round(gf / 1e3 / t, 2)}

    return {
        "hbm_peak_gb_s": HBM_PEAK_GB_S,
        "bf16_peak_tflop_s": BF16_PEAK_TFLOP_S,
        "shape": {"F": F, "D": D, "3M": 3 * M, "J": J,
                  "cg_iters": opts.cg_iters},
        "system_assembly": row(t_asm, asm_bytes, asm_gflop),
        "dogleg_direction": row(t_dir, dir_bytes, dir_gflop),
        "step_ms": round((t_asm + t_dir) * 1e3, 3),
    }


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
