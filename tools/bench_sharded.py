"""Frame-sharded stage-ii scaling curve over a device mesh.

On a real TPU pod this measures wall-clock scaling over ICI. On the virtual
CPU mesh (the only option in this environment) the numbers are
correctness-only: the 8 "devices" share one host's cores, so per-device
compute does not scale and the curve UNDERSTATES real hardware (measured
0.35x at 8 virtual devices — sync-bound, since every dogleg iteration
all-reduces the active-frame count and compaction argsorts globally; both
are <2 MB collectives on real ICI). Run on a pod for the true curve."""
import json, os, sys, time
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from moshpp_tpu.utils.cache import setup_jax_cache
setup_jax_cache("/tmp/moshpp_tpu_jax_cache_cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.ops.marker_transform import marker_coeffs, reconstruct_markers, select_frame_indices
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import StageIIOptions, prepare_stageii_problem
from moshpp_tpu.parallel.sharding import mosh_stageii_solve_sharded

rng = np.random.default_rng(3)
model = make_synthetic_model("smplh", num_verts=800, seed=5, dof_per_hand=6)
betas = (rng.normal(size=16)*0.4).astype(np.float32)
can_v = np.asarray(model.v_template) + np.einsum("vcb,b->vc", np.asarray(model.shapedirs)[...,:16], betas)
vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
vids = rng.choice(800, 20, replace=False)
latents = can_v[vids] + vn[vids]*0.0095
idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
F = 256
P = model.pose_dof
poses = np.zeros((F, P), np.float32)
poses[0] = rng.normal(size=P)*0.1
for t in range(1, F):
    poses[t] = 0.97*poses[t-1] + rng.normal(size=P).astype(np.float32)*0.02
trans = np.cumsum(rng.normal(size=(F,3))*0.005, 0).astype(np.float32)
obs = np.asarray(jax.jit(jax.vmap(lambda p, t: reconstruct_markers(
    lbs_forward(model, p, jnp.asarray(betas), t), idx, coeffs)))(
        jnp.asarray(poses), jnp.asarray(trans)))
mask = np.ones((F, 20), bool)
# 'auto': Pallas kernels per shard on real TPU hardware; the XLA einsum
# chain on this virtual CPU mesh (interpret-mode kernels would swamp the
# timing — kernel-assembly correctness under shard_map is pinned by
# tests/test_sharding.py::test_sharded_pallas_assembly_interpret)
opts = StageIIOptions(maxiter=40, smoothing_sweeps=1, jac_backend="auto")
prob = prepare_stageii_problem(model, betas, latents, opts=opts)

out = []
for nd in (1, 2, 4, 8):
    mesh = Mesh(np.asarray(jax.devices()[:nd]), ("frames",))
    r = mosh_stageii_solve_sharded(prob, opts, obs, mask, model_type="smplh", mesh=mesh)
    t0 = time.perf_counter()
    r = mosh_stageii_solve_sharded(prob, opts, obs, mask, model_type="smplh", mesh=mesh)
    dt = time.perf_counter()-t0
    out.append({"devices": nd, "fps": round(F/dt, 1),
                "err_mm": round(float(np.mean(r.data_err))*1000, 4)})
    print(json.dumps(out[-1]), flush=True)
sp = out[-1]["fps"]/out[0]["fps"]
print(json.dumps({"metric": "stageii_sharded_scaling", "speedup_8dev": round(sp,2),
                  "curve": out}), flush=True)
