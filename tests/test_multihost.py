"""Multi-host (jax.distributed) integration: two real processes on CPU
devices solve one frame-sharded stage-ii problem and must reproduce the
single-process result. This is the DCN-scaling path of SURVEY §7 exercised
end-to-end without a pod."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["MOSHPP_REPO"])
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from moshpp_tpu.parallel.multihost import (distribute_jobs,
                                           initialize_multihost,
                                           mosh_stageii_solve_multihost)
from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import StageIIOptions, prepare_stageii_problem

initialize_multihost(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc      # 4 local cpu devices per process

rng = np.random.default_rng(0)
model = make_synthetic_model("smplh", num_verts=300, seed=5, dof_per_hand=6)
betas = (rng.normal(size=10) * 0.3).astype(np.float32)
can_v = np.asarray(model.v_template) + np.einsum(
    "vcb,b->vc", np.asarray(model.shapedirs)[..., :10], betas)
vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
vids = rng.choice(300, 10, replace=False)
latents = can_v[vids] + vn[vids] * 0.0095
idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)

F = 16                                       # global frames (8 per process)
P = model.pose_dof
poses = np.zeros((F, P), np.float32)
poses[0] = rng.normal(size=P) * 0.1
for t in range(1, F):
    poses[t] = 0.97 * poses[t - 1] + rng.normal(size=P).astype(np.float32) * 0.02
trans = np.cumsum(rng.normal(size=(F, 3)) * 0.004, 0).astype(np.float32)
obs = np.stack([np.asarray(reconstruct_markers(
    lbs_forward(model, jnp.asarray(poses[t]), jnp.asarray(betas),
                jnp.asarray(trans[t])), idx, coeffs)) for t in range(F)])
mask = np.ones((F, 10), np.float32)

opts = StageIIOptions(maxiter=25, smoothing_sweeps=1, anchor_stride=4,
                      num_betas=10, jac_backend="xla")
prob = prepare_stageii_problem(model, betas, latents, opts=opts)
Fl = F // nproc
res = mosh_stageii_solve_multihost(
    prob, opts, obs[pid * Fl:(pid + 1) * Fl], mask[pid * Fl:(pid + 1) * Fl],
    model_type="smplh")
assert res.trans.shape == (Fl, 3)

jobs = [{"job": i} for i in range(5)]
mine = distribute_jobs(jobs)
out = {"pid": pid, "err_mm": float(np.mean(res.data_err)) * 1000.0,
       "jobs": [j["job"] for j in mine]}
print("RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_two_process_sharded_solve(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ,
               MOSHPP_REPO=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-4000:]
        outs.append(out)

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}
    for r in results.values():
        assert r["err_mm"] < 5.0, r
    # round-robin job partition covers everything exactly once
    assert sorted(results[0]["jobs"] + results[1]["jobs"]) == [0, 1, 2, 3, 4]
