"""Multi-chip (shard_map) stage-ii correctness on the virtual CPU mesh.

The sharded driver runs the dogleg phases under `jax.shard_map` over the
frame axis (stageii._shard_solve) so the Pallas kernels can run per shard on
real hardware; here (CPU backend) the same shard_map program runs the XLA
assembly path, which is what pins the sharding itself: the sharded result
must match the unsharded solve of the identical problem.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moshpp_tpu.models import make_synthetic_model, lbs_forward
from moshpp_tpu.ops.marker_transform import (marker_coeffs,
                                             reconstruct_markers,
                                             select_frame_indices)
from moshpp_tpu.ops.surface import vertex_normals
from moshpp_tpu.pipeline.stageii import (StageIIOptions, mosh_stageii_solve,
                                         prepare_stageii_problem)
from moshpp_tpu.parallel.sharding import (frame_mesh, pad_frames,
                                          mosh_stageii_solve_sharded)
from moshpp_tpu.priors import make_gmm_prior


def _tiny_problem(frames=64, markers=46, seed=0):
    rng = np.random.default_rng(seed)
    model = make_synthetic_model("smplh", num_verts=600, seed=3,
                                 dof_per_hand=6)
    prior = make_gmm_prior(dim=63, num_components=4, seed=1, scale=0.3)
    V = model.v_template.shape[0]
    vids = rng.choice(V, markers, replace=False)
    betas = (rng.normal(size=16) * 0.4).astype(np.float32)
    can_v = np.asarray(model.v_template) + np.einsum(
        "vcb,b->vc", np.asarray(model.shapedirs)[..., :16], betas)
    vn = np.asarray(vertex_normals(jnp.asarray(can_v), model.faces))
    latents = can_v[vids] + vn[vids] * 0.0095
    idx = select_frame_indices(jnp.asarray(can_v), jnp.asarray(latents))
    coeffs = marker_coeffs(jnp.asarray(can_v), jnp.asarray(latents), idx)
    P = model.pose_dof
    poses = np.zeros((frames, P), np.float32)
    poses[0] = rng.normal(size=P) * 0.15
    for t in range(1, frames):
        poses[t] = (0.97 * poses[t - 1]
                    + rng.normal(size=P).astype(np.float32) * 0.02)
    trans = np.cumsum(rng.normal(size=(frames, 3)) * 0.005, 0).astype(np.float32)

    def simf(p, t):
        verts = lbs_forward(model, p, jnp.asarray(betas), t)
        return reconstruct_markers(verts, idx, coeffs)

    obs = np.asarray(jax.jit(jax.vmap(simf))(jnp.asarray(poses),
                                             jnp.asarray(trans)))
    mask = np.ones((frames, markers), bool)
    return model, betas, latents, prior, obs, mask


@pytest.mark.slow
def test_sharded_matches_unsharded():
    """8-device mesh result == single-device result (same problem, same
    schedule) — the assertion that pins SPMD correctness, not just shape."""
    model, betas, latents, prior, obs, mask = _tiny_problem()
    opts = StageIIOptions(maxiter=40, smoothing_sweeps=1,
                          optimize_fingers=True)
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)

    res_u = mosh_stageii_solve(prob, opts, jnp.asarray(obs),
                               jnp.asarray(mask, jnp.float32), prior=prior,
                               model_type="smplh")
    mesh = frame_mesh(jax.devices()[:8])
    res_s = mosh_stageii_solve_sharded(prob, opts, obs, mask, prior=prior,
                                       model_type="smplh", mesh=mesh)

    err_u = float(np.mean(np.asarray(res_u.data_err)))
    err_s = float(np.mean(np.asarray(res_s.data_err)))
    assert abs(err_u - err_s) < 5e-5          # same mean accuracy (m)
    dev = np.abs(np.asarray(res_s.markers_sim)
                 - np.asarray(res_u.markers_sim))
    assert dev.max() < 2e-4                   # <=0.2 mm any marker, any frame
    assert np.asarray(res_s.fullpose).shape == np.asarray(res_u.fullpose).shape


@pytest.mark.slow
def test_sharded_pallas_assembly_interpret():
    """Force the Pallas system assembly inside shard_map (interpret mode on
    CPU): validates the kernel path the real TPU mesh runs, end to end."""
    model, betas, latents, prior, obs, mask = _tiny_problem(frames=16)
    opts = StageIIOptions(maxiter=6, smoothing_sweeps=0, anchor_stride=1,
                          jac_backend="pallas", compact_buckets=())
    prob = prepare_stageii_problem(model, betas, latents, opts=opts)
    mesh = frame_mesh(jax.devices()[:2])
    res = mosh_stageii_solve_sharded(prob, opts, obs, mask, prior=prior,
                                     model_type="smplh", mesh=mesh)
    assert np.isfinite(np.asarray(res.trans)).all()
    assert np.isfinite(np.asarray(res.data_err)).all()


def test_pad_frames_roundtrip():
    obs = np.ones((10, 4, 3), np.float32)
    mask = np.ones((10, 4), bool)
    obs_p, mask_p, F = pad_frames(obs, mask, 8)
    assert obs_p.shape[0] == 16 and F == 10
    assert not mask_p[10:].any()


@pytest.mark.slow
def test_chunked_composes_with_sharding():
    """chunk_frames + mesh: each fixed chunk window is rounded up to a
    device-count multiple and solved sharded; the composition must match
    the unsharded unchunked solve."""
    model, betas, latents, prior, obs, mask = _tiny_problem(frames=40,
                                                            markers=12)
    base = dict(maxiter=30, smoothing_sweeps=1, anchor_stride=4)
    prob = prepare_stageii_problem(
        model, betas, latents, opts=StageIIOptions(**base))

    res_ref = mosh_stageii_solve(
        prob, StageIIOptions(**base, chunk_frames=0), jnp.asarray(obs),
        jnp.asarray(mask, jnp.float32), prior=prior, model_type="smplh")
    mesh = frame_mesh(jax.devices()[:8])
    # window = 16 + 2*6 = 28 -> rounded to 32 for the 8-device mesh
    res_cs = mosh_stageii_solve_sharded(
        prob, StageIIOptions(**base, chunk_frames=16, chunk_halo=6),
        obs, mask, prior=prior, model_type="smplh", mesh=mesh)

    assert np.asarray(res_cs.trans).shape == (40, 3)
    err_r = float(np.mean(np.asarray(res_ref.data_err)))
    err_c = float(np.mean(np.asarray(res_cs.data_err)))
    assert abs(err_r - err_c) < 1e-4
    dev = np.abs(np.asarray(res_cs.markers_sim)
                 - np.asarray(res_ref.markers_sim))
    assert dev.max() < 1e-3        # <= 1 mm any marker, any frame
