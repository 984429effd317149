"""Multi-chip scaling of the MoSh solvers over a JAX device mesh.

The reference scales by launching many independent CPU processes with
filesystem job claiming (`tools/run_tools.py:45-67`); here the frame axis of
stage-ii — embarrassingly parallel after pass A, Jacobi-coupled in pass B —
is sharded over a TPU mesh with `jax.sharding.NamedSharding`, so one program
solves a whole sequence (or a batch of sequences) across chips over ICI. The
only cross-chip data dependence is the velocity-anchor halo in the smoothing
sweeps (a shifted gather XLA lowers to a ppermute-style collective).

Multi-host AMASS-scale sweeps compose this with `jax.distributed` process
groups over DCN, one sequence batch per host group, plus the idempotent
filesystem cache in `pipeline/jobs.py` for fleet-level retries.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshpp_tpu.pipeline.stageii import (StageIIOptions, StageIIProblem,
                                         StageIIResult, mosh_stageii_solve)


def frame_mesh(devices=None, axis_name: str = "frames") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_frames(obs: np.ndarray, mask: np.ndarray, multiple: int):
    """Pad the frame axis to a device-count multiple with all-missing frames.

    Padded frames have zero observed markers; the solver's per-frame weights
    are availability-driven so they converge instantly and are sliced away.
    """
    F = obs.shape[0]
    pad = (-F) % multiple
    if pad == 0:
        return obs, mask, F
    obs_p = np.concatenate([obs, np.zeros((pad,) + obs.shape[1:], obs.dtype)])
    mask_p = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], bool)])
    return obs_p, mask_p, F


def mosh_stageii_solve_sharded(prob: StageIIProblem,
                               opts: StageIIOptions,
                               obs: np.ndarray,
                               mask: np.ndarray,
                               prior=None,
                               model_type: Optional[str] = None,
                               mesh: Optional[Mesh] = None) -> StageIIResult:
    """Stage-ii solve with the frame axis sharded over the mesh.

    The problem context (subsetted model, coeffs, betas, prior) is replicated;
    observations/masks/results are frame-sharded. Each shard runs the full
    fused schedule on its local frames under `shard_map` — anchor passes and
    in-graph straggler compaction stay *local* to the shard (no cross-chip
    sync inside the dogleg loops), and the smoothing sweeps' 2-frame velocity
    halo crosses shard boundaries via `ppermute` over ICI. Works on any
    device count that divides the (padded) frame count.
    """
    mesh = mesh if mesh is not None else frame_mesh()
    n_dev = np.prod([mesh.shape[a] for a in mesh.axis_names])
    axis = mesh.axis_names[0]
    obs_p, mask_p, F = pad_frames(np.asarray(obs, np.float32),
                                  np.asarray(mask, bool), int(n_dev))

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    obs_d = jax.device_put(jnp.asarray(obs_p, jnp.float32), shard)
    mask_d = jax.device_put(jnp.asarray(mask_p, jnp.float32), shard)
    prob_d = jax.device_put(prob, repl)
    prior_d = jax.device_put(prior, repl) if prior is not None else prior

    # Same cached per-phase programs as the single-chip path, but the dogleg
    # solves run under `jax.shard_map` over the frame axis (stageii._shard_solve):
    # the Pallas marker-Jacobian and PCG kernels — which have no SPMD
    # partitioning rule under auto-sharded jit — run unchanged on each
    # shard's LOCAL frames, so per-chip throughput matches the single-chip
    # kernel path. Straggler compaction and while-loop termination are
    # shard-local (no per-iteration cross-chip sync); only the velocity
    # anchors (computed on the global array, outside shard_map) and the
    # anchor-interpolation gathers cross shard boundaries, via the tiny
    # collectives XLA inserts.
    res = mosh_stageii_solve(prob_d, opts, obs_d, mask_d, prior=prior_d,
                             model_type=model_type, mesh=mesh)
    return StageIIResult(*(np.asarray(v)[:F] for v in res))
