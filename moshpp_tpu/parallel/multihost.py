"""Multi-host (DCN) scaling of the MoSh solvers.

The reference scales beyond one machine with shared-filesystem job claiming
(`/root/reference/src/moshpp/tools/run_tools.py:45-67`); this module provides
the TPU-native equivalents:

* `initialize_multihost` — `jax.distributed` process-group setup; after it,
  `jax.devices()` spans every host's chips and one SPMD program runs across
  hosts with XLA inserting ICI collectives within a slice and DCN transfers
  across slices.
* `global_frame_mesh` + `mosh_stageii_solve_multihost` — the stage-ii frame
  axis sharded over ALL hosts' devices. Each process feeds only its local
  frame shard (`jax.make_array_from_process_local_data`), runs the same
  phase programs as the single-host path, and reads back its shard —
  sequences far beyond one host's HBM solve as one program.
* `distribute_jobs` — deterministic per-process partition of a MoSh job list
  (the fleet pattern for many independent sequences: no cross-host
  communication at all, resumable through the idempotent stage caches in
  `pipeline/head.py`). Prefer this whenever there are >= num_processes
  sequences; use the sharded solve for single very long sequences.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshpp_tpu.pipeline.stageii import (StageIIOptions, StageIIProblem,
                                         StageIIResult, mosh_stageii_solve)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join the jax.distributed process group (idempotent).

    With no arguments, reads the standard env configuration (TPU pods
    auto-configure; elsewhere set JAX_COORDINATOR_ADDRESS etc. or pass
    explicitly)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e):
            raise


def global_frame_mesh(axis_name: str = "frames") -> Mesh:
    """One-axis mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def distribute_jobs(jobs: Sequence[dict],
                    process_id: Optional[int] = None,
                    num_processes: Optional[int] = None) -> List[dict]:
    """Deterministic round-robin slice of a job list for this process.

    Replaces the reference's filesystem job claiming with a race-free
    static partition; crash recovery comes from the idempotent per-stage
    caches (a re-run skips completed stages)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [j for i, j in enumerate(jobs) if i % n == pid]


def mosh_stageii_solve_multihost(prob: StageIIProblem,
                                 opts: StageIIOptions,
                                 obs_local: np.ndarray,
                                 mask_local: np.ndarray,
                                 prior=None,
                                 model_type: Optional[str] = None,
                                 mesh: Optional[Mesh] = None) -> StageIIResult:
    """Stage-ii solve with frames sharded over a multi-host mesh.

    Args:
      obs_local / mask_local: THIS process's frame shard, (F_local, M, 3) /
        (F_local, M) — every process must pass the same F_local (pad the
        last shard with all-missing frames; they converge instantly and the
        caller slices them away).

    Returns this process's shard of the result (frames [pid*F_local,
    (pid+1)*F_local) of the global sequence).
    """
    mesh = mesh if mesh is not None else global_frame_mesh()
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    F_local = obs_local.shape[0]
    F_global = F_local * jax.process_count()
    obs_g = jax.make_array_from_process_local_data(
        shard, np.asarray(obs_local, np.float32),
        (F_global,) + obs_local.shape[1:])
    mask_g = jax.make_array_from_process_local_data(
        shard, np.asarray(mask_local, np.float32),
        (F_global,) + mask_local.shape[1:])
    prob_d = jax.device_put(prob, repl)
    prior_d = jax.device_put(prior, repl) if prior is not None else None

    # same cached phase programs as the single-host path; the dogleg solves
    # run under shard_map (stageii._shard_solve), so the Pallas kernels run
    # unchanged on each chip's local frames — ICI within a slice, DCN only
    # for the velocity-halo and interp collectives outside the solve loops
    res = mosh_stageii_solve(prob_d, opts, obs_g, mask_g, prior=prior_d,
                             model_type=model_type, mesh=mesh)

    def local(a):
        shards = [s.data for s in a.addressable_shards]
        return np.concatenate([np.asarray(s) for s in shards], axis=0)

    return StageIIResult(*(local(v) for v in res))
