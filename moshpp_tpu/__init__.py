"""moshpp_tpu — a TPU-native rebuild of the MoSh++ mocap body solver.

Converts labeled optical motion-capture sequences (C3D/NPZ marker
trajectories) into SMPL-family body-model parameters: per-subject shape
(betas), latent marker placements on the body surface, and per-frame pose,
translation, soft-tissue dynamics and facial expression.

Where the reference implementation (nghorbani/moshpp) is a single-process CPU
program built on chumpy autodiff and sequential per-frame dogleg solves, this
package expresses the body model and all residuals as jit-compiled JAX
functions and solves thousands of frames in parallel with a batched
trust-region Gauss-Newton solver, sharded over a TPU mesh.

Layer map (bottom-up):
  ops/       differentiable geometry ops (rodrigues, point-mesh distance,
             local-frame marker transforms, rigid alignment, robustifiers)
  models/    SMPL / SMPL+H / SMPL-X / MANO / SMAL / rigid-object forward models
  priors/    pose & shape priors (max-mixture GMM, Mahalanobis, joint-angle)
  solver/    batched dogleg trust-region Gauss-Newton
  io/        mocap I/O (C3D/NPZ/PKL/MAT), model loading, AMASS export
  markers/   marker-layout databases and layout file tooling
  pipeline/  stage-I (shape+latent markers) and stage-II (pose) solvers,
             the MoSh session head, frame picker, job filtering
  parallel/  device-mesh sharding of the frame/subject axes
"""

__version__ = "0.1.0"
