from moshpp_tpu.parallel.sharding import (
    frame_mesh,
    pad_frames,
    mosh_stageii_solve_sharded,
)
