from moshpp_tpu.utils.rotations import rotate_points_xyz
from moshpp_tpu.utils.logging import get_logger, set_log_file
