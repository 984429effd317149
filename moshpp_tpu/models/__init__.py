from moshpp_tpu.models.body_model import (
    SurfaceModel,
    MODEL_TYPE_INFO,
    fullpose_from_pose,
    lbs_forward,
    forward_kinematics,
    pose_part_ids,
)
from moshpp_tpu.models.object_model import RigidObjectModel, rigid_object_forward
from moshpp_tpu.models.synthetic import make_synthetic_model
