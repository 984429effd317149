from moshpp_tpu.ops.rodrigues import rodrigues, rodrigues_inverse
from moshpp_tpu.ops.rigid_align import kabsch
from moshpp_tpu.ops.surface import face_normals, vertex_normals
from moshpp_tpu.ops.knn import knn, nearest_vertex
from moshpp_tpu.ops.marker_transform import marker_coeffs, reconstruct_markers
from moshpp_tpu.ops.point_mesh import (
    closest_point_on_triangles,
    point_to_mesh_distance,
    signed_point_to_mesh_distance,
)
from moshpp_tpu.ops.robustifiers import gmof, signed_sqrt
