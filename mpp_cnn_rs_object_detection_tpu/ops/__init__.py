from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    rect_to_poly,
    marks_to_poly,
    wla_to_sra,
    sra_to_wla,
    polygon_to_abw,
    rect_area,
    quad_area,
    convex_quad_intersection_area,
    quad_overlap_ratio,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import ValueMapping
from mpp_cnn_rs_object_detection_tpu.ops.divergence import (
    gradient_1d,
    divergence_ij,
    divergence_map_from_vector_field,
)
from mpp_cnn_rs_object_detection_tpu.ops.sampler2d import sample_point_2d
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms, nms_distance
