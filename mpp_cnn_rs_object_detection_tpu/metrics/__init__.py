from mpp_cnn_rs_object_detection_tpu.metrics.polyiou import (
    poly_intersection,
    poly_iou,
    poly_iou_batch,
    poly_iou_matrix,
)
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import DOTAResultsTranslator
from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import dota_eval, voc_eval
from mpp_cnn_rs_object_detection_tpu.metrics.detection import (
    compute_precision_recall,
    precision_recall_curve_on_detection_map,
)
