from mpp_cnn_rs_object_detection_tpu.data.dataset import (
    BatchLoader,
    ImageDataset,
    LabelProcessor,
    extract_patch,
    load_annotation,
    load_image,
    save_annotation,
)
from mpp_cnn_rs_object_detection_tpu.data.label_processing import (
    PosLabelProcessor,
    ShapeLabelProcessor,
    nearest_center_fields,
)
from mpp_cnn_rs_object_detection_tpu.data.patch_samplers import (
    DensitySampler,
    MixedSampler,
    ObjectSampler,
    PatchSampler,
    UniformSampler,
)
from mpp_cnn_rs_object_detection_tpu.data.patch_making import make_patch_dataset
from mpp_cnn_rs_object_detection_tpu.data.augmentation import DataAugment
from mpp_cnn_rs_object_detection_tpu.data.synth import make_synth, make_synth_dataset
