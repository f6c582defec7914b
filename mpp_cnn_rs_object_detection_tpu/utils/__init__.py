from mpp_cnn_rs_object_detection_tpu.utils.config import (
    Config,
    fetch_data_paths,
    get_dataset_base_path,
    get_inference_path,
    get_model_base_path,
    get_model_config_by_name,
    load_paths_config,
    resolve_model_config_path,
    startup_config,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import (
    NumpyEncoder,
    make_if_not_exist,
    timestamp,
)
from mpp_cnn_rs_object_detection_tpu.utils.logger import Logger
