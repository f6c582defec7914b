"""Energy setups: which terms exist + how they are calibrated.

Rebuild of reference ``models/mpp/energies/energy_setups/`` as strategy
objects that compile an ``ImageWMaps`` into device-resident ``EnergyMaps`` +
``KernelData`` for the scan sampler:

  - ``LegacyEnergySetup`` (``energy_setup_legacy.py:35-139``): Position +
    mean-Shape + Overlap + Alignment + Area; calibrates detection threshold
    (max-F1), per-mark logistic remaps, area quantiles.
  - ``NoCalibrationEnergySetup`` (``energy_setup_no_calibration.py:33-160``):
    Position (threshold 0) + 3 SingleMark (-p or remap) + priors
    (+ optional RatioPrior); calibrates only area quantiles (+ marks if asked).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.calibration import (
    apply_remap_param_dist,
    calibrate_detection_threshold,
    calibrate_min_area,
    calibrate_param_dists,
)
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    EnergyMaps,
    EnergySpec,
    make_energy_maps,
)
from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import KernelData, make_kernel_data
from mpp_cnn_rs_object_detection_tpu.utils.files import NumpyEncoder

LEGACY_NAMES = (
    "PositionEnergy",
    "ShapeEnergy",
    "RectangleOverlapEnergy",
    "ShapeAlignmentEnergy",
    "AreaPriorEnergy",
)

NO_CALIB_NAMES = (
    "PositionEnergy",
    "SizeEnergy",
    "RatioEnergy",
    "AngleEnergy",
    "OverlapPriorEnergy",
    "AlignmentPriorEnergy",
    "AreaPriorEnergy",
)


class EnergySetup:
    """Compile ImageWMaps -> (EnergyMaps, spec); calibrate/load/save."""

    spec: EnergySpec

    def calibrate(self, image_configs: List[ImageWMaps], rng, save_path: str):
        raise NotImplementedError

    def load_calibration(self, save_dir: str):
        raise NotImplementedError

    def make_maps(self, data: ImageWMaps) -> EnergyMaps:
        raise NotImplementedError

    @property
    def detection_threshold(self) -> float:
        raise NotImplementedError

    def make_kernel_data(self, data: ImageWMaps, intensity: float,
                         kernel_weights=None,
                         use_split_merge: bool = False) -> KernelData:
        return make_kernel_data(
            data.detection_map, data.param_dist_maps, data.mappings,
            intensity=intensity, kernel_weights=kernel_weights,
            use_split_merge=use_split_merge,
        )


@dataclass
class LegacyEnergySetup(EnergySetup):
    calibration_params: Dict[str, Any] = field(default_factory=dict)
    rewarding_priors: bool = True
    calibration: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        self.spec = EnergySpec(
            names=LEGACY_NAMES,
            shape_mode="mean",
            rewarding_align=self.rewarding_priors,
        )

    @property
    def energy_names(self) -> List[str]:
        return list(LEGACY_NAMES)

    def calibrate(self, image_configs: List[ImageWMaps], rng, save_path: str):
        threshold = calibrate_detection_threshold(
            [c.detection_map for c in image_configs],
            [c.labels for c in image_configs],
            target=self.calibration_params.get("threshold_target", "f1"),
        )
        coefs, intercepts = calibrate_param_dists(
            [c.param_dist_maps for c in image_configs],
            [c.gt_centers for c in image_configs],
            [c.gt_marks for c in image_configs],
            image_configs[0].mappings,
            rng,
        )
        min_area, max_area = calibrate_min_area(
            [c.gt_marks for c in image_configs]
        )
        self.calibration = {
            "detection_threshold": threshold,
            "param_dist_remap_coefs": coefs,
            "param_dist_remap_intercepts": intercepts,
            "min_area": min_area,
            "max_area": max_area,
        }
        if save_path:
            with open(os.path.join(save_path, "calibration.json"), "w") as f:
                json.dump(self.calibration, f, cls=NumpyEncoder, indent=1)

    def load_calibration(self, save_dir: str):
        with open(os.path.join(save_dir, "calibration.json")) as f:
            self.calibration = json.load(f)

    def make_maps(self, data: ImageWMaps) -> EnergyMaps:
        cal = self.calibration
        remapped = apply_remap_param_dist(
            data.param_dist_maps,
            cal["param_dist_remap_coefs"],
            cal["param_dist_remap_intercepts"],
        )
        return make_energy_maps(
            detection_map=data.detection_map,
            mark_energy_maps=remapped,
            threshold=cal["detection_threshold"],
            min_area=cal["min_area"],
            max_area=cal["max_area"],
            mappings=data.mappings,
        )

    @property
    def detection_threshold(self) -> float:
        return float(self.calibration["detection_threshold"])


@dataclass
class NoCalibrationEnergySetup(EnergySetup):
    rewarding_priors: bool = True
    ratio_prior: bool = False
    calib_marks: bool = False
    target_ratio: float = 0.5
    calibration: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        names = list(NO_CALIB_NAMES)
        if self.ratio_prior:
            names.append("RatioPriorEnergy")
        self.spec = EnergySpec(
            names=tuple(names),
            shape_mode="separate",
            use_ratio_prior=self.ratio_prior,
            rewarding_align=self.rewarding_priors,
        )

    @property
    def energy_names(self) -> List[str]:
        return list(self.spec.names)

    def calibrate(self, image_configs: List[ImageWMaps], rng, save_path: str):
        min_area, max_area = calibrate_min_area(
            [c.gt_marks for c in image_configs]
        )
        cal: Dict[str, Any] = {"min_area": min_area, "max_area": max_area,
                               "detection_threshold": 0.0}
        if self.calib_marks:
            coefs, intercepts = calibrate_param_dists(
                [c.param_dist_maps for c in image_configs],
                [c.gt_centers for c in image_configs],
                [c.gt_marks for c in image_configs],
                image_configs[0].mappings,
                rng,
            )
            cal["param_dist_remap_coefs"] = coefs
            cal["param_dist_remap_intercepts"] = intercepts
        self.calibration = cal
        if save_path:
            with open(os.path.join(save_path, "calibration.json"), "w") as f:
                json.dump(cal, f, cls=NumpyEncoder, indent=1)

    def load_calibration(self, save_dir: str):
        with open(os.path.join(save_dir, "calibration.json")) as f:
            self.calibration = json.load(f)

    def make_maps(self, data: ImageWMaps) -> EnergyMaps:
        cal = self.calibration
        if self.calib_marks and cal.get("param_dist_remap_coefs"):
            mark_maps = apply_remap_param_dist(
                data.param_dist_maps,
                cal["param_dist_remap_coefs"],
                cal["param_dist_remap_intercepts"],
            )
        else:
            # negate on device: the maps are ~400 MB at flagship scale and
            # may already be a stacked device array (scene.py pre-transfer)
            pd = data.param_dist_maps
            if isinstance(pd, (list, tuple)):
                pd = jnp.stack([jnp.asarray(m, jnp.float32) for m in pd])
            mark_maps = -pd
        return make_energy_maps(
            detection_map=data.detection_map,
            mark_energy_maps=mark_maps,
            threshold=0.0,  # PositionEnergy threshold is 0 in this setup
            min_area=cal["min_area"],
            max_area=cal["max_area"],
            mappings=data.mappings,
            target_ratio=self.target_ratio,
        )

    @property
    def detection_threshold(self) -> float:
        # naive-init threshold (reference energy_setup_no_calibration.py:158-160)
        return 0.5


CONTRAST_NAMES = (
    "ContrastEnergy",
    "OverlapPriorEnergy",
    "AlignmentPriorEnergy",
    "AreaPriorEnergy",
    "RatioPriorEnergy",
)


@dataclass
class ContrastMeasureEnergySetup(EnergySetup):
    """CNN-free variant: image-contrast data term + priors
    (reference ``energy_setup_contrast.py:29-155``)."""

    contrast_type: str = "craciun2"
    rewarding_priors: bool = True
    manual_threshold: Optional[float] = None
    target_ratio: float = 0.5
    calibration: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        from mpp_cnn_rs_object_detection_tpu.mpp.classic_energies import (
            ContrastConfig,
        )

        data_term = "gradient" if self.contrast_type == "gradient" else "contrast"
        contrast = None
        if data_term == "contrast":
            contrast = ContrastConfig(
                measure=self.contrast_type,
                gap=1 if self.contrast_type != "craciun" else 0,
                erode=1 if self.contrast_type != "craciun" else 0,
                rgb=self.contrast_type != "t-test",
                thresh=self.manual_threshold or 0.0,
            )
        self.spec = EnergySpec(
            names=CONTRAST_NAMES,
            shape_mode="mean",  # unused (no cnn data term)
            use_ratio_prior=True,
            rewarding_align=self.rewarding_priors,
            data_term=data_term,
            contrast=contrast,
        )

    @property
    def energy_names(self) -> List[str]:
        return list(CONTRAST_NAMES)

    def calibrate(self, image_configs: List[ImageWMaps], rng, save_path: str):
        min_area, max_area = calibrate_min_area(
            [c.gt_marks for c in image_configs]
        )
        self.calibration = {
            "min_area": min_area,
            "max_area": max_area,
            "detection_threshold": self.manual_threshold or 0.0,
        }
        if save_path:
            with open(os.path.join(save_path, "calibration.json"), "w") as f:
                json.dump(self.calibration, f, cls=NumpyEncoder, indent=1)

    def load_calibration(self, save_dir: str):
        with open(os.path.join(save_dir, "calibration.json")) as f:
            self.calibration = json.load(f)

    def make_maps(self, data: ImageWMaps) -> EnergyMaps:
        cal = self.calibration
        if self.contrast_type == "gradient":
            grad = np.stack(np.gradient(np.mean(data.image, -1)), axis=-1)
            img = np.concatenate([grad, np.zeros_like(grad[..., :1])], axis=-1)
        else:
            img = data.image
        return make_energy_maps(
            detection_map=data.detection_map,
            mark_energy_maps=[-m for m in data.param_dist_maps],
            threshold=0.0,
            min_area=cal["min_area"],
            max_area=cal["max_area"],
            mappings=data.mappings,
            target_ratio=self.target_ratio,
            image=img,
        )

    @property
    def detection_threshold(self) -> float:
        return 0.5


def make_energy_setup(config: Dict[str, Any]) -> EnergySetup:
    """Pick the setup from the mpp config (reference ``mpp_model.py:62-85``:
    ``energy_setup`` in {'legacy', 'no-calibration'} + ``energy_setup_params``)."""
    kind = config.get("energy_setup") or "legacy"
    kwargs = config.get("energy_setup_params") or {}
    if kind == "legacy":
        cal_params = (config.get("calibration") or {}).get("params") or {}
        return LegacyEnergySetup(calibration_params=cal_params, **kwargs)
    if kind in ("no-calibration", "no_calibration", "no_calib"):
        return NoCalibrationEnergySetup(**kwargs)
    if kind == "contrast":
        return ContrastMeasureEnergySetup(**kwargs)
    raise ValueError(f"unknown energy setup {kind}")
