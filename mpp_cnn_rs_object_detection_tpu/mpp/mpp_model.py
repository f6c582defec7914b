"""MPPModel facade: calibrate / train weights / infer / eval.

Rebuild of reference ``models/mpp/mpp_model.py:43-399`` around the vmapped
scan sampler: per image the scene pipeline (``scene.py``) replaces the
process-pool fan-out, papangelou scores come from the batched energy function,
and the DOTA OBB export (plain + '-SV' marking large-vehicles difficult)
matches the reference writer format.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import re
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from mpp_cnn_rs_object_detection_tpu.metrics.dota_eval import dota_eval
from mpp_cnn_rs_object_detection_tpu.metrics.dota_writer import DOTAResultsTranslator
from mpp_cnn_rs_object_detection_tpu.models.base import BaseModel
from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
    EnergySetup,
    make_energy_setup,
)
from mpp_cnn_rs_object_detection_tpu.mpp.image_data import (
    ImageWMaps,
    crop_image_w_maps,
    load_image_w_maps,
)
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene
from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
    rect_to_poly_np,
    sra_to_wla,
)
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    fetch_data_paths,
    get_inference_path,
    maybe_yield_device,
    resolve_model_config_path,
    startup_config,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import make_if_not_exist

_ID_RE = re.compile(r"[^0-9]*([0-9]+).*\.png")

TRAIN_MODES = ["manual", "integral_criterion", "ordering_criterion"]


def _cnn_checkpoint_mtime(model_name: str, kind: str) -> float:
    """mtime of the model's newest weight file (0.0 if none found)."""
    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        get_model_base_path,
    )

    mdir = os.path.join(get_model_base_path(), kind, model_name)
    times = [
        os.path.getmtime(os.path.join(mdir, f))
        for f in (os.listdir(mdir) if os.path.isdir(mdir) else [])
        if f.endswith(".msgpack")
    ]
    return max(times, default=0.0)


def ensure_cnn_inference(dataset: str, subset: str, position_model: str,
                         shape_model: str):
    """Run posnet/shapenet inference lazily if result pickles are missing
    (reference ``MPPDataset`` at ``data_loaders.py:175-202``) — or STALE:
    a pickle older than its model's newest checkpoint is deleted and
    regenerated, so resumed/extended CNN trainings (e.g. the 256-epoch
    recipe extends) actually feed the MPP new maps instead of the cached
    ones from the previous training budget."""
    paths = fetch_data_paths(dataset, subset, metadata=False)
    ids = [
        int(_ID_RE.match(os.path.split(p)[1]).group(1)) for p in paths["images"]
    ]
    pos_models = (
        list(position_model) if isinstance(position_model, (list, tuple))
        else [position_model]
    )
    for model_name, kind in [(pm, "posnet") for pm in pos_models] + [
        (shape_model, "shapenet")
    ]:
        res_dir = get_inference_path(model_name, dataset, subset)
        ckpt_mtime = _cnn_checkpoint_mtime(model_name, kind)
        missing = []
        for i in ids:
            pkl = os.path.join(res_dir, f"{i:04}_results.pkl")
            if os.path.exists(pkl):
                if os.path.getmtime(pkl) >= ckpt_mtime:
                    continue
                logging.info(
                    f"{kind}/{model_name} results for image {i} predate the "
                    "newest checkpoint; regenerating"
                )
                os.remove(pkl)
            missing.append(i)
        if not missing:
            continue
        logging.info(
            f"{kind} results missing for {len(missing)} images; running inference"
        )
        with open(resolve_model_config_path(model_name)) as f:
            cfg = json.load(f)
        if kind == "posnet":
            from mpp_cnn_rs_object_detection_tpu.models.posnet_model import (
                PosNetModel,
            )

            model = PosNetModel(cfg, load=True, train=False, dataset=dataset)
        else:
            from mpp_cnn_rs_object_detection_tpu.models.shapenet_model import (
                ShapeNetModel,
            )

            model = ShapeNetModel(cfg, load=True, train=False, dataset=dataset)
        model.infer(subset=subset, overwrite=False)


class MPPModel(BaseModel):
    def __init__(self, config: Dict, phase: str = "infer", overwrite: bool = False,
                 load: bool = False, dataset: Optional[str] = None):
        self.config, self.logger, self.save_path = startup_config(
            config, "mpp", overwrite=overwrite, load_model=load
        )
        if dataset is not None:
            self.config["dataset"]["dataset"] = dataset
        self.dataset = self.config["dataset"]["dataset"]
        self.position_model = self.config["dataset"]["position_model"]
        self.shape_model = self.config["dataset"]["shape_model"]
        self.patch_size = self.config["dataset"].get("patch_size", 256)
        self.capacity = self.config.get("capacity", 256)
        self.rng = np.random.default_rng(0)

        self.energy_setup: EnergySetup = make_energy_setup(self.config)
        self.energy_model = None

        comb_file = os.path.join(self.save_path, "energy_combination_model.json")
        if load:
            if os.path.exists(comb_file):
                self.energy_model = comb_lib.load_combiner(comb_file)
                self.energy_setup.load_calibration(self.save_path)
            elif self._find_train_mode() == "manual":
                self.calibrate()
                self.train()
            else:
                raise FileNotFoundError(comb_file)
        else:
            assert phase == "train"
            self.calibrate()

    # ----------------------------------------------------------------- data

    def _image_ids(self, subset: str) -> List[int]:
        paths = fetch_data_paths(self.dataset, subset, metadata=False)
        return [
            int(_ID_RE.match(os.path.split(p)[1]).group(1))
            for p in paths["images"]
        ]

    def _load_image(self, patch_id: int, subset: str) -> ImageWMaps:
        return load_image_w_maps(
            patch_id, self.dataset, subset, self.position_model, self.shape_model
        )

    def _sample_crops(self, subset: str, n_crops: int) -> List[ImageWMaps]:
        """Object-biased fixed-size crops (reference ``MPPDataset``
        ``data_loaders.py:164-249``: crops centred near random GT objects)."""
        ensure_cnn_inference(
            self.dataset, subset, self.position_model, self.shape_model
        )
        ids = self._image_ids(subset)
        images = [self._load_image(i, subset) for i in ids]
        crops = []
        for _ in range(n_crops):
            data = images[self.rng.integers(len(images))]
            h, w = data.shape[:2]
            ph = min(self.patch_size, h)
            if len(data.gt_centers) > 0:
                c = data.gt_centers[self.rng.integers(len(data.gt_centers))]
                jitter = self.rng.integers(-ph // 4, ph // 4 + 1, size=2)
                tl = np.clip(
                    c.astype(int) + jitter - ph // 2,
                    0,
                    [max(h - ph, 0), max(w - ph, 0)],
                )
            else:
                tl = np.array(
                    [
                        self.rng.integers(max(h - ph, 0) + 1),
                        self.rng.integers(max(w - ph, 0) + 1),
                    ]
                )
            crops.append(crop_image_w_maps(data, tl, ph))
        return crops

    # ------------------------------------------------------------ calibrate

    def calibrate(self):
        n_images = (self.config.get("calibration") or {}).get("n_images", 8)
        crops = self._sample_crops("train", n_images)
        self.energy_setup.calibrate(crops, self.rng, self.save_path)
        logging.info("calibration done")

    # ---------------------------------------------------------------- train

    def _find_train_mode(self) -> Optional[str]:
        modes = [t for t in TRAIN_MODES if t in self.config]
        assert len(modes) <= 1, f"multiple train modes {modes}"
        return modes[0] if modes else None

    def train(self):
        if self.energy_setup.calibration is None:
            try:
                self.energy_setup.load_calibration(self.save_path)
            except FileNotFoundError:
                self.calibrate()
        mode = self._find_train_mode()
        names = self.energy_setup.spec.names

        if mode == "manual":
            manual = self.config["manual"]
            if (self.config.get("energy_setup") or "legacy") == "legacy":
                dp = np.array([manual["Data"], manual["Prior"]], float)
                wd = np.array(
                    [manual["PositionEnergy"], manual["ShapeEnergy"]], float
                )
                wp = np.array(
                    [
                        manual["RectangleOverlapEnergy"],
                        manual["ShapeAlignmentEnergy"],
                        manual["AreaPriorEnergy"],
                    ],
                    float,
                )
                self.energy_model = comb_lib.hierarchical_fixed(
                    names,
                    weights_data=wd / wd.sum(),
                    weights_prior=wp / wp.sum(),
                    data_prior_weights=dp / dp.sum(),
                    threshold=manual.get("threshold", 0.0),
                )
            else:
                self.energy_model = comb_lib.manual_hierarchical(
                    names,
                    weights_dict=manual["weights"],
                    indicator_energy=manual.get(
                        "indicator_energy", "PositionEnergy"
                    ),
                    threshold=manual.get("threshold", 0.0),
                )
        elif mode in ("ordering_criterion", "integral_criterion"):
            cfg = dict(self.config[mode])
            n_crops = cfg.pop("n_crops", 64)
            crops = self._sample_crops("train", n_crops)
            batch_size = (self.config.get("data_loader") or {}).get(
                "batch_size", 8
            )
            from mpp_cnn_rs_object_detection_tpu.mpp.train_weights import (
                train_integral_criterion,
                train_ordering_criterion,
            )

            fn = (
                train_ordering_criterion
                if mode == "ordering_criterion"
                else train_integral_criterion
            )
            self.energy_model = fn(
                crops,
                self.energy_setup,
                logger=self.logger,
                save_dir=self.save_path,
                rng=self.rng,
                batch_size=batch_size,
                capacity=self.capacity,
                **cfg,
            )
        else:
            raise NotImplementedError(f"no train mode in config ({TRAIN_MODES})")

        comb_lib.save_combiner(
            os.path.join(self.save_path, "energy_combination_model.json"),
            self.energy_model,
        )
        logging.info("saved energy_combination_model.json")
        self._dump_attribution_figure(names)

    def _dump_attribution_figure(self, names) -> None:
        """SHAP-style per-term attribution of the trained combined energy on
        GT-configuration energy vectors (reference ``utils/figures/
        show_shap_values.py`` — stale upstream, integrated-gradients here;
        see ``mpp/figures.py:energy_attribution``). Non-fatal on failure."""
        try:
            from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
                energy_vectors,
            )
            from mpp_cnn_rs_object_detection_tpu.mpp.figures import (
                attribution_summary_plot,
                energy_attribution,
            )
            from mpp_cnn_rs_object_detection_tpu.mpp.state import (
                state_from_arrays,
            )

            rows = []
            for c in self._sample_crops("train", 8):
                if len(c.gt_centers) == 0:
                    continue
                maps = self.energy_setup.make_maps(c)
                gt = state_from_arrays(
                    c.gt_centers[: self.capacity],
                    c.gt_marks[: self.capacity],
                    capacity=self.capacity,
                )
                vec = np.asarray(energy_vectors(gt, maps, self.energy_setup.spec))
                rows.append(vec[np.asarray(gt.alive)])
            if not rows:
                return
            flat = np.concatenate(rows, axis=0)
            attr = energy_attribution(self.energy_model, flat)
            fig_dir = os.path.join(self.save_path, "figures")
            make_if_not_exist(fig_dir, recursive=True)
            attribution_summary_plot(
                attr, flat, list(names),
                os.path.join(fig_dir, "energy_attribution.png"),
            )
            logging.info("saved figures/energy_attribution.png")
        except Exception:
            logging.exception("attribution figure failed (non-fatal)")

    # ---------------------------------------------------------------- infer

    def infer(self, subset: str = "val", overwrite: bool = True, **kwargs):
        assert self.energy_model is not None, "train/load the combinator first"
        ensure_cnn_inference(
            self.dataset, subset, self.position_model, self.shape_model
        )
        results_dir = get_inference_path(
            model_name=os.path.split(self.save_path)[1],
            dataset=self.dataset,
            subset=subset,
        )
        make_if_not_exist(results_dir, recursive=True)
        dota_trlt = DOTAResultsTranslator(
            self.dataset, subset, results_dir, det_type="obb",
            all_classes=["vehicle"],
        )
        dota_trlt_sv = DOTAResultsTranslator(
            self.dataset, subset, results_dir, det_type="obb",
            all_classes=["vehicle"], postfix="-SV",
        )

        rj_cfg = self.config["inference"]["rjmcmc_params"]
        params = RJMCMCParams(
            n_steps=rj_cfg.get("burn_in", 30000),
            t0=rj_cfg.get("init_temperature", 1.0),
            t_target=rj_cfg.get("target_temperature", 0.0),
            alpha_t=rj_cfg.get("alpha_t", 0.999),  # float | None | "auto"
            n_samples=rj_cfg.get("num_samples", 1),
            samples_interval=rj_cfg.get("samples_interval", 1),
            iter_multiplier=rj_cfg.get("iter_multiplier"),
        )
        use_split_merge = bool(rj_cfg.get("use_split_merge", False))
        max_score = self.config["inference"].get("max_score", 4.0)
        # config-driven stopping conditions, evaluated between exact-scene
        # annealing segments (reference stopping.py wiring via rjmcmc_params)
        from mpp_cnn_rs_object_detection_tpu.mpp.stopping import (
            stopping_from_config,
        )

        stopping_cfg = rj_cfg.get("stopping")
        make_stopping = lambda: stopping_from_config(stopping_cfg)  # noqa: E731
        segment_size = int(
            self.config["inference"].get("segment_size", 4096)
        )
        # superstep move mixture: data-driven translation/mark-transform at
        # the reference's 2:1 weighting by default (make_kernels.py:113-137);
        # False restores the round-3 gaussian-only superstep for A/B runs
        data_moves = bool(rj_cfg.get("superstep_data_moves", True))
        # one global move type per superstep (lax.switch executes a single
        # branch — the dispatch-bound superstep's biggest op-count lever);
        # same statistical mixture, different chains
        move_switch = bool(rj_cfg.get("superstep_move_switch", False))
        # optional split/merge pair in the cell-parallel superstep
        # (reference split_and_merge_kernels.py:14-178; cell-confined
        # variants, see parallel_sampler._cell_proposal)
        split_merge = bool(rj_cfg.get("superstep_split_merge", False))

        # batched exact mode: all pending scenes share one shape-bucketed
        # program signature, so their chains run as ONE vmapped launch
        # sequence — the superstep is launch-bound at flagship scale, so a
        # val split costs ~one scene's wall clock (bit-identical per-scene
        # results at equal capacity: tests/test_batched_scenes.py)
        batch_results, batch_datas = {}, {}
        scene_mode_cfg = self.config["inference"].get("scene_mode", "tiled")
        if (
            self.config["inference"].get("batch_scenes")
            and scene_mode_cfg == "exact"
            and not self.config["inference"].get("scene_mesh")
            and int(self.config["inference"].get("restarts", 1)) == 1
        ):
            pending = [
                pid
                for pid in self._image_ids(subset)
                if overwrite
                or not os.path.exists(
                    os.path.join(results_dir, f"{pid:04}_results.pkl")
                )
            ]
            if len(pending) > 1:
                from mpp_cnn_rs_object_detection_tpu.mpp.scene import (
                    run_exact_scenes_batched,
                )

                maybe_yield_device("before batched scenes")
                datas = [self._load_image(pid, subset) for pid in pending]
                batch_mesh = None
                if self.config["inference"].get("batch_mesh"):
                    devs = jax.devices()
                    if len(devs) > 1:
                        from jax.sharding import Mesh

                        batch_mesh = Mesh(
                            np.asarray(devs).reshape(-1), ("scenes",)
                        )
                results = run_exact_scenes_batched(
                    datas, self.energy_setup, self.energy_model, params,
                    seeds=pending, capacity=self.capacity,
                    mesh=batch_mesh,
                    checkpoint_path=os.path.join(
                        results_dir, "batched_chains.ck.npz"
                    ),
                    polish_steps=int(
                        self.config["inference"].get("polish_steps", 0)
                    ),
                    stopping=make_stopping(),
                    segment_size=segment_size,
                    data_moves=data_moves,
                    move_switch=move_switch,
                    split_merge=split_merge,
                )
                batch_results = dict(zip(pending, results))
                batch_datas = dict(zip(pending, datas))

        _paths = fetch_data_paths(self.dataset, subset, metadata=False)
        ann_paths = {
            int(_ID_RE.match(os.path.split(p)[1]).group(1)): a
            for p, a in zip(_paths["images"], _paths["annotations"])
        }
        for patch_id in self._image_ids(subset):
            out_pkl = os.path.join(results_dir, f"{patch_id:04}_results.pkl")
            if os.path.exists(out_pkl) and not overwrite:
                # resume: replay the existing result pickle into the freshly
                # rewritten DOTA translations — skipping entirely would drop
                # this image's GT and detections from the eval (round-4
                # post-mortem: an empty det export scored a finished arm 0.0)
                logging.info(f"{out_pkl} exists, replaying into translations")
                with open(ann_paths[patch_id], "rb") as f:
                    labels = pickle.load(f)
                with open(out_pkl, "rb") as f:
                    prev = pickle.load(f)
                r_centers = np.asarray(labels["centers"]).reshape(-1, 2)
                r_params = np.asarray(labels["parameters"]).reshape(-1, 3)
                r_diff = np.asarray(labels["difficult"]).reshape(-1)
                r_cats = np.asarray(labels["categories"]).reshape(-1)
                r_gt_poly = rect_to_poly_np(
                    r_centers, r_params[:, 0], r_params[:, 1], r_params[:, 2]
                )
                dota_trlt.add_gt(
                    image_id=patch_id, polygons=r_gt_poly, difficulty=r_diff,
                    categories=["vehicle"] * len(r_gt_poly),
                )
                dota_trlt_sv.add_gt(
                    image_id=patch_id, polygons=r_gt_poly,
                    difficulty=[
                        bool(d) or c == "large-vehicle"
                        for d, c in zip(r_diff, r_cats)
                    ],
                    categories=["vehicle"] * len(r_gt_poly),
                )
                prev_scores = (
                    np.asarray(prev["detection_score"]).reshape(-1)
                    / max_score
                )
                for trlt in (dota_trlt, dota_trlt_sv):
                    trlt.add_detections(
                        image_id=patch_id, scores=prev_scores,
                        polygons=np.asarray(
                            prev["detection"]
                        ).reshape(-1, 4, 2),
                        flip_coor=True,
                        class_names=["vehicle"] * len(prev_scores),
                    )
                continue
            maybe_yield_device(f"before image {patch_id}")
            t_stage = time.perf_counter()
            if patch_id in batch_results:
                data = batch_datas[patch_id]
            else:
                data = self._load_image(patch_id, subset)
            t_load = time.perf_counter() - t_stage
            scene_mode = self.config["inference"].get("scene_mode", "tiled")
            mesh = None
            if self.config["inference"].get("tile_mesh") or (
                scene_mode == "exact"
                and self.config["inference"].get("scene_mesh")
            ):
                # multi-chip: tiled mode shards the independent-tile batch,
                # exact mode row-shards the scene maps with halo-exact
                # borders (parallel/sharded_scene.py)
                from jax.sharding import Mesh

                devs = jax.devices()
                if scene_mode == "exact":
                    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (  # noqa: E501
                        CELL,
                    )

                    n = min(len(devs), max(1, data.shape[0] // CELL))
                    if n > 1:
                        mesh = Mesh(np.asarray(devs[:n]), ("rows",))
                elif len(devs) > 1:
                    mesh = Mesh(np.asarray(devs).reshape(-1), ("tiles",))
            # a TPU-worker crash mid-anneal is NOT retried in-process (the
            # axon client cannot reconnect once its worker dies); instead
            # every annealing segment is checkpointed and a process-level
            # rerun (scripts/resilient_run.py) resumes at the last segment,
            # losing <= segment_size moves per crash
            t_stage = time.perf_counter()
            if patch_id in batch_results:
                result = batch_results[patch_id]
            else:
                result = run_mpp_on_scene(
                    data,
                    self.energy_setup,
                    self.energy_model,
                    params,
                    seed=patch_id,
                    patch_size=self.patch_size,
                    capacity=self.capacity,
                    segment_size=segment_size,
                    use_split_merge=use_split_merge,
                    sampler=self.config["inference"].get(
                        "sampler", "sequential"
                    ),
                    scene_mode=scene_mode,
                    polish_steps=int(
                        self.config["inference"].get("polish_steps", 0)
                    ),
                    restarts=int(
                        self.config["inference"].get("restarts", 1)
                    ),
                    checkpoint_path=os.path.join(
                        results_dir, f"{patch_id:04}_chains.ck.npz"
                    ),
                    mesh=mesh,
                    stopping=make_stopping(),
                    data_moves=data_moves,
                    move_switch=move_switch,
                    split_merge=split_merge,
                )
            t_chain = time.perf_counter() - t_stage
            t_stage = time.perf_counter()

            det_centers = np.asarray(result.centers).reshape(-1, 2)
            # default OFF: every beyond-reference rescoring extension
            # (refine/blend/backfill/polish) must be opted into, so a
            # reference-shaped config reproduces reference behavior
            if self.config["inference"].get("refine_centers", False):
                from mpp_cnn_rs_object_detection_tpu.mpp.refine import (
                    snap_centers_to_map,
                )

                det_centers = snap_centers_to_map(
                    det_centers, data.detection_map
                )
            # optional detection-map score blending: rank by
            # (papangelou/max_score + w * map(center)) / (1 + w). The
            # papangelou intensity orders points within a config well but is
            # a poor cross-image confidence (it depends on the local point
            # configuration); the CNN detection-map value at the center is
            # the natural absolute confidence. w=0 reproduces the reference's
            # pure-papangelou ranking (``mpp_model.py:303``); measured on the
            # val sample w=2 lifts SV mAP@0.5 by ~4 pp at every blend weight
            # tried (scripts/rescore_probe.py).
            blend_w = float(
                self.config["inference"].get("score_map_blend", 0.0)
            )
            if blend_w > 0.0 and len(det_centers):
                ij = np.clip(
                    np.round(det_centers).astype(int),
                    0,
                    np.array(data.detection_map.shape) - 1,
                )
                map_vals = data.detection_map[ij[:, 0], ij[:, 1]]
                result.scores = (
                    (np.asarray(result.scores) / max_score
                     + blend_w * map_vals) / (1.0 + blend_w) * max_score
                )
            marks = np.asarray(result.marks).reshape(-1, 3)
            scores = np.asarray(result.scores).reshape(-1)
            # optional detection-map backfill: append map local maxima the
            # chain did not keep, ranked strictly below every MPP detection
            # (score 0.2*map/(1+w) vs blended >= map*w/(1+w) for kept
            # points). The annealed process is precision-oriented — its
            # priors kill weakly-supported points — so the PR curve ends
            # early; backfilled peaks extend recall at the tail (+10 pp
            # mAP@0.25 / +3 pp mAP@0.5 SV on the val artifacts,
            # scripts/backfill probe). Off by default (reference parity).
            bf_thr = float(
                self.config["inference"].get("backfill_threshold", 0.0)
            )
            if bf_thr > 0.0:
                from scipy.ndimage import maximum_filter

                dm = data.detection_map
                peaks = (dm == maximum_filter(dm, size=5)) & (dm >= bf_thr)
                pc = np.argwhere(peaks).astype(np.float32)
                if len(pc) and len(det_centers):
                    from scipy.spatial import cKDTree

                    dmin, _ = cKDTree(det_centers).query(pc, k=1)
                    pc = pc[dmin > 4.0]
                if len(pc):
                    ijb = pc.astype(int)
                    # posterior-MEAN marks (circular mean for the cyclic
                    # angle): +0.3 pp SV mAP@0.5 over argmax on the val
                    # artifacts (scripts/backfill_sweep probes) — backfilled
                    # peaks never get chain refinement, so the distribution
                    # mean is the best point estimate available
                    marks_bf_cols = []
                    for m, d in zip(data.mappings, data.param_dist_maps):
                        # host-side complex math below: force numpy (the
                        # stacked device maps would hit TPU's unimplemented
                        # complex reduction)
                        probs = np.asarray(
                            d[ijb[:, 0], ijb[:, 1]], np.float64
                        )
                        centers_v = m.class_to_center_value(
                            np.arange(probs.shape[-1])
                        ).astype(np.float64)
                        if getattr(m, "is_cyclic", False):
                            # angle lives on [0, pi): average on the doubled
                            # circle
                            z = (probs * np.exp(2j * centers_v)).sum(-1)
                            marks_bf_cols.append(
                                (np.angle(z) / 2.0) % np.pi
                            )
                        else:
                            marks_bf_cols.append(
                                (probs * centers_v).sum(-1)
                                / np.maximum(probs.sum(-1), 1e-9)
                            )
                    marks_bf = np.stack(marks_bf_cols, axis=-1).astype(
                        np.float32
                    )
                    scores_bf = (
                        0.2 * dm[ijb[:, 0], ijb[:, 1]]
                        / (1.0 + blend_w) * max_score
                    )
                    det_centers = np.concatenate([det_centers, pc])
                    marks = np.concatenate([marks, marks_bf])
                    scores = np.concatenate([scores, scores_bf])
            result.scores = scores
            b_long = 2.0 * marks[:, 0] / (1.0 + marks[:, 1])
            pred_params = np.stack(
                [b_long * marks[:, 1], b_long, marks[:, 2]], axis=-1
            )
            detection_as_poly = rect_to_poly_np(
                det_centers, pred_params[:, 0], pred_params[:, 1],
                pred_params[:, 2],
            )
            centers = np.asarray(data.labels["centers"]).reshape(-1, 2)
            gt_params = np.asarray(data.labels["parameters"]).reshape(-1, 3)
            difficulty = np.asarray(data.labels["difficult"]).reshape(-1)
            categories = np.asarray(data.labels["categories"]).reshape(-1)
            gt_as_poly = rect_to_poly_np(
                centers, gt_params[:, 0], gt_params[:, 1], gt_params[:, 2]
            )
            dota_trlt.add_gt(
                image_id=patch_id, polygons=gt_as_poly, difficulty=difficulty,
                categories=["vehicle"] * len(gt_as_poly),
            )
            dota_trlt_sv.add_gt(
                image_id=patch_id,
                polygons=gt_as_poly,
                difficulty=[
                    bool(d) or c == "large-vehicle"
                    for d, c in zip(difficulty, categories)
                ],
                categories=["vehicle"] * len(gt_as_poly),
            )
            scores01 = result.scores / max_score
            if len(scores01) and scores01.max() > 1.0:
                logging.warning(
                    f"pred score exceeds max_score ({result.scores.max():.2f} "
                    f"> {max_score})"
                )
            for trlt in (dota_trlt, dota_trlt_sv):
                trlt.add_detections(
                    image_id=patch_id,
                    scores=scores01,
                    polygons=detection_as_poly,
                    flip_coor=True,
                    class_names=["vehicle"] * len(scores01),
                )
            with open(out_pkl, "wb") as f:
                pickle.dump(
                    {
                        "detection": detection_as_poly,
                        "detection_type": "poly",
                        "detection_center": det_centers,
                        "detection_score": result.scores,
                        "detection_params": pred_params,
                        "detection_marks": marks,
                        "mappings": data.mappings,
                    },
                    f,
                )
            # detection / gt overlays (reference mpp_model.py:306-326)
            from mpp_cnn_rs_object_detection_tpu.utils.display import (
                rectangles_over_image,
                save_image,
            )

            save_image(
                os.path.join(results_dir, f"{patch_id:04}_detection.png"),
                rectangles_over_image(
                    data.image, det_centers, pred_params,
                    scores=result.scores, color="plasma",
                    max_score=max(1e-6, float(np.max(result.scores)))
                    if len(result.scores)
                    else 1.0,
                ),
            )
            save_image(
                os.path.join(results_dir, f"{patch_id:04}_gt.png"),
                rectangles_over_image(
                    data.image, centers, gt_params, color=(0, 255, 0)
                ),
            )
            logging.info(
                f"scene {patch_id:04} stage seconds: load_maps={t_load:.1f} "
                f"chain={t_chain:.1f} "
                f"post+export={time.perf_counter() - t_stage:.1f}"
            )
        dota_trlt.save()
        dota_trlt_sv.save()
        logging.info("saved dota translation")

    def eval(self):
        dota_eval(
            model_dir=self.save_path, dataset=self.dataset, subset="val",
            det_type="obb",
        )
        dota_eval(
            model_dir=self.save_path, dataset=self.dataset, subset="val",
            det_type="obb", postfix="-SV",
        )

    def data_preview(self):
        preview_dir = os.path.join(self.save_path, "data_preview")
        make_if_not_exist(preview_dir)
        from PIL import Image

        for i, patch_id in enumerate(self._image_ids("train")[:8]):
            data = self._load_image(patch_id, "train")
            arr = np.clip(data.image, 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(preview_dir, f"preview_{data.name}_gt.png")
            )
