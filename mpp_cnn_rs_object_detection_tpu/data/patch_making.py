"""Materialise a temporary patch dataset on disk from a source dataset.

Rebuild of reference ``data/patch_making.py:19-167``: a sampler decides
(image, patch-center) pairs, patches + reassigned labels are written in the
standard dataset format; regenerated every ``dataset_update_interval`` epochs
during CNN training. Parallelised with a process pool over source images.
"""

from __future__ import annotations

import json
import os
import pickle
from functools import partial
from multiprocessing import get_context
from typing import Dict

import numpy as np
from PIL import Image

from mpp_cnn_rs_object_detection_tpu.data.dataset import extract_patch, load_image
from mpp_cnn_rs_object_detection_tpu.data.patch_samplers import (
    DensitySampler,
    MixedSampler,
    ObjectSampler,
    PatchSampler,
    UniformSampler,
)
from mpp_cnn_rs_object_detection_tpu.utils.config import (
    check_data_match,
    fetch_data_paths,
    get_dataset_base_path,
)
from mpp_cnn_rs_object_detection_tpu.utils.files import NumpyEncoder, make_if_not_exist


def make_patch_dataset(new_dataset: str, source_dataset: str, config: Dict,
                       rng: np.random.Generator, make_val=False,
                       sampling_densities=None, d_sampler_weight=None,
                       densities_rescale_fac=1, multiprocess=True):
    base_data_path = get_dataset_base_path()
    make_if_not_exist(os.path.join(base_data_path, new_dataset))

    pm = config["data_loader"]["patch_maker_params"]
    n_patches = pm["n_patches"]
    patch_size = pm["patch_size"]
    sigma = pm.get("obj_sampler_sigma") or 0

    paste_bank, copy_paste = None, pm.get("copy_paste")
    if copy_paste:
        from mpp_cnn_rs_object_detection_tpu.data.copy_paste import (
            build_paste_bank,
        )

        src = fetch_data_paths(source_dataset, "train")
        paste_bank = build_paste_bank(src["images"], src["annotations"])

    for subset in (["train", "val"] if make_val else ["train"]):
        sampler = MixedSampler(
            n_patches=n_patches,
            samplers=[
                UniformSampler(n_patches=n_patches, patch_size=patch_size, rng=rng),
                ObjectSampler(
                    n_patches=n_patches, patch_size=patch_size, rng=rng, sigma=sigma
                ),
            ],
            weights=[pm["unf_sampler_weight"], pm["obj_sampler_weight"]],
            rng=rng,
        )
        if sampling_densities is not None:
            sampler.add_sampler(
                DensitySampler(
                    n_patches=n_patches, patch_size=patch_size, rng=rng,
                    density_files=sampling_densities,
                    rescale_fac=densities_rescale_fac,
                ),
                d_sampler_weight,
            )

        _make_patches(
            source_dataset=source_dataset,
            subset=subset,
            new_dataset=new_dataset,
            sampler=sampler,
            n_patches=n_patches if subset == "train" else n_patches // 2,
            patch_size=patch_size,
            rng=rng,
            multiprocess=multiprocess,
            clear=True,
            # augmentation applies to the train patches only
            paste_bank=paste_bank if subset == "train" else None,
            copy_paste=copy_paste if subset == "train" else None,
        )


def _make_patches(source_dataset: str, subset: str, new_dataset: str,
                  sampler: PatchSampler, n_patches: int, patch_size: int,
                  rng: np.random.Generator, multiprocess=True, clear=False,
                  paste_bank=None, copy_paste=None):
    paths = fetch_data_paths(source_dataset, subset)
    sampler.initialise(paths["images"], paths["annotations"], paths["metadata"])

    samples_per_image = rng.multinomial(
        n=n_patches, pvals=sampler.sample_density_per_image
    )

    new_dataset_path = os.path.join(get_dataset_base_path(), new_dataset, subset)
    make_if_not_exist(new_dataset_path, recursive=True)
    make_if_not_exist(
        [os.path.join(new_dataset_path, d) for d in ["images", "annotations", "metadata"]]
    )

    if clear:
        for d in os.listdir(new_dataset_path):
            for f in os.listdir(os.path.join(new_dataset_path, d)):
                os.remove(os.path.join(new_dataset_path, d, f))

    fun = partial(
        _make_one_patch, sampler=sampler, patch_size=patch_size,
        data_dest=new_dataset_path, paste_bank=paste_bank,
        copy_paste=copy_paste, seed=int(rng.integers(2**31)),
    )
    it = list(
        zip(
            range(len(paths["images"])),
            samples_per_image,
            paths["images"],
            paths["annotations"],
            paths["metadata"],
        )
    )
    if multiprocess:
        # spawn (not fork): the parent process holds a multithreaded JAX runtime
        with get_context("spawn").Pool() as p:
            p.starmap(fun, it)
    else:
        for args in it:
            fun(*args)


def _make_one_patch(i, n_local_patches, patch_path, label_path, meta_path, sampler,
                    patch_size, data_dest, paste_bank=None, copy_paste=None,
                    seed=0):
    if n_local_patches == 0:
        return
    paste_rng = np.random.default_rng((seed, i))

    image = load_image(patch_path)
    image_id = check_data_match([patch_path, label_path, meta_path])

    with open(label_path, "rb") as f:
        labels_dict = pickle.load(f)
    centers = labels_dict["centers"]
    params = labels_dict["parameters"]
    cats = labels_dict["categories"]
    difficulty = labels_dict["difficult"]

    with open(meta_path, "r") as f:
        meta = json.load(f)

    shape = np.array(image.shape[:2])

    for k in range(n_local_patches):
        anchor = sampler.sample_patch_center(image_id=i, shape=shape, centers=centers)
        patch, tl_anchor, centers_offset = extract_patch(
            image=image, center_anchor=anchor, patch_size=patch_size
        )
        p_centers, p_params, p_cats, p_diff = [], [], [], []
        for j, c in enumerate(centers):
            offset_c = c + centers_offset
            if np.all(tl_anchor <= offset_c) and np.all(
                offset_c < (tl_anchor + patch_size)
            ):
                p_centers.append(c - tl_anchor + centers_offset)
                p_params.append(params[j])
                p_cats.append(cats[j])
                p_diff.append(difficulty[j])

        if len(p_centers) == 0:
            p_centers = np.array([])
            p_params = np.array([])
            p_cats = np.array([])
            p_diff = np.array([])
        else:
            p_centers = np.stack(p_centers, axis=0)
            p_params = np.stack(p_params, axis=0)
            p_cats = np.array(p_cats)
            p_diff = np.array(p_diff)

        if paste_bank and copy_paste and paste_rng.random() < float(
            copy_paste.get("p", 1.0)
        ):
            from mpp_cnn_rs_object_detection_tpu.data.copy_paste import (
                paste_objects,
            )

            n_lo, n_hi = copy_paste.get("n_range", [1, 4])
            patch, p_centers, p_params, p_cats, p_diff = paste_objects(
                patch, p_centers.reshape(-1, 2), p_params.reshape(-1, 3),
                p_cats, p_diff, paste_bank, paste_rng,
                n_paste=int(paste_rng.integers(n_lo, n_hi + 1)),
            )
            if len(p_centers) == 0:  # keep the empty-annotation convention
                p_centers, p_params = np.array([]), np.array([])
                p_cats, p_diff = np.array([]), np.array([])

        patch_name = f"{image_id:04}_{k:04}"
        Image.fromarray((np.clip(patch, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(data_dest, "images", f"{patch_name}.png"),
            # temp patch sets are regenerated every few epochs: fast encode
            # beats small files (default level 6 dominated regen profiles)
            compress_level=1,
        )
        with open(os.path.join(data_dest, "annotations", f"{patch_name}.pkl"), "wb") as f:
            pickle.dump(
                {
                    "centers": p_centers,
                    "parameters": p_params,
                    "categories": p_cats,
                    "difficult": p_diff,
                },
                f,
            )
        with open(os.path.join(data_dest, "metadata", f"{patch_name}.json"), "w") as f:
            json.dump(
                {**meta, "source": os.path.split(patch_path)[1], "anchor": anchor},
                f, cls=NumpyEncoder, indent=1,
            )
