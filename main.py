"""CLI dispatcher for the TPU-native MPP+CNN detection framework.

Same interface as the reference ``main.py:10-105``::

    python main.py -m {posnet,shapenet,mpp,oracle,fasterrcnn} \
                   -p {train,infer,eval,infereval,data_preview,translate_dota,
                       translate_cowc,make_synth} \
                   -c CONFIG [-d DATASET] [-o] [-r]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native MPP+CNN detector")
    parser.add_argument("-m", "--model", type=str, required=False,
                        choices=["posnet", "shapenet", "mpp", "oracle",
                                 "fasterrcnn", "bbavec"])
    parser.add_argument("-p", "--procedure", type=str, required=True,
                        choices=["train", "infer", "eval", "infereval",
                                 "data_preview", "translate_dota",
                                 "translate_cowc", "make_synth", "check_div"])
    parser.add_argument("-c", "--config", type=str, required=False,
                        help="config file path, config name, or saved model name")
    parser.add_argument("-d", "--dataset", type=str, default=None,
                        help="override the config's dataset")
    parser.add_argument("-o", "--overwrite", action="store_true")
    parser.add_argument("-r", "--resume", action="store_true",
                        help="load the saved model and resume")
    parser.add_argument("-s", "--subset", type=str, default="val")
    return parser.parse_args(argv)


def load_config(args) -> dict:
    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        resolve_model_config_path,
    )

    with open(resolve_model_config_path(args.config)) as f:
        return json.load(f)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    # The axon TPU plugin ignores JAX_PLATFORMS; MPP_PLATFORM=cpu forces the
    # backend via jax.config before any jax op runs.
    import os

    if os.environ.get("MPP_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["MPP_PLATFORM"])

    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    # device-level tracing (SURVEY §5 profiling equivalent of RJMCMCTimer):
    # MPP_PROFILE_DIR=/path captures a jax.profiler trace of the whole
    # procedure, viewable in TensorBoard/Perfetto.
    profile_dir = os.environ.get("MPP_PROFILE_DIR")
    if profile_dir:
        import atexit

        import jax

        jax.profiler.start_trace(profile_dir)
        atexit.register(jax.profiler.stop_trace)

    # Device-bound procedures: fail fast (rc 82) on a dead device attach
    # instead of hanging forever — a hung first op is invisible to outside
    # wrappers, and the in-process client never recovers. resilient_run
    # retries the stage with a fresh process.
    if args.procedure in ("train", "infer", "infereval"):
        from mpp_cnn_rs_object_detection_tpu.utils.config import (
            assert_device_alive,
        )

        assert_device_alive()

    if args.procedure == "translate_dota":
        from mpp_cnn_rs_object_detection_tpu.data.translate_dota import translate_dota

        translate_dota(load_config(args))
        return
    if args.procedure == "translate_cowc":
        from mpp_cnn_rs_object_detection_tpu.data.translate_cowc import translate_cowc

        translate_cowc(load_config(args))
        return
    if args.procedure == "check_div":
        # divergence implementation cross-check (reference main.py check_div /
        # models/position_net/check_div.py): numpy vs jnp vs pallas kernel
        import numpy as np

        from mpp_cnn_rs_object_detection_tpu.ops.divergence import (
            divergence_map_from_vector_field,
        )
        from mpp_cnn_rs_object_detection_tpu.ops.pallas_kernels import (
            detection_map_fused,
            detection_map_reference,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        vec = rng.normal(size=(128, 128, 2)).astype(np.float32)
        mask = rng.normal(size=(128, 128)).astype(np.float32)
        d_np = np.gradient(
            vec[..., 0] / (np.linalg.norm(vec, axis=-1) + 1e-30),
            np.linspace(0, 128, 128), axis=0,
        ) + np.gradient(
            vec[..., 1] / (np.linalg.norm(vec, axis=-1) + 1e-30),
            np.linspace(0, 128, 128), axis=1,
        )
        d_jnp = np.asarray(
            divergence_map_from_vector_field(jnp.asarray(vec), normalize=True)
        )
        err = np.abs(d_np - d_jnp).max()
        print(f"numpy vs jnp divergence: max |err| = {err:.2e}")
        ref = np.asarray(detection_map_reference(jnp.asarray(vec), jnp.asarray(mask)))
        import jax as _jax

        fused = np.asarray(
            detection_map_fused(
                jnp.asarray(vec), jnp.asarray(mask),
                interpret=_jax.default_backend() != "tpu",
            )
        )
        print(f"jnp vs pallas detection map: max |err| = {np.abs(ref - fused).max():.2e}")
        return
    if args.procedure == "make_synth":
        from mpp_cnn_rs_object_detection_tpu.data.synth import make_synth_dataset

        kwargs = load_config(args) if args.config else {}
        make_synth_dataset(**kwargs)
        return

    assert args.model is not None, "-m/--model required for this procedure"
    config = load_config(args)
    train = args.procedure == "train"
    load = args.resume or not train

    if args.model == "posnet":
        from mpp_cnn_rs_object_detection_tpu.models.posnet_model import PosNetModel

        model = PosNetModel(config, overwrite=args.overwrite, load=load,
                            train=train or args.procedure == "data_preview",
                            dataset=args.dataset)
    elif args.model == "shapenet":
        from mpp_cnn_rs_object_detection_tpu.models.shapenet_model import (
            ShapeNetModel,
        )

        model = ShapeNetModel(config, overwrite=args.overwrite, load=load,
                              train=train or args.procedure == "data_preview",
                              dataset=args.dataset)
    elif args.model == "mpp":
        from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import MPPModel

        model = MPPModel(config, phase="train" if train else "infer",
                         overwrite=args.overwrite, load=load,
                         dataset=args.dataset)
    elif args.model == "oracle":
        from mpp_cnn_rs_object_detection_tpu.models.oracle_model import OracleModel

        model = OracleModel(config, overwrite=args.overwrite, dataset=args.dataset)
    elif args.model in ("fasterrcnn", "bbavec"):
        from mpp_cnn_rs_object_detection_tpu.models.fasterrcnn_model import (
            BBAVecModel,
            FasterRCNNModel,
        )

        cls = FasterRCNNModel if args.model == "fasterrcnn" else BBAVecModel
        model = cls(config, overwrite=args.overwrite, load=load,
                    train=train, dataset=args.dataset)
    else:
        raise NotImplementedError(args.model)

    if args.procedure == "train":
        model.train()
    elif args.procedure == "infer":
        model.infer(subset=args.subset, overwrite=args.overwrite)
    elif args.procedure == "eval":
        model.eval()
    elif args.procedure == "infereval":
        model.infer(subset=args.subset, overwrite=args.overwrite)
        model.eval()
    elif args.procedure == "data_preview":
        model.data_preview()
    else:
        raise NotImplementedError(args.procedure)


if __name__ == "__main__":
    main(sys.argv[1:])
