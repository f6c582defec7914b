"""Config / paths resolution and model-store layout.

Rebuild of reference ``utils/data.py:14-132`` and ``utils/training.py:43-81``:

  - ``paths_config.json`` lists candidate ``dataset_path`` / ``model_path``
    roots; the first existing one wins (so the same configs run on any machine);
  - model configs are JSON files under ``model_configs/<type>/``; resolution
    order is full path -> ``model_configs/*/<name>.json`` -> saved model name;
  - a trained model lives in ``<model_path>/<type>/<name>/`` holding
    ``config.json``, checkpoints, ``log.json``, ``calibration.json``,
    ``energy_combination_model.json`` and figures;
  - inference artifacts go to ``<dataset_path>/inference/<dataset>/<subset>/<model>/``.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import re
import shutil
import sys
from typing import Any, Dict, List, Optional, Tuple

from mpp_cnn_rs_object_detection_tpu.utils.files import find_existing_path, make_if_not_exist
from mpp_cnn_rs_object_detection_tpu.utils.logger import Logger

Config = Dict[str, Any]

# repo root = two levels above this file's package
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def load_paths_config() -> Optional[dict]:
    candidates = [
        os.path.join(os.getcwd(), "paths_config.json"),
        os.path.join(_REPO_ROOT, "paths_config.json"),
    ] + [os.path.join(p, "paths_config.json") for p in sys.path]
    for c in candidates:
        try:
            with open(c, "r") as f:
                return json.load(f)
        except (FileNotFoundError, NotADirectoryError, IsADirectoryError):
            continue
    return None


def _resolve_candidates(paths: List[str]) -> List[str]:
    """Relative candidates are resolved against cwd and the repo root."""
    out = []
    for p in paths:
        if os.path.isabs(p):
            out.append(p)
        else:
            out.append(os.path.join(os.getcwd(), p))
            out.append(os.path.join(_REPO_ROOT, p))
    return out


def get_dataset_base_path() -> str:
    config = load_paths_config()
    return find_existing_path(_resolve_candidates(config["dataset_path"]))


def get_model_base_path() -> str:
    config = load_paths_config()
    candidates = _resolve_candidates(config["model_path"])
    try:
        return find_existing_path(candidates)
    except FileNotFoundError:
        os.makedirs(candidates[0], exist_ok=True)
        return candidates[0]


def fetch_data_paths(dataset: str, subset: str, images=True, annotations=True,
                     metadata=True) -> Dict[str, List[str]]:
    """Sorted image/annotation/metadata file lists of ``<dataset>/<subset>``.

    Files are matched by their numeric id; orphans (e.g. an annotation with no
    image, which the reference's own data_sample ships) are dropped with a
    warning instead of asserting.
    """
    data_path = os.path.join(get_dataset_base_path(), dataset, subset)
    res = {}
    if images:
        res["images"] = sorted(glob.glob(os.path.join(data_path, "images", "*.png")))
    if annotations:
        res["annotations"] = sorted(
            glob.glob(os.path.join(data_path, "annotations", "*.pkl"))
        )
    if metadata:
        res["metadata"] = sorted(
            glob.glob(os.path.join(data_path, "metadata", "*.json"))
        )

    def file_id(p):
        m = re.match(r"[^0-9]*([0-9]+)", os.path.split(p)[1])
        return m.group(1) if m else None

    id_sets = [{file_id(p) for p in v} for v in res.values()]
    common = set.intersection(*id_sets) if id_sets else set()
    if any(len(s) != len(common) for s in id_sets):
        dropped = set.union(*id_sets) - common
        logging.warning(
            f"{dataset}/{subset}: dropping {len(dropped)} orphan file id(s): "
            f"{sorted(dropped)}"
        )
        res = {
            k: [p for p in v if file_id(p) in common] for k, v in res.items()
        }
    return res


def get_inference_path(model_name: str, dataset: str, subset: str) -> str:
    return os.path.join(
        get_dataset_base_path(), "inference", dataset, subset, model_name
    )


def get_model_config_by_name(name: str, return_config_file=True) -> Optional[str]:
    model_dir = os.path.join(get_model_base_path(), "*", name)
    if return_config_file:
        matches = glob.glob(os.path.join(model_dir, "config.json"))
    else:
        matches = glob.glob(model_dir)
    if len(matches) == 0:
        return None
    if len(matches) > 1:
        logging.warning(f"found more than one model for {name}: {matches}")
    return matches[-1]


def get_config_from_model_configs(name: str) -> Optional[str]:
    for base in [os.getcwd(), _REPO_ROOT] + list(sys.path):
        root = os.path.join(base, "model_configs")
        if os.path.exists(root):
            matches = glob.glob(os.path.join(root, "*", name))
            if matches:
                return matches[-1]
    return None


def resolve_model_config_path(config_file_or_model_name: str) -> str:
    """Full path -> ``model_configs/*/<name>.json`` -> saved model name."""
    if os.path.exists(config_file_or_model_name):
        return config_file_or_model_name
    name = config_file_or_model_name
    if not name.endswith(".json"):
        config_file = get_config_from_model_configs(name + ".json")
    else:
        config_file = get_config_from_model_configs(name)
    if config_file is None:
        config_file = get_model_config_by_name(
            config_file_or_model_name, return_config_file=True
        )
    if config_file is None:
        raise FileNotFoundError(
            f"no model with name (or config with path) {config_file_or_model_name}"
        )
    return config_file


def startup_config(config: Config, model_type: str, load_model=False,
                   overwrite=False) -> Tuple[Config, Logger, str]:
    """Create/load the model dir, freeze the config into it, set up logging."""
    base_path_model = get_model_base_path()
    save_path = os.path.join(base_path_model, model_type, config["model_name"])

    if os.path.exists(save_path):
        if not load_model:
            if not overwrite:
                raise FileExistsError(f"found model in {save_path}")
            shutil.rmtree(save_path)
            make_if_not_exist(save_path, recursive=True)
    else:
        make_if_not_exist(save_path, recursive=True)

    local_config_file = os.path.join(save_path, "config.json")
    if not os.path.exists(local_config_file):
        with open(local_config_file, "w") as f:
            json.dump(config, f, indent=1)

    log_file = os.path.join(save_path, "log.json")
    if os.path.exists(log_file) and load_model:
        logger = Logger.load(log_file)
    else:
        logger = Logger(save_dir=save_path)

    logging.basicConfig(
        format="%(levelname)-8s [%(filename)s:%(lineno)d] %(message)s",
        datefmt="%Y-%m-%d:%H:%M:%S",
        level=logging.INFO,
    )
    return config, logger, save_path


def check_data_match(paths: List[str]) -> int:
    """Assert a group of image/annotation/metadata paths share one numeric id."""
    ids = []
    for p in paths:
        ids.append(re.match(r"([0-9]+)\.[a-zA-Z]+", os.path.split(p)[1]).group(1))
    assert all(i == ids[0] for i in ids), f"id mismatch in {paths}"
    return int(ids[0])


def enable_persistent_compilation_cache(cache_dir: Optional[str] = None
                                        ) -> None:
    """Turn on JAX/XLA's on-disk executable cache.

    The exact-scene superstep program takes ~350 s to compile on this
    1-core host per (scene-shape, capacity) signature; persisting compiled
    executables makes every later process start warm. Call before the first
    jitted computation. Safe to call on any backend; entries are keyed by
    topology + program so CPU/TPU runs don't collide.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MPP_XLA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mpp_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ------------------------------------------------------------------ device lease
# The axon TPU plugin gives one process exclusive chip access: a second
# client's first device op blocks until the holder exits. Long runbooks
# (multi-hour CNN trains) would therefore starve the driver's end-of-round
# ``bench.py`` into its CPU fallback. The yield protocol fixes that without
# a daemon: a high-priority process touches the flag file, every long-running
# stage polls it at its natural checkpoint boundary (epoch / scene segment /
# image) and exits with rc 75 (EX_TEMPFAIL) after saving state, and
# ``scripts/resilient_run.py`` resumes the stage once the flag clears.

# HOST-GLOBAL path (r02 post-mortem): the flag must be visible across
# checkouts — the driver's bench may run from a different clone of this repo
# than the live runbooks, and a repo-relative flag means requester and holder
# silently watch different files (the r02 starvation: the pos_r2cp trainer
# polled every ~54 s and never saw the bench's flag). /tmp is shared by every
# process on the host; staleness self-cleanup handles crashed requesters.
DEVICE_YIELD_FLAG = os.environ.get(
    "MPP_DEVICE_YIELD_FLAG", "/tmp/mpp_tpu.device_yield"
)
DEVICE_YIELD_RC = 75
_YIELD_STALE_S = 45 * 60.0

# rc for "the device attach never completed": distinct from DEVICE_YIELD_RC
# so wrappers can tell a voluntary yield from a dead client.
DEVICE_DEAD_RC = 82


def assert_device_alive(timeout_s: float = 600.0,
                        exit_code: int = DEVICE_DEAD_RC,
                        _op=None) -> None:
    """Run a trivial jitted op under a watchdog; ``os._exit`` if it hangs.

    The axon TPU client can die mid-attach (threads parked on futexes, no
    relay connection, never recovers in-process — observed 2026-08-21 when
    a stage attached during another client's claim-release window). A hung
    first device op is indistinguishable from work to any outside wrapper,
    so the process itself must detect it: if the probe op hasn't landed
    within ``timeout_s`` the watchdog exits with ``DEVICE_DEAD_RC`` and a
    process-level runner (``scripts/resilient_run.py``) retries with a
    fresh client. A long wait can also be legitimate (another process holds
    the exclusive chip) — exiting and retrying is safe and correct there
    too, since attach-blocking holds no claim and loses no work.

    ``_op`` injects the probed operation for tests.
    """
    import threading

    done = threading.Event()

    def _watch() -> None:
        if not done.wait(timeout_s):
            print(f"[device-watchdog] first device op did not complete "
                  f"in {timeout_s:.0f}s; exiting {exit_code} for a "
                  f"process-level retry", flush=True)
            sys.stdout.flush()
            os._exit(exit_code)

    threading.Thread(target=_watch, daemon=True).start()
    if _op is None:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((8, 8))
        jax.jit(lambda a: (a @ a).sum())(x).block_until_ready()
    else:
        _op()
    done.set()


def request_device_yield() -> None:
    """Ask current device holders to exit at their next safe boundary."""
    make_if_not_exist(os.path.dirname(DEVICE_YIELD_FLAG))
    with open(DEVICE_YIELD_FLAG, "w") as f:
        f.write(f"pid={os.getpid()}\n")


def touch_device_yield() -> None:
    """Refresh the flag's mtime so holders don't treat it as stale."""
    if os.path.exists(DEVICE_YIELD_FLAG):
        os.utime(DEVICE_YIELD_FLAG, None)


def clear_device_yield() -> None:
    try:
        os.remove(DEVICE_YIELD_FLAG)
    except FileNotFoundError:
        pass


def device_yield_requested() -> bool:
    """True iff a fresh yield flag exists (stale flags from a crashed
    requester are removed so they can't wedge runbooks forever)."""
    try:
        age = __import__("time").time() - os.path.getmtime(DEVICE_YIELD_FLAG)
        with open(DEVICE_YIELD_FLAG) as f:
            content = f.read()
    except OSError:
        return False
    if age > _YIELD_STALE_S:
        logging.warning("removing stale device-yield flag (%.0f s old)", age)
        clear_device_yield()
        return False
    # the requester itself must never yield to its own flag
    return f"pid={os.getpid()}\n" not in content


def _log_yield_boundary(context: str, yielding: bool) -> None:
    """Append a holder-side audit line so a failed lease handoff can be
    post-mortemed: who held the chip, when it last hit a safe boundary, and
    whether it saw/obeyed a flag (the r02 BENCH starvation was undiagnosable
    for lack of exactly this). Path derives from DEVICE_YIELD_FLAG at call
    time so test isolation (which monkeypatches the flag) carries over."""
    try:
        import time as _time

        with open(DEVICE_YIELD_FLAG + "_log", "a") as f:
            f.write(
                f"{_time.strftime('%Y-%m-%d %H:%M:%S')} pid={os.getpid()} "
                f"boundary={context!r} yielding={yielding}\n"
            )
    except OSError:
        pass


def maybe_yield_device(context: str) -> None:
    """Exit rc 75 at a safe boundary if a yield was requested. Callers must
    have just persisted whatever state resuming needs (checkpoint saved /
    image results written)."""
    requested = device_yield_requested()
    _log_yield_boundary(context, requested)
    if requested:
        logging.warning(
            "device yield requested — exiting at %s (resume with -r / "
            "skip-done-images picks up here)", context
        )
        raise SystemExit(DEVICE_YIELD_RC)
