"""Small file/JSON helpers (rebuild of reference ``utils/files.py`` / ``utils/misc.py``)."""

from __future__ import annotations

import datetime
import json
import os
from typing import Iterable, Union

import numpy as np


def timestamp() -> str:
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def make_if_not_exist(path: Union[str, Iterable[str]], recursive: bool = False):
    if isinstance(path, (list, tuple)):
        for p in path:
            make_if_not_exist(p, recursive=recursive)
        return
    if not os.path.exists(path):
        if recursive:
            os.makedirs(path, exist_ok=True)
        else:
            os.mkdir(path)


def find_existing_path(candidates: Iterable[str]) -> str:
    """First existing path among candidates (reference paths_config semantics)."""
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"none of the candidate paths exist: {list(candidates)}")


class NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def append_lists_in_dict(d: dict, update: dict):
    for key, value in update.items():
        d.setdefault(key, []).append(value)
