"""Training metrics logger with rolling checkpoints.

Rebuild of reference ``utils/logger.py:14-58``: a dict-of-lists metric log
rewritten to ``log.json`` on every update, plus a rolling model checkpoint
(``checkpoint_NNNN.msgpack``) every ``checkpoint_interval`` epochs with the
previous one deleted. Checkpoints here are flax param pytrees serialised with
``flax.serialization`` instead of torch state dicts.
"""

from __future__ import annotations

import glob
import json
import os
from datetime import datetime
from typing import Callable, Dict, List, Optional

import numpy as np

from mpp_cnn_rs_object_detection_tpu.utils.files import NumpyEncoder, append_lists_in_dict


class Logger:
    def __init__(self, save_dir: str, checkpoint_interval: Optional[int] = None,
                 state_provider: Optional[Callable[[], bytes]] = None):
        self.log: Dict[str, List] = dict()
        self.save_dir = save_dir
        self.checkpoint_interval = checkpoint_interval
        self.state_provider = state_provider

    @classmethod
    def load(cls, path: str) -> "Logger":
        with open(path, "r") as f:
            log = json.load(f)
        loaded = Logger(save_dir=os.path.split(path)[0])
        loaded.log = log
        return loaded

    def clear(self):
        self.log = dict()

    def log_model(self, checkpoint_interval: Optional[int] = None,
                  state_provider: Optional[Callable[[], bytes]] = None):
        """Register a zero-arg callable returning serialised model state bytes."""
        self.checkpoint_interval = checkpoint_interval
        self.state_provider = state_provider

    def update_train_val(self, epoch: int, train_metrics: Dict[str, List[float]],
                         val_metrics: Dict[str, List[float]]):
        metrics = {
            **{"train_" + k: float(np.mean(v)) for k, v in train_metrics.items()},
            **{"val_" + k: float(np.mean(v)) for k, v in val_metrics.items()},
        }
        self.update(epoch, metrics=metrics)

    def update(self, epoch: int, metrics: Dict[str, float], prefix: str = ""):
        timestamp_str = datetime.now().strftime("%m/%d/%y-%H:%M:%S")
        append_lists_in_dict(self.log, {"epoch": epoch})
        append_lists_in_dict(self.log, {"timestamp": timestamp_str})
        append_lists_in_dict(self.log, {prefix + k: v for k, v in metrics.items()})

        if (
            self.checkpoint_interval is not None
            and self.state_provider is not None
            and epoch % self.checkpoint_interval == 0
        ):
            for p in glob.glob(os.path.join(self.save_dir, "checkpoint_*.msgpack")):
                os.remove(p)
            with open(
                os.path.join(self.save_dir, f"checkpoint_{epoch:04}.msgpack"), "wb"
            ) as f:
                f.write(self.state_provider())

        with open(os.path.join(self.save_dir, "log.json"), "w") as f:
            json.dump(self.log, f, cls=NumpyEncoder, indent=1)
