"""Vectorised value<->class-bin mappings for the 32-bin mark distributions.

Rebuild of the reference ``models/shape_net/mappings.py:10-157`` ``ValueMapping``
with all scalar Python loops replaced by array bin math so that class lookups
inside the sampler are single gathers. Semantics preserved:

  - ``feature_mapping = linspace(v_min, v_max, n_classes+1)[:-1]`` (bin left
    edges; a sampled "value" for a class is its left edge);
  - ``value_to_class(v)`` is the largest bin whose left edge is <= v
    (out-of-range values clip instead of warn);
  - cyclic mappings wrap with ``((v - v_min) mod range) + v_min``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Union

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ValueMapping:
    n_classes: int
    v_min: float
    v_max: float
    is_cyclic: bool = False

    def __post_init__(self):
        self.feature_mapping = np.linspace(
            self.v_min, self.v_max, num=self.n_classes + 1
        )[:-1]

    @property
    def range(self) -> float:
        return self.v_max - self.v_min

    def get_step(self) -> float:
        return float(np.mean(np.diff(self.feature_mapping)))

    def clip(self, value):
        if not self.is_cyclic:
            return np.clip(value, self.v_min, self.v_max)
        return ((value - self.v_min) % self.range) + self.v_min

    # --- array-friendly versions (work on numpy or jnp inputs) ---

    def value_to_class(self, value):
        """Largest bin index with left edge <= value; vectorised.

        Equivalent to ``max(argwhere(v >= feature_mapping))`` in the reference
        (``mappings.py:54-61``), i.e. ``floor((v - v_min) / step)`` clipped to
        [0, n_classes-1].
        """
        step = self.range / self.n_classes
        if isinstance(value, jnp.ndarray):
            cls = jnp.floor((value - self.v_min) / step).astype(jnp.int32)
            return jnp.clip(cls, 0, self.n_classes - 1)
        cls = np.floor((np.asarray(value) - self.v_min) / step).astype(np.int64)
        out = np.clip(cls, 0, self.n_classes - 1)
        if np.isscalar(value) or np.ndim(value) == 0:
            return int(out)
        return out

    def class_to_value(self, class_id):
        if isinstance(class_id, jnp.ndarray):
            fm = jnp.asarray(self.feature_mapping, dtype=jnp.float32)
            return fm[class_id]
        return self.feature_mapping[np.asarray(class_id)]

    def class_to_center_value(self, class_id):
        """Bin CENTER instead of the reference's left edge
        (``mappings.py:62-74``). ``value_to_class`` floors, so decoding at
        the left edge biases every decoded mark down by step/2 — measured
        −7.6% median size at GT centers on the train split. Center decode is
        the unbiased inverse; used at detection-output sites (the on-disk
        class ids are unchanged)."""
        return self.class_to_value(class_id) + 0.5 * self.get_step()

    def value_to_one_hot(self, value, interpolation=None):
        """One-hot (or linearly interpolated two-hot) encoding of values."""
        value = np.atleast_1d(np.asarray(value, dtype=np.float64))
        closest = self.value_to_class(value)
        n = value.shape[0]
        h = np.zeros((n, self.n_classes))
        if interpolation is None:
            h[np.arange(n), closest] = 1.0
        elif interpolation == "linear":
            remainder = np.remainder(value, self.get_step()) / self.get_step()
            upper = np.clip(closest + 1, 0, self.n_classes - 1)
            h[np.arange(n), closest] = 1.0 - remainder
            # accumulate so closest == upper (last bin) still sums to 1
            np.add.at(h, (np.arange(n), upper), remainder)
        else:
            raise ValueError(interpolation)
        return h


def default_mappings(n_classes: int = 32, size_min: float = 0.0, size_max: float = 32.0
                     ) -> List[ValueMapping]:
    """The (size, ratio, angle) mappings used by ShapeNet
    (reference ``shape_net_model.py:80-85``)."""
    return [
        ValueMapping(n_classes, size_min, size_max),
        ValueMapping(n_classes, 0.0, 1.0),
        ValueMapping(n_classes, 0.0, np.pi, is_cyclic=True),
    ]


def values_to_class_id(values, mappings: List[ValueMapping]):
    """Per-mark class ids for a list of (s, r, a) tuples; reference ``mappings.py:113-129``."""
    if len(values) == 0:
        return []
    arr = np.asarray(values, dtype=np.float64)
    if arr.ndim == 2:  # list of tuples -> per-feature arrays
        return [m.value_to_class(arr[:, i]) for i, m in enumerate(mappings)]
    return [m.value_to_class(v) for v, m in zip(values, mappings)]


def class_id_to_value(class_ids, mappings: List[ValueMapping]):
    arr = np.asarray(class_ids)
    if arr.ndim == 2:
        return [m.class_to_value(arr[:, i]) for i, m in enumerate(mappings)]
    return [m.class_to_value(c) for c, m in zip(class_ids, mappings)]


def output_vector_to_value(output_vector, mappings: List[ValueMapping]):
    """argmax of per-pixel class distributions -> values; reference ``mappings.py:145-157``.

    Each ``output_vector[i]`` is (B, C) or (B, C, H, W); argmax over C.
    """
    results = []
    for arr, mapping in zip(output_vector, mappings):
        arr = np.asarray(arr)
        results.append(mapping.class_to_value(np.argmax(arr, axis=1)))
    return results
