"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """Build a mesh over local devices.

    Defaults to a 1-D mesh over all devices; pass ``shape`` for N-D meshes
    (e.g. ``("scene", "data"), (2, 4)``). On a single chip everything
    degenerates to trivial shardings.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),)
    assert int(np.prod(shape)) == len(devs), (shape, len(devs))
    return Mesh(np.array(devs).reshape(shape), tuple(axis_names))
