"""Fixed-capacity struct-of-arrays point configuration.

Replaces the reference's ``PointsSet`` spatial hash of Python objects
(``models/mpp/point_set/point_set.py:45-188``): under XLA every shape is
static, so a configuration is ``(xy, marks, alive)`` arrays of capacity K with
an alive mask; birth claims the first free slot, death clears the mask. No
neighbor grid is needed — pair terms are computed as dense masked (K, K)
matrices, which the VPU eats for K in the hundreds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@flax.struct.dataclass
class PointsState:
    """A rectangle configuration: marks are ``(size, ratio, angle)``."""

    xy: Array     # (K, 2) float32, (i, j) = (x, y) in reference convention
    marks: Array  # (K, 3) float32
    alive: Array  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    @property
    def n_points(self) -> Array:
        return jnp.sum(self.alive)


def empty_state(capacity: int) -> PointsState:
    return PointsState(
        xy=jnp.zeros((capacity, 2), jnp.float32),
        marks=jnp.ones((capacity, 3), jnp.float32),
        alive=jnp.zeros((capacity,), bool),
    )


def state_from_arrays(xy, marks, capacity: Optional[int] = None) -> PointsState:
    """Build a state from (N, 2)/(N, 3) host arrays, padding to ``capacity``."""
    xy = np.asarray(xy, np.float32).reshape(-1, 2)
    marks = np.asarray(marks, np.float32).reshape(-1, 3)
    n = len(xy)
    cap = capacity or max(n, 1)
    assert n <= cap, f"{n} points exceed capacity {cap}"
    out_xy = np.zeros((cap, 2), np.float32)
    out_marks = np.ones((cap, 3), np.float32)
    alive = np.zeros((cap,), bool)
    out_xy[:n] = xy
    out_marks[:n] = marks
    alive[:n] = True
    return PointsState(xy=jnp.asarray(out_xy), marks=jnp.asarray(out_marks),
                       alive=jnp.asarray(alive))


def state_to_arrays(state: PointsState) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the alive points as host (N, 2), (N, 3) arrays."""
    alive = np.asarray(state.alive)
    return np.asarray(state.xy)[alive], np.asarray(state.marks)[alive]


def first_free_slot(state: PointsState) -> Array:
    """Index of the first dead slot (capacity if the state is full)."""
    return jnp.argmin(state.alive)  # argmin of bools = first False


def birth(state: PointsState, slot: Array, xy: Array, marks: Array) -> PointsState:
    return state.replace(
        xy=state.xy.at[slot].set(xy),
        marks=state.marks.at[slot].set(marks),
        alive=state.alive.at[slot].set(True),
    )


def death(state: PointsState, slot: Array) -> PointsState:
    return state.replace(alive=state.alive.at[slot].set(False))


def move(state: PointsState, slot: Array, xy: Array, marks: Array) -> PointsState:
    return state.replace(
        xy=state.xy.at[slot].set(xy),
        marks=state.marks.at[slot].set(marks),
    )
