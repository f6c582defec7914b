"""Training machinery shared by the CNN models: mesh-sharded train steps,
train state, checkpoint IO, metric accumulation.

Replaces the reference's torch ``Adam`` loops (``pos_net_model.py:116-147``,
``utils/training.py:93-131``) with a data-parallel jitted step over a
``jax.sharding.Mesh``: the batch is sharded along the ``data`` axis, params are
replicated, and XLA inserts the gradient all-reduce over ICI — no NCCL analog
needed (SURVEY.md §2.9). On a single chip the mesh degenerates gracefully.
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Any, Callable, Dict, List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    """Params + BatchNorm statistics + optimizer state (a pure pytree)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: FrozenDict, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(params),
        )


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ``data`` mesh over all (or the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host numpy arrays batch-sharded over the mesh."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sharding), batch
    )


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_train_step(apply_loss: Callable, tx: optax.GradientTransformation,
                    has_batch_stats: bool = True):
    """Build a jitted data-parallel train step.

    ``apply_loss(params, batch_stats, batch, train) -> (loss, (metrics, new_batch_stats))``
    must be pure. The returned step takes (state, batch) and returns
    (new_state, metrics dict of scalars).
    """

    @jax.jit
    def step(state: TrainState, batch):
        def loss_fn(params):
            return apply_loss(params, state.batch_stats, batch, True)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                batch_stats=new_stats if has_batch_stats else state.batch_stats,
            ),
            metrics,
        )

    return step


def make_train_epoch_fn(apply_loss: Callable, tx: optax.GradientTransformation):
    """One-dispatch epoch: ``lax.scan`` over stacked batches on device.

    Under a tunneled TPU every dispatch costs seconds of latency; scanning the
    whole epoch in one jitted call reduces an epoch from ~100 round-trips to 1
    (batches: a pytree stacked along a leading n_batches axis)."""

    @jax.jit
    def epoch(state: TrainState, batches):
        def body(st, batch):
            def loss_fn(params):
                return apply_loss(params, st.batch_stats, batch, True)

            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
                st.params
            )
            updates, new_opt_state = tx.update(grads, st.opt_state, st.params)
            return (
                st.replace(
                    step=st.step + 1,
                    params=optax.apply_updates(st.params, updates),
                    opt_state=new_opt_state,
                    batch_stats=new_stats,
                ),
                metrics,
            )

        return jax.lax.scan(body, state, batches)

    return epoch


def make_device_epoch_fns(apply_loss: Callable,
                          tx: optax.GradientTransformation,
                          target_fn: Callable):
    """Epoch functions over a device-resident ``PatchStack``: batches are
    gathered from the resident uint8 stack, augmented (train only) and turned
    into label targets entirely on-device — the host contributes only an index
    permutation per epoch (see ``data/device_pipeline.py``)."""
    from mpp_cnn_rs_object_detection_tpu.data.device_pipeline import (
        augment_batch,
    )

    @jax.jit
    def train_epoch(state: TrainState, images_u8, centers, params, valid,
                    batch_idx, key):
        keys = jax.random.split(key, batch_idx.shape[0])

        def body(st, xs):
            idx, k = xs
            x, cen, par, v = augment_batch(
                k, images_u8[idx], centers[idx], params[idx], valid[idx]
            )
            y = jax.vmap(target_fn)(cen, par, v)

            def loss_fn(p):
                return apply_loss(p, st.batch_stats, (x, y), True)

            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
                st.params
            )
            updates, new_opt_state = tx.update(grads, st.opt_state, st.params)
            return (
                st.replace(
                    step=st.step + 1,
                    params=optax.apply_updates(st.params, updates),
                    opt_state=new_opt_state,
                    batch_stats=new_stats,
                ),
                metrics,
            )

        return jax.lax.scan(body, state, (batch_idx, keys))

    @jax.jit
    def eval_epoch(state: TrainState, images_u8, centers, params, valid,
                   batch_idx):
        def body(_, idx):
            x = images_u8[idx].astype(jnp.float32) / 255.0
            y = jax.vmap(target_fn)(centers[idx], params[idx], valid[idx])
            _, (metrics, _) = apply_loss(
                state.params, state.batch_stats, (x, y), False
            )
            return None, metrics

        _, metrics = jax.lax.scan(body, None, batch_idx)
        return metrics

    return train_epoch, eval_epoch


def make_eval_epoch_fn(apply_loss: Callable):
    @jax.jit
    def epoch(state: TrainState, batches):
        def body(_, batch):
            _, (metrics, _) = apply_loss(
                state.params, state.batch_stats, batch, False
            )
            return None, metrics

        _, metrics = jax.lax.scan(body, None, batches)
        return metrics

    return epoch


def stack_batches(loader) -> Optional[tuple]:
    """Materialise a loader's batches and stack along a leading axis."""
    items = list(loader)
    if not items:
        return None
    xs = np.stack([b[0] for b in items])
    ys = {}
    for k, v0 in items[0][1].items():
        if isinstance(v0, list):
            ys[k] = [
                np.stack([b[1][k][i] for b in items]) for i in range(len(v0))
            ]
        else:
            ys[k] = np.stack([b[1][k] for b in items])
    return xs, ys


def make_eval_step(apply_loss: Callable):
    @jax.jit
    def step(state: TrainState, batch):
        _, (metrics, _) = apply_loss(state.params, state.batch_stats, batch, False)
        return metrics

    return step


def update_metrics(metrics: Dict[str, jnp.ndarray],
                   agg: Optional[Dict[str, List[float]]]) -> Dict[str, List[float]]:
    """Append scalar metrics to a dict of lists (reference ``utils/training.py:24-31``)."""
    if agg is None:
        agg = {k: [] for k in metrics}
    for k, v in metrics.items():
        agg[k].append(float(v))
    return agg


def mean_metrics(agg: Dict[str, List[float]]) -> Dict[str, float]:
    return {k: float(np.mean(v)) for k, v in agg.items()}


# ---------------------------------------------------------------------------
# Checkpoint IO — msgpack via flax.serialization; layout mirrors the reference
# model store (SURVEY.md C3): model.msgpack at train end + rolling
# checkpoint_NNNN.msgpack every `checkpoint_interval` epochs.
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"checkpoint_([0-9]+)\.msgpack")


def save_checkpoint(save_path: str, state: TrainState, epoch: int,
                    name: Optional[str] = None, keep_previous: bool = False):
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": epoch,
    }
    data = serialization.to_bytes(target)
    if name is None:
        name = f"checkpoint_{epoch:04}.msgpack"
        if not keep_previous:
            for old in glob.glob(os.path.join(save_path, "checkpoint_*.msgpack")):
                os.remove(old)
    with open(os.path.join(save_path, name), "wb") as f:
        f.write(data)


def latest_checkpoint(save_path: str) -> Optional[str]:
    model_file = os.path.join(save_path, "model.msgpack")
    if os.path.exists(model_file):
        return model_file
    ckpts = sorted(glob.glob(os.path.join(save_path, "checkpoint_*.msgpack")))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str, state: TrainState) -> tuple:
    """Restore (state, last_epoch) from a checkpoint file, using ``state`` as
    the shape/dtype template (reference ``base/base_model.py:35-49``).

    Optimizer state is restored best-effort: checkpoints written before an
    optimizer-stack change (e.g. plain adam -> clip+schedule chain) have an
    incompatible ``opt_state`` pytree. Weights are what matter for inference
    and for resuming; on mismatch the fresh ``state.opt_state`` is kept and a
    warning is logged instead of failing the restore."""
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": 0,
    }
    try:
        restored = serialization.from_bytes(template, blob)
        opt_state = restored["opt_state"]
    except (ValueError, KeyError):
        restored = serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats,
             "epoch": 0},
            blob,
        )
        opt_state = state.opt_state
        logging.warning(
            f"{path}: stored opt_state does not match the current optimizer "
            "stack; restored weights only (optimizer reinitialised)"
        )
    return (
        state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=opt_state,
        ),
        int(restored["epoch"]),
    )
