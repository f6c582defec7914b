"""Energy-combination weight learning (the MPP's trainable part).

Rebuild of reference ``models/mpp/train_energy_combination/``:

  - **Ordering criterion** (``train_ordering_criterion.py:43-219``, used by
    mpp_log): perturb GT configs with kernel moves, maximise the mean energy
    increase — ``loss = -mean(U(perturbed) - U(gt))``. In the reference this
    needs a torch bridge (``EnergyComputeTorch``) threaded through the energy
    graph; here ΔU is a pure jnp function of the combiner params, so autograd
    is free and the whole (images x samples) batch evaluates in one jit.
  - **Integral criterion** (``train_integral_criterion.py:20-258``,
    contrastive): ``loss = mean(U(gt+)) - mean(U(neg-)) + reg``.

Both return an ``EnergyCombiner`` whose JSON export is the model-store
artifact (replacing ``energy_combination_model.pkl``).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import (
    EnergyCombiner,
    combine,
    init_combiner,
    regularisation,
)
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    EnergyMaps,
    energy_vectors,
)
from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import EnergySetup
from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import KernelData
from mpp_cnn_rs_object_detection_tpu.mpp.perturbations import (
    PRESETS,
    sample_kernel_perturbed_batch,
    sample_perturbed_batch,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState, state_from_arrays
from mpp_cnn_rs_object_detection_tpu.utils.config import maybe_yield_device

NON_TRAINABLE = ("threshold", "raw_energy")


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


# configs evaluated in parallel per energy_vectors launch: the dense (K,K)
# quad-clipping holds large transients per config, so wide vmaps over
# many configs exceed HBM (observed 24.1G for 128 configs at K=256)
VEC_CHUNK = 4


def _chunked_energy_vectors(states_b: PointsState, maps: EnergyMaps, spec,
                            chunk: int = VEC_CHUNK) -> jnp.ndarray:
    """(S, K, E) energy vectors for S stacked configs of ONE image,
    sequential over chunks of ``chunk`` vmapped configs."""
    s = states_b.xy.shape[0]
    pad = (-s) % chunk
    if pad:
        # repeat the last config (not x[:pad] — that underfills when S < pad)
        states_b = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
            ),
            states_b,
        )
    grouped = jax.tree_util.tree_map(
        lambda x: x.reshape((s + pad) // chunk, chunk, *x.shape[1:]),
        states_b,
    )
    vecs = jax.lax.map(
        lambda sb: jax.vmap(lambda st: energy_vectors(st, maps, spec))(sb),
        grouped,
    )
    return vecs.reshape(s + pad, *vecs.shape[2:])[:s]


def prepare_batch(crops: List[ImageWMaps], setup: EnergySetup, capacity: int
                  ) -> Tuple[EnergyMaps, KernelData, PointsState]:
    """Stack per-crop maps/kernel-data/GT states for one vmapped evaluation."""
    maps, kds, gts = [], [], []
    for c in crops:
        n = max(1, len(c.gt_centers))
        maps.append(setup.make_maps(c))
        kds.append(setup.make_kernel_data(c, intensity=n))
        gts.append(
            state_from_arrays(
                c.gt_centers[:capacity], c.gt_marks[:capacity], capacity=capacity
            )
        )
    return _stack(maps), _stack(kds), _stack(gts)


def _masked_grads(grads: Dict):
    """Zero out non-trainable param entries (threshold etc. are constants in
    the reference models)."""
    return {
        k: (jnp.zeros_like(v) if k in NON_TRAINABLE else v)
        for k, v in grads.items()
    }


def train_ordering_criterion(crops: List[ImageWMaps], setup: EnergySetup,
                             logger, save_dir: str, rng: np.random.Generator,
                             n_epochs: int = 8, samples_per_image: int = 16,
                             learning_rate: float = 0.05, optim: str = "adam",
                             reg_weight: float = 0.0,
                             weight_model_type: str = "logistic",
                             neg_pert_config: Dict = None,
                             lr_scheduler: bool = False,
                             lr_scheduler_params: Dict = None,
                             batch_size: int = 8, capacity: int = 256,
                             **_unused) -> EnergyCombiner:
    spec = setup.spec
    comb = init_combiner(weight_model_type, spec.names)
    iter_per_point = (neg_pert_config or {}).get("iter_per_point", 1.0)

    if lr_scheduler:
        gamma = (lr_scheduler_params or {}).get("gamma", 0.95)
        schedule = optax.exponential_decay(
            learning_rate, transition_steps=1, decay_rate=gamma
        )
    else:
        schedule = learning_rate
    tx = optax.adam(schedule) if optim == "adam" else optax.sgd(schedule)
    opt_state = tx.init(comb.params)

    n_moves = max(
        1, int(iter_per_point * max(1, max(len(c.gt_centers) for c in crops)))
    )
    key = jax.random.PRNGKey(int(rng.integers(2**31)))

    # the energy VECTORS are independent of the combiner params — only
    # ``combine`` is trainable. Computing them outside the grad keeps the
    # backward pass to the (K, E) -> scalar head instead of saving every
    # pairwise-clipping intermediate of (B*S) configs (which OOMs HBM).
    @jax.jit
    def prep_vectors(key, maps_b, kd_b, gt_b):
        k_pert, _ = jax.random.split(key)
        # sequential over images (see sample_kernel_perturbed_batch on why
        # batched axes must stay off the vmapped lax.switch)
        pert_b = jax.lax.map(
            lambda a: sample_kernel_perturbed_batch(
                a[0], a[1], a[2], n_moves, samples_per_image
            ),
            (jax.random.split(k_pert, gt_b.xy.shape[0]), gt_b, kd_b),
        )
        # sequential over images; VEC_CHUNK-wide vmap inside
        vec_gt = jax.lax.map(
            lambda gm: energy_vectors(gm[0], gm[1], spec), (gt_b, maps_b)
        )  # (B, K, E)
        vec_pert = jax.lax.map(
            lambda pm: _chunked_energy_vectors(pm[0], pm[1], spec),
            (pert_b, maps_b),
        )  # (B, S, K, E)
        return vec_gt, gt_b.alive, vec_pert, pert_b.alive

    @jax.jit
    def train_step(params, opt_state, vec_gt, alive_gt, vec_pert, alive_pert):
        def loss_fn(p):
            c = comb.replace(params=p)
            pp_gt = jax.vmap(lambda v: combine(c, v))(vec_gt)  # (B, K)
            u_gt = jnp.sum(jnp.where(alive_gt, pp_gt, 0.0), axis=-1)  # (B,)
            b, s, k, e = vec_pert.shape
            pp_pert = jax.vmap(lambda v: combine(c, v))(
                vec_pert.reshape(b * s, k, e)
            ).reshape(b, s, k)
            u_pert = jnp.sum(
                jnp.where(alive_pert, pp_pert, 0.0), axis=-1
            )  # (B, S)
            deltas = u_pert - u_gt[:, None]
            loss = -jnp.mean(deltas)
            if reg_weight:
                loss = loss + reg_weight * regularisation(c.replace(params=p))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = _masked_grads(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = comb.params
    n_batches = max(1, len(crops) // batch_size)
    step_i = 0
    for epoch in range(n_epochs):
        maybe_yield_device(f"weight-train epoch {epoch}")
        order = rng.permutation(len(crops))
        for b in range(n_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            batch = [crops[i] for i in idx]
            maps_b, kd_b, gt_b = prepare_batch(batch, setup, capacity)
            key, sub = jax.random.split(key)
            vecs = prep_vectors(sub, maps_b, kd_b, gt_b)
            params, opt_state, loss = train_step(params, opt_state, *vecs)
            step_i += 1
        comb = comb.replace(params=params)
        if logger is not None:
            from mpp_cnn_rs_object_detection_tpu.mpp.combinators import (
                combiner_as_report_dict,
            )

            logger.update(
                epoch, {"loss": float(loss), **combiner_as_report_dict(comb)}
            )
        logging.info(f"[ordering] epoch {epoch}: loss {float(loss):.4f}")
    return comb


def train_integral_criterion(crops: List[ImageWMaps], setup: EnergySetup,
                             logger, save_dir: str, rng: np.random.Generator,
                             n_epochs: int = 8, samples_per_image: int = 8,
                             learning_rate: float = 0.05, optim: str = "adam",
                             reg_weight: float = 0.0,
                             weight_model_type: str = "logistic",
                             pos_pert: str = "light", neg_pert: str = "medium",
                             lr_scheduler: bool = False,
                             lr_scheduler_params: Dict = None,
                             batch_size: int = 8, capacity: int = 256,
                             **_unused) -> EnergyCombiner:
    """Contrastive criterion: positives = GT (+light jitter), negatives =
    medium/strong perturbations (reference ``train_integral_criterion.py``)."""
    spec = setup.spec
    comb = init_combiner(weight_model_type, spec.names)
    pos_preset = PRESETS[pos_pert]
    neg_preset = PRESETS[neg_pert]

    if lr_scheduler:
        gamma = (lr_scheduler_params or {}).get("gamma", 0.95)
        schedule = optax.exponential_decay(
            learning_rate, transition_steps=1, decay_rate=gamma
        )
    else:
        schedule = learning_rate
    tx = optax.adam(schedule) if optim == "adam" else optax.sgd(schedule)
    opt_state = tx.init(comb.params)
    key = jax.random.PRNGKey(int(rng.integers(2**31)))
    patch_hw = crops[0].shape

    # as in the ordering criterion: energy vectors are param-independent, so
    # they are computed grad-free and only ``combine`` sits under autograd
    @jax.jit
    def prep_vectors(key, maps_b, kd_b, gt_b):
        k_pos, k_neg = jax.random.split(key)
        nb = gt_b.xy.shape[0]

        def perturb_and_vec(k, preset):
            # sequential over images — broadcast-under-vmap (see
            # sample_perturbed_batch)
            states_b = jax.lax.map(
                lambda a: sample_perturbed_batch(
                    a[0], a[1], a[2], patch_hw, preset, samples_per_image
                ),
                (jax.random.split(k, nb), gt_b, kd_b),
            )
            # sequential over images and sample-chunks for the same HBM
            # reason as the ordering criterion's prep_vectors
            vec = jax.lax.map(
                lambda sm: _chunked_energy_vectors(sm[0], sm[1], spec),
                (states_b, maps_b),
            )  # (B, S, K, E)
            return vec, states_b.alive

        vec_pos, alive_pos = perturb_and_vec(k_pos, pos_preset)
        vec_neg, alive_neg = perturb_and_vec(k_neg, neg_preset)
        return vec_pos, alive_pos, vec_neg, alive_neg

    @jax.jit
    def train_step(params, opt_state, vec_pos, alive_pos, vec_neg, alive_neg):
        def loss_fn(p):
            c = comb.replace(params=p)

            def mean_energy(vec, alive):
                b, s, k, e = vec.shape
                pp = jax.vmap(lambda v: combine(c, v))(
                    vec.reshape(b * s, k, e)
                ).reshape(b, s, k)
                return jnp.mean(jnp.sum(jnp.where(alive, pp, 0.0), axis=-1))

            e_plus = mean_energy(vec_pos, alive_pos)
            e_minus = mean_energy(vec_neg, alive_neg)
            loss = e_plus - e_minus
            if reg_weight:
                loss = loss + reg_weight * (
                    jnp.square(e_plus) + jnp.square(e_minus)
                )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = _masked_grads(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = comb.params
    n_batches = max(1, len(crops) // batch_size)
    for epoch in range(n_epochs):
        maybe_yield_device(f"weight-train epoch {epoch}")
        order = rng.permutation(len(crops))
        for b in range(n_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            batch = [crops[i] for i in idx]
            maps_b, kd_b, gt_b = prepare_batch(batch, setup, capacity)
            key, sub = jax.random.split(key)
            vecs = prep_vectors(sub, maps_b, kd_b, gt_b)
            params, opt_state, loss = train_step(params, opt_state, *vecs)
        comb = comb.replace(params=params)
        if logger is not None:
            logger.update(epoch, {"loss": float(loss)})
        logging.info(f"[integral] epoch {epoch}: loss {float(loss):.4f}")
    return comb
