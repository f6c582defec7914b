"""MPP analysis figures: energy cross-plots, papangelou heatmaps, weight
trajectories (reference ``models/mpp/display.py``, ``utils/figures/
analyse_mpp.py``, ``show_pp_energies.py`` — matplotlib Agg)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def energy_cross_plots(vectors: np.ndarray, names: List[str], path: str,
                       per_point_energy: Optional[np.ndarray] = None):
    """Pairwise scatter of per-point energy terms, colored by combined energy
    (reference ``show_pp_energies.py`` cross-plots)."""
    plt = _plt()
    n = len(names)
    fig, axs = plt.subplots(n, n, figsize=(2.2 * n, 2.2 * n))
    c = per_point_energy if per_point_energy is not None else "tab:blue"
    for i in range(n):
        for j in range(n):
            ax = axs[i, j]
            if i == j:
                ax.hist(vectors[:, i], bins=20)
            else:
                ax.scatter(vectors[:, j], vectors[:, i], s=4, c=c, cmap="plasma")
            if i == n - 1:
                ax.set_xlabel(names[j], fontsize=6)
            if j == 0:
                ax.set_ylabel(names[i], fontsize=6)
            ax.tick_params(labelsize=5)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def papangelou_heatmap(image: np.ndarray, maps, spec, comb, marks,
                       path: str, stride: int = 4):
    """exp(-ΔU) of inserting a probe rectangle at every (strided) pixel —
    the per-location detection confidence field (reference
    ``utils/figures/analyse_mpp.py:papangelou map``)."""
    import jax
    import jax.numpy as jnp

    from mpp_cnn_rs_object_detection_tpu.mpp.energies import total_energy
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays

    plt = _plt()
    h, w = image.shape[:2]
    ys = np.arange(0, h, stride)
    xs = np.arange(0, w, stride)
    base = state_from_arrays(
        np.zeros((0, 2), np.float32), np.zeros((0, 3), np.float32), capacity=1
    )
    u0 = float(total_energy(base, maps, spec, comb))

    probe_template = state_from_arrays(
        np.zeros((1, 2), np.float32), np.asarray([marks], np.float32),
        capacity=1,
    )

    @jax.jit
    def probe_energy(xy):
        st = probe_template.replace(
            xy=jnp.asarray(xy, jnp.float32).reshape(1, 2)
        )
        return total_energy(st, maps, spec, comb)

    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
    energies = np.asarray(
        jax.vmap(probe_energy)(jnp.asarray(grid, jnp.float32))
    ).reshape(len(ys), len(xs))
    pap = np.exp(-(energies - u0))

    fig, axs = plt.subplots(1, 2, figsize=(10, 5))
    axs[0].imshow(np.clip(image, 0, 1))
    axs[0].set_title("image")
    im = axs[1].imshow(pap, cmap="plasma")
    axs[1].set_title("papangelou(probe)")
    fig.colorbar(im, ax=axs[1])
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return pap


def energy_attribution(comb, vectors: np.ndarray, n_steps: int = 32
                       ) -> np.ndarray:
    """Per-term attribution of the combined per-point energy.

    TPU-native replacement of the reference's ``shap.DeepExplainer`` over the
    MLP combinator (``utils/figures/show_shap_values.py:139-141``): integrated
    gradients from a zero baseline give the same additive per-feature
    decomposition without the ``shap`` dependency, and work uniformly for every
    combiner kind since ``combine`` is differentiable.

    Returns (N, n_energies) attributions; rows sum to
    ``combine(x) - combine(0)`` up to IG discretisation error.
    """
    import jax
    import jax.numpy as jnp

    from mpp_cnn_rs_object_detection_tpu.mpp.combinators import combine

    x = jnp.asarray(vectors, jnp.float32).reshape(-1, len(comb.names))

    def total(v):
        return jnp.sum(combine(comb, v))

    grad = jax.grad(total)
    # midpoint rule over the straight-line path 0 -> x
    alphas = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    grads = jax.vmap(lambda a: grad(a * x))(alphas)
    return np.asarray(x * jnp.mean(grads, axis=0))


def attribution_summary_plot(attributions: np.ndarray, vectors: np.ndarray,
                             names: List[str], path: str):
    """SHAP-style summary: one jittered scatter row per energy term, x =
    attribution, color = the term's raw value (reference
    ``shap.summary_plot`` call, ``show_shap_values.py:150``)."""
    plt = _plt()
    attributions = np.asarray(attributions)
    vectors = np.asarray(vectors)
    n = len(names)
    rng = np.random.default_rng(0)
    fig, ax = plt.subplots(figsize=(7, 0.5 * n + 2))
    order = np.argsort(np.abs(attributions).mean(axis=0))
    for row, i in enumerate(order):
        y = row + 0.12 * rng.standard_normal(attributions.shape[0])
        v = vectors[:, i]
        rng_v = max(float(v.max() - v.min()), 1e-8)
        sc = ax.scatter(
            attributions[:, i], y, c=(v - v.min()) / rng_v, cmap="coolwarm",
            s=10, vmin=0, vmax=1,
        )
    ax.axvline(0.0, color="gray", lw=0.8)
    ax.set_yticks(range(n))
    ax.set_yticklabels([names[i] for i in order], fontsize=7)
    ax.set_xlabel("attribution to combined energy")
    fig.colorbar(sc, ax=ax, label="term value (normalized)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def interaction_figure(image: np.ndarray, state, cache, path: str,
                       term: str = "overlap", max_dist: float = 32.0):
    """Rectangles + interaction lines between neighboring points, colored and
    weighted by the pair-energy value (reference ``show_interactions``,
    ``show_shap_values.py:29-46`` — reads the dense pair matrices instead of
    walking per-point PairEnergy lists)."""
    from mpp_cnn_rs_object_detection_tpu.ops.geometry import (
        rect_to_poly_np,
        sra_to_wla,
    )

    plt = _plt()
    alive = np.asarray(state.alive)
    xy = np.asarray(state.xy)[alive]
    marks = np.asarray(state.marks)[alive]
    dist = np.asarray(cache.dist)[alive][:, alive]
    values = np.asarray(getattr(cache, term))[alive][:, alive]

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.imshow(np.clip(image, 0, 1))
    if len(xy):
        a, b, w = sra_to_wla(marks[:, 0], marks[:, 1], marks[:, 2])
        polys = rect_to_poly_np(xy, np.asarray(a), np.asarray(b), np.asarray(w))
        for poly in polys:
            ax.add_patch(
                plt.Polygon(np.flip(poly, -1), fill=False, ec="lime", lw=0.8)
            )
    iu, ju = np.triu_indices(len(xy), k=1)
    near = dist[iu, ju] <= max_dist
    vmax = max(float(np.abs(values[iu, ju][near]).max()), 1e-8) if near.any() else 1.0
    cmap = plt.get_cmap("plasma")
    for a, b in zip(iu[near], ju[near]):
        v = values[a, b]
        t = float(np.clip(abs(v) / vmax, 0, 1))
        ax.plot(
            [xy[a, 1], xy[b, 1]], [xy[a, 0], xy[b, 0]],
            c=cmap(t), lw=1 + 3 * t, alpha=0.6,
        )
    ax.set_title(f"pair term '{term}' interactions")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def weight_trajectory_plot(log: Dict[str, List[float]], path: str):
    """Learned combinator weights over epochs (reference
    ``train_ordering_criterion`` figures)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4))
    for k, v in log.items():
        if k.endswith("_weight") or k == "bias":
            ax.plot(v, label=k)
    ax.set_xlabel("epoch")
    ax.set_ylabel("weight")
    ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def loss_plot(train_loss: List[float], val_loss: List[float], path: str):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(train_loss, label="train")
    ax.plot(val_loss, label="val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
