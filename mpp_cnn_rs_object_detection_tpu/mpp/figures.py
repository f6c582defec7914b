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
