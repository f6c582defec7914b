"""Energy combination models: per-point energy vector -> scalar energy.

Unifies the reference's ``EnergyCombinationModel`` (inference pickles) and
``WeightModel`` (torch training modules) — in JAX one differentiable pytree
serves both roles (``models/mpp/energies/combination/*``). ``combine`` maps a
(K, n_energies) matrix to (K,) per-point energies; the configuration energy is
the masked sum (``energies.total_energy``).

Kinds (reference files):
  - 'sum'                 : plain sum of the vector (no combinator,
                            ``energy_graph.py:186-192``)
  - 'manual_hierarchical' : config-dict weights + PositionEnergy indicator
                            gating (``hierarchical.py:35-48``)
  - 'hierarchical'        : softmax-normalised data/prior tree + gating
                            (``hierarchical.py:13-32,51-150``)
  - 'logistic'            : 2*sigmoid(w.e + b) - 1 per point (``logistic.py``)
  - 'linear'              : w.e + b per point (``linear.py``)
  - 'mlp'                 : small MLP, 2*sigmoid(out)-1 or raw (``mlp.py``)
"""

from __future__ import annotations

import json
from typing import Any, Dict, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@flax.struct.dataclass
class EnergyCombiner:
    kind: str = flax.struct.field(pytree_node=False)
    names: Tuple[str, ...] = flax.struct.field(pytree_node=False)
    params: Dict[str, Any] = flax.struct.field(default_factory=dict)
    # index of the indicator column (PositionEnergy) for hierarchical kinds
    indicator: int = flax.struct.field(pytree_node=False, default=0)

    def __call__(self, vec: Array) -> Array:
        return combine(self, vec)


def combine(comb: EnergyCombiner, vec: Array) -> Array:
    """(K, n_energies) -> (K,) per-point energies."""
    kind, p = comb.kind, comb.params
    if kind == "sum":
        return jnp.sum(vec, axis=-1)

    if kind == "manual_hierarchical":
        w = p["weights"]  # (n,) aligned with comb.names
        i = comb.indicator
        indicator = vec[:, i] <= p["threshold"]
        gated = jnp.sum(w * vec, axis=-1) - w[i] * vec[:, i]
        return w[i] * vec[:, i] + indicator * gated

    if kind in ("hierarchical", "hierarchical_fixed"):
        # legacy 5-column layout: [pos, shape, overlap, align, area].
        # 'hierarchical' is the trainable form (softmax-normalised raw
        # weights, reference hierarchical.py:65-77); '_fixed' is the exported
        # combinator with already-normalised weights (hierarchical.py:13-32).
        if kind == "hierarchical":
            wd = jax.nn.softmax(p["data_weight"])
            wp = jax.nn.softmax(p["prior_weight"])
            wdp = jax.nn.softmax(p["data_prior_weight"])
        else:
            wd, wp, wdp = p["data_weight"], p["prior_weight"], p["data_prior_weight"]
        indicator = vec[:, 0] <= p["threshold"]
        data_term = wd[0] * vec[:, 0] + indicator * wd[1] * vec[:, 1]
        prior_term = indicator * (
            wp[0] * vec[:, 2] + wp[1] * vec[:, 3] + wp[2] * vec[:, 4]
        )
        return wdp[0] * data_term + wdp[1] * prior_term + p["bias"]

    if kind == "logistic":
        # reference formula (``logistic.py:14-69``): 2*sigmoid(w.e + b) - 1
        # with the scalar bias added ONCE. (Rounds <= 3 summed the bias per
        # energy column — n x the reference's +b; combiner files from those
        # rounds are migrated on load, see ``combiner_from_dict``.)
        return 2.0 * jax.nn.sigmoid(
            jnp.sum(p["weights"] * vec, axis=-1) + p["bias"]
        ) - 1.0

    if kind == "linear":
        return jnp.sum(p["weights"] * vec, axis=-1) + p["bias"]

    if kind == "mlp":
        x = vec
        n_layers = len([k for k in p if k.startswith("w")])
        for li in range(n_layers):
            x = x @ p[f"w{li}"] + p[f"b{li}"]
            if li < n_layers - 1:
                x = jax.nn.relu(x)
        x = x[..., 0]
        if p.get("raw_energy") is not None and bool(p["raw_energy"]):
            return x
        return 2.0 * jax.nn.sigmoid(x) - 1.0

    raise ValueError(f"unknown combiner kind {kind}")


def regularisation(comb: EnergyCombiner) -> Array:
    """Training regulariser (reference ``hierarchical.py:79-90``)."""
    if comb.kind == "hierarchical":
        p = comb.params
        terms = [
            jnp.square(1.0 - jax.nn.softmax(p["data_prior_weight"])),
            jnp.square(1.0 - jax.nn.softmax(p["data_weight"])),
            jnp.square(1.0 - jax.nn.softmax(p["prior_weight"])),
        ]
        return sum(jnp.sum(t) for t in terms)
    return jnp.asarray(0.0)


# -------------------------------------------------------------------- builders


def sum_combiner(names: Sequence[str]) -> EnergyCombiner:
    return EnergyCombiner(kind="sum", names=tuple(names))


def manual_hierarchical(names: Sequence[str], weights_dict: Dict[str, float],
                        indicator_energy: str = "PositionEnergy",
                        threshold: float = 0.0) -> EnergyCombiner:
    w = jnp.array([float(weights_dict[n]) for n in names], jnp.float32)
    return EnergyCombiner(
        kind="manual_hierarchical",
        names=tuple(names),
        params={"weights": w, "threshold": jnp.asarray(threshold, jnp.float32)},
        indicator=list(names).index(indicator_energy),
    )


def hierarchical(names: Sequence[str], threshold: float = 0.0,
                 learn_bias: bool = False) -> EnergyCombiner:
    return EnergyCombiner(
        kind="hierarchical",
        names=tuple(names),
        params={
            "data_weight": jnp.ones((2,), jnp.float32),
            "prior_weight": jnp.ones((3,), jnp.float32),
            "data_prior_weight": jnp.ones((2,), jnp.float32),
            "threshold": jnp.asarray(threshold, jnp.float32),
            "bias": jnp.asarray(0.0, jnp.float32),
        },
    )


def hierarchical_fixed(names: Sequence[str], weights_data, weights_prior,
                       data_prior_weights, threshold: float = 0.0,
                       bias: float = 0.0) -> EnergyCombiner:
    """Exported/manual hierarchical combinator with normalised weights
    (reference ``HierarchicalEnergyCombinator``, built from the legacy
    'manual' config block at ``mpp_model.py:160-181``)."""
    return EnergyCombiner(
        kind="hierarchical_fixed",
        names=tuple(names),
        params={
            "data_weight": jnp.asarray(weights_data, jnp.float32),
            "prior_weight": jnp.asarray(weights_prior, jnp.float32),
            "data_prior_weight": jnp.asarray(data_prior_weights, jnp.float32),
            "threshold": jnp.asarray(threshold, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32),
        },
    )


def logistic(names: Sequence[str], use_bias: bool = True) -> EnergyCombiner:
    return EnergyCombiner(
        kind="logistic",
        names=tuple(names),
        params={
            "weights": jnp.ones((len(names),), jnp.float32),
            "bias": jnp.asarray(0.0, jnp.float32),
        },
    )


def linear(names: Sequence[str]) -> EnergyCombiner:
    return EnergyCombiner(
        kind="linear",
        names=tuple(names),
        params={
            "weights": jnp.ones((len(names),), jnp.float32),
            "bias": jnp.asarray(0.0, jnp.float32),
        },
    )


def mlp(names: Sequence[str], hidden_features: int = 8, hidden_layers: int = 2,
        raw_energy: bool = False, seed: int = 0) -> EnergyCombiner:
    key = jax.random.PRNGKey(seed)
    dims = [len(names)] + [hidden_features] * hidden_layers + [1]
    params: Dict[str, Any] = {}
    for li, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        params[f"w{li}"] = jax.random.normal(sub, (din, dout)) * jnp.sqrt(2.0 / din)
        params[f"b{li}"] = jnp.zeros((dout,))
    params["raw_energy"] = jnp.asarray(float(raw_energy))
    return EnergyCombiner(kind="mlp", names=tuple(names), params=params)


def init_combiner(kind: str, names: Sequence[str], **kwargs) -> EnergyCombiner:
    """Weight-model factory (reference ``train_utils.py:21-41``)."""
    builders = {
        "sum": sum_combiner,
        "manual_hierarchical": manual_hierarchical,
        "hierarchical": hierarchical,
        "logistic": logistic,
        "linear": linear,
        "mlp": mlp,
    }
    return builders[kind](names, **kwargs)


# ----------------------------------------------------------------- persistence


# bump when ``combine`` semantics change; ``combiner_from_dict`` migrates
# older files so trained artifacts keep their exact behavior.
#   v2: logistic bias applied once (v1/unversioned summed it per column)
COMBINER_FORMAT_VERSION = 2


def combiner_to_dict(comb: EnergyCombiner) -> dict:
    return {
        "kind": comb.kind,
        "names": list(comb.names),
        "indicator": comb.indicator,
        "version": COMBINER_FORMAT_VERSION,
        "params": {
            k: (np.asarray(v).tolist()) for k, v in comb.params.items()
        },
    }


def combiner_from_dict(d: dict) -> EnergyCombiner:
    params = {k: jnp.asarray(v, jnp.float32) for k, v in d["params"].items()}
    if d.get("version", 1) < 2 and d["kind"] == "logistic":
        # v1 logistic summed the scalar bias once PER COLUMN; scale the
        # stored bias so the single-bias formula reproduces the trained
        # behavior bit-for-bit. Importing the reference's own pickled
        # weights needs no shim: reference files are single-bias already —
        # write them with "version": 2 (or any >= 2).
        params["bias"] = params["bias"] * float(len(d["names"]))
    return EnergyCombiner(
        kind=d["kind"],
        names=tuple(d["names"]),
        params=params,
        indicator=d.get("indicator", 0),
    )


def save_combiner(path: str, comb: EnergyCombiner):
    with open(path, "w") as f:
        json.dump(combiner_to_dict(comb), f, indent=1)


def load_combiner(path: str) -> EnergyCombiner:
    with open(path) as f:
        return combiner_from_dict(json.load(f))


def combiner_as_report_dict(comb: EnergyCombiner) -> Dict[str, float]:
    """Flat named-weights dict for logging (reference ``as_dict`` methods)."""
    p = comb.params
    if comb.kind in ("logistic", "linear", "manual_hierarchical"):
        w = np.asarray(p["weights"])
        out = {f"{n}_weight": float(w[i]) for i, n in enumerate(comb.names)}
        if "bias" in p:
            out["bias"] = float(np.asarray(p["bias"]))
        return out
    if comb.kind == "hierarchical":
        wd = np.asarray(jax.nn.softmax(p["data_weight"]))
        wp = np.asarray(jax.nn.softmax(p["prior_weight"]))
        wdp = np.asarray(jax.nn.softmax(p["data_prior_weight"]))
        return {
            "data_weight": float(wdp[0]),
            "prior_weight": float(wdp[1]),
            "PositionEnergy_indicator_threshold": float(np.asarray(p["threshold"])),
            "PositionEnergy_data_weight": float(wd[0]),
            "ShapeEnergy_data_weight": float(wd[1]),
            "RectangleOverlapEnergy_prior_weight": float(wp[0]),
            "ShapeAlignmentEnergy_prior_weight": float(wp[1]),
            "AreaPriorEnergy_prior_weight": float(wp[2]),
            "bias": float(np.asarray(p["bias"])),
        }
    return {}
