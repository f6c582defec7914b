"""Stopping conditions + segmented chain driver + timing.

Rebuild of reference ``models/mpp/rjmcmc_sampler/stopping.py:10-146`` and the
``RJMCMCTimer`` (``rjmcmc.py:18-48``). Under XLA a scan has a static length,
so data-dependent stopping runs at a coarser grain: the chain executes in
fixed-size segments (one compiled scan each) and the host checks the stopping
condition on the per-segment summaries — same decisions as the reference up to
segment granularity, at a fraction of the dispatch cost.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import EnergyCombiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import EnergyMaps, EnergySpec
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import KernelData
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import run_chain
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState


@dataclass
class SegmentSummary:
    """Per-segment analog of the reference's RJMCMCStateSummary."""

    iter: int
    energy: float
    n_points: int
    temperature: float
    accept_rate: float
    seconds: float


class StoppingCondition:
    def do_stop(self, summaries: List[SegmentSummary]) -> bool:
        raise NotImplementedError


@dataclass
class StopOnMaxIter(StoppingCondition):
    max_iter: int

    def do_stop(self, summaries):
        return bool(summaries) and summaries[-1].iter >= self.max_iter


@dataclass
class StopOnRejects(StoppingCondition):
    """Stop after a window of (near-)total rejection
    (reference ``stopping.py`` StopOnRejects)."""

    n_window: int = 2
    tol: float = 1e-3
    min_iter: int = 0

    def do_stop(self, summaries):
        if not summaries or summaries[-1].iter < self.min_iter:
            return False
        last = summaries[-self.n_window:]
        return len(last) == self.n_window and all(
            s.accept_rate <= self.tol for s in last
        )


@dataclass
class StopOnDeltaU(StoppingCondition):
    """Stop when the energy stops improving by more than ``tol`` per window."""

    tol: float = 1e-4
    n_window: int = 2
    min_iter: int = 0

    def do_stop(self, summaries):
        if len(summaries) <= self.n_window:
            return False
        if summaries[-1].iter < self.min_iter:
            return False
        e = [s.energy for s in summaries[-(self.n_window + 1):]]
        return all(abs(e[i + 1] - e[i]) <= self.tol for i in range(len(e) - 1))


@dataclass
class StopOnApprovalRate(StoppingCondition):
    target_rate: float = 1e-3
    min_iter: int = 0

    def do_stop(self, summaries):
        return (
            bool(summaries)
            and summaries[-1].iter >= self.min_iter
            and summaries[-1].accept_rate <= self.target_rate
        )


@dataclass
class CompositeStopping(StoppingCondition):
    conditions: List[StoppingCondition] = field(default_factory=list)
    mode: str = "any"

    def do_stop(self, summaries):
        hits = [c.do_stop(summaries) for c in self.conditions]
        return any(hits) if self.mode == "any" else all(hits)


@dataclass
class CustomStopping(StoppingCondition):
    fn: Callable[[List[SegmentSummary]], bool] = lambda s: False
    max_iter: Optional[int] = None
    min_iter: int = 0

    def do_stop(self, summaries):
        if not summaries:
            return False
        it = summaries[-1].iter
        if it < self.min_iter:
            return False
        if self.max_iter is not None and it >= self.max_iter:
            return True
        return self.fn(summaries)


def stopping_from_config(cfg) -> Optional[StoppingCondition]:
    """Build a StoppingCondition from the ``rjmcmc_params.stopping`` config
    block (the product analog of the reference's stopping-condition wiring,
    ``models/mpp/rjmcmc_sampler/stopping.py:10-146`` + ``sample_rjmcmc.py``).

    Accepts a dict ``{"kind": ..., **params}`` or a list of such dicts
    (combined with ``CompositeStopping(mode='any')``). Kinds: ``max_iter``,
    ``rejects``, ``delta_u``, ``approval_rate``. Iteration counts are in
    MOVES (the segmented drivers convert their superstep counts). Returns
    None for a falsy config."""
    if not cfg:
        return None
    if isinstance(cfg, (list, tuple)):
        conds = [stopping_from_config(c) for c in cfg]
        return CompositeStopping(conditions=[c for c in conds if c], mode="any")
    kinds = {
        "max_iter": StopOnMaxIter,
        "rejects": StopOnRejects,
        "delta_u": StopOnDeltaU,
        "approval_rate": StopOnApprovalRate,
    }
    params = dict(cfg)
    kind = params.pop("kind")
    return kinds[kind](**params)


def run_chain_segmented(key, init_state: PointsState, maps: EnergyMaps,
                        spec: EnergySpec, comb: EnergyCombiner, kd: KernelData,
                        stopping: StoppingCondition, segment: int = 2000,
                        max_segments: int = 100, t0: float = 1.0,
                        alpha_t: float = 0.999, t_target: float = 0.0):
    """Run segments of a compiled chain until ``stopping`` fires.

    Each segment reuses the same jitted scan (one compile); temperature is
    threaded across segments. Returns (state, summaries)."""
    summaries: List[SegmentSummary] = []
    state = init_state
    temp = t0
    it = 0
    for _ in range(max_segments):
        if stopping.do_stop(summaries):
            break
        key, sub = jax.random.split(key)
        t_start = time.perf_counter()
        state, stats = run_chain(
            sub, state, maps, spec, comb, kd, n_steps=segment,
            t0=temp, alpha_t=alpha_t, t_target=t_target,
        )
        jax.block_until_ready(stats.final_energy)
        dt = time.perf_counter() - t_start
        it += segment
        temp = float(stats.final_temperature)
        accept_rate = float(
            np.sum(np.asarray(stats.accepted))
            / max(1.0, float(np.sum(np.asarray(stats.proposed))))
        )
        summaries.append(
            SegmentSummary(
                iter=it,
                energy=float(stats.final_energy),
                n_points=int(stats.final_n_points),
                temperature=temp,
                accept_rate=accept_rate,
                seconds=dt,
            )
        )
    return state, summaries


class ChainTimer:
    """Aggregate moves/sec reporting (the RJMCMCTimer analog: the reference
    times Python phases per step, ``rjmcmc.py:18-48``; the fused scan has no
    per-phase host boundary, so the meaningful metrics are segment wall-clock
    and per-kernel accept rates)."""

    def __init__(self):
        self.segments: List[SegmentSummary] = []

    def extend(self, summaries: List[SegmentSummary]):
        self.segments.extend(summaries)

    def show_results(self) -> str:
        total_iter = self.segments[-1].iter if self.segments else 0
        total_s = sum(s.seconds for s in self.segments)
        mps = total_iter / total_s if total_s else 0.0
        lines = [f"chain: {total_iter} moves in {total_s:.2f}s = {mps:.0f} moves/s"]
        for s in self.segments:
            lines.append(
                f"  iter {s.iter:>8} E {s.energy:>10.3f} n {s.n_points:>4} "
                f"T {s.temperature:.4f} acc {s.accept_rate:.3f} {s.seconds:.2f}s"
            )
        return "\n".join(lines)
