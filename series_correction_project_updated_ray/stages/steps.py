"""Pluggable correction-step registry (reference extension surface §2.10).

The reference composes its pipeline from ordered
``DiscontinuityConfig(step_name, detect_func, correct_func, …)`` entries
(discontinuity_utils.py:18-25,324-338).  The rebuild keeps that shape as
numpy-level step objects executed by :func:`run_steps` — the fused
per-series kernel is just ``run_steps(default_steps(config))``, and users
register custom steps (or reorder/disable built-ins) the same way.

A step sees ``(t, v)`` and returns possibly modified ``(t, v)``; detection
and correction are separate callables so a detect-only pass (flagging) can
reuse the registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from .. import kernels as K


@dataclass
class CorrectionStep:
    name: str
    detect: Callable  # (t, v, **kw) -> np.ndarray indices
    correct: Callable  # (t, v, indices, **kw) -> (t, v)
    detect_kwargs: dict = field(default_factory=dict)
    correct_kwargs: dict = field(default_factory=dict)
    resort_time: bool = False


def _detect_gaps(t, v, **kw):
    return K.detect_gaps(t, kw.get("threshold_factor", 3.0))


def _correct_gaps(t, v, idx, **kw):
    return K.correct_gaps(t, v, idx, kw.get("method", "linear"))


def _detect_outliers(t, v, **kw):
    return K.hampel_outliers(v, kw.get("window_size", 5),
                             kw.get("threshold", 3.0),
                             kw.get("variant", "processor"))


def _correct_outliers(t, v, idx, **kw):
    return t, K.correct_outliers(v, idx, kw.get("window_size", 5),
                                 kw.get("method", "median"))


def _detect_jumps(t, v, **kw):
    return K.cusum_jumps(v, kw.get("window_size", 5), kw.get("threshold", 3.0))


def _correct_jumps(t, v, idx, **kw):
    return t, K.correct_jumps(v, idx, kw.get("window_size", 5))


def _detect_global_mad(t, v, **kw):
    _, mask = K.global_mad_outliers(v, kw.get("threshold", 3.0))
    return np.where(mask)[0]


def _correct_global_mad(t, v, idx, **kw):
    corrected, _ = K.global_mad_outliers(v, kw.get("threshold", 3.0))
    return t, corrected


BUILTIN_STEPS: dict[str, tuple[Callable, Callable]] = {
    "gaps": (_detect_gaps, _correct_gaps),
    "outliers": (_detect_outliers, _correct_outliers),
    "jumps": (_detect_jumps, _correct_jumps),
    "global_mad": (_detect_global_mad, _correct_global_mad),
}


def register_step(name: str, detect: Callable, correct: Callable):
    """Add a user step to the registry (idempotent overwrite)."""
    BUILTIN_STEPS[name] = (detect, correct)


def make_step(name: str, detect_kwargs: dict | None = None,
              correct_kwargs: dict | None = None,
              resort_time: bool = False) -> CorrectionStep:
    d, c = BUILTIN_STEPS[name]
    return CorrectionStep(name, d, c, detect_kwargs or {},
                          correct_kwargs or {}, resort_time)


def default_steps(config: dict | None = None) -> list[CorrectionStep]:
    """The reference's Step 1/2/3 list from a merged config
    (processor.py:484-537)."""
    cfg = K.merge_config(config)
    w, thr = cfg["window_size"], cfg["threshold"]
    return [
        make_step("gaps", {"threshold_factor": cfg["gap_threshold_factor"]},
                  {"method": cfg["gap_method"]}, resort_time=True),
        make_step("outliers", {"window_size": w, "threshold": thr},
                  {"window_size": w, "method": cfg["outlier_method"]}),
        make_step("jumps", {"window_size": w, "threshold": thr},
                  {"window_size": w}),
    ]


def run_steps(t: np.ndarray, v: np.ndarray,
              steps: list[CorrectionStep]) -> tuple[np.ndarray, np.ndarray]:
    """Execute an ordered step list on one sorted series: detect → (if any
    hits) correct → optional re-sort (the _process_discontinuity driver)."""
    for step in steps:
        idx = step.detect(t, v, **step.detect_kwargs)
        if len(idx) == 0:
            continue
        t, v = step.correct(t, v, idx, **step.correct_kwargs)
        if step.resort_time:
            order = np.argsort(t, kind="stable")
            t, v = t[order], v[order]
    return t, v
