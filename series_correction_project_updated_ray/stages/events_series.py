"""Per-series detection/correction stages over the events stream table.

Each user_id is an independent series (the reference's file ≡ partition,
sensor ≡ series mapping — SURVEY.md §1.2).  One groupby shuffle co-locates a
whole series; the numpy kernels then run order-dependent detection exactly
as the reference does per file.

Where an operator is SQL-expressible its output shape is designed to match
a DuckDB oracle (rounding documented per function).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import kernels as K
from .rollup import _epoch_seconds
from ..functions.rounding import round_half_away


def _series_sorted(g: pd.DataFrame, ts_col="ts", value_col="value",
                   id_col="event_id"):
    """Deterministic in-group order: (ts, event_id) — the tie-safe analog of
    the reference's time sort."""
    g = g.sort_values([ts_col, id_col], kind="stable")
    ts = g[ts_col]
    if pd.api.types.is_datetime64_any_dtype(ts):
        t = ts.astype("datetime64[ns]").astype("int64").to_numpy() // 1_000_000_000
    else:
        t = ts.to_numpy(np.int64)
    return g, t, g[value_col].to_numpy(np.float64)


def gap_counts_group(g: pd.DataFrame, threshold_factor=3.0,
                     key_col="user_id") -> pd.DataFrame:
    """(user_id, n_gaps): diffs > factor * median(diff) — reference
    detect_gaps semantics on epoch-second times."""
    g, t, _ = _series_sorted(g)
    gaps = K.detect_gaps(t, threshold_factor)
    return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                         "n_gaps": np.array([len(gaps)], np.int64)})


def global_mad_group(g: pd.DataFrame, threshold=3.0,
                     key_col="user_id") -> pd.DataFrame:
    """(user_id, n_outliers, global_median): updated_processor rule
    (0.6745 scale, MAD floor 1e-4)."""
    g, _, v = _series_sorted(g)
    _, mask = K.global_mad_outliers(v, threshold)
    return pd.DataFrame({
        key_col: [g[key_col].iloc[0]],
        "n_outliers": np.array([int(mask.sum())], np.int64),
        "global_median": np.array([round_half_away(float(np.nanmedian(v)), 6)]),
    })


def hampel_flags_group(g: pd.DataFrame, window_size=5, threshold=3.0,
                       key_col="user_id", id_col="event_id") -> pd.DataFrame:
    """Flagged (user_id, event_id) rows under the full Hampel rule
    (processor variant epsilon tiers)."""
    g, _, v = _series_sorted(g)
    idx = K.hampel_outliers(v, window_size, threshold, variant="processor")
    ids = g[id_col].to_numpy()[idx]
    return pd.DataFrame({key_col: np.full(len(ids), g[key_col].iloc[0]),
                         id_col: ids})


def cusum_flags_group(g: pd.DataFrame, window_size=5, threshold=3.0,
                      key_col="user_id", id_col="event_id") -> pd.DataFrame:
    """Flagged jump rows (sequential CUSUM — not SQL-expressible)."""
    g, _, v = _series_sorted(g)
    idx = K.cusum_jumps(v, window_size, threshold)
    ids = g[id_col].to_numpy()[idx]
    return pd.DataFrame({key_col: np.full(len(ids), g[key_col].iloc[0]),
                         id_col: ids})


def cusum_flags_q_group(g: pd.DataFrame, window_size=5, threshold=3.0,
                        key_col="user_id", id_col="event_id") -> pd.DataFrame:
    """Flagged jump rows under the micro-quantized CUSUM — unlike the raw
    float fold this IS SQL-expressible (integer prefix sums + a recursive
    CTE), certifying the D2 reset-scan semantics value-exactly."""
    g, _, v = _series_sorted(g)
    idx = K.cusum_jumps_quantized(v, window_size, threshold)
    ids = g[id_col].to_numpy()[idx]
    return pd.DataFrame({key_col: np.full(len(ids), g[key_col].iloc[0]),
                         id_col: ids})


def jump_corrected_group(g: pd.DataFrame, window_size=5, threshold=3.0,
                         key_col="user_id", id_col="event_id"
                         ) -> pd.DataFrame:
    """Composed D2→C2 on the quantized jump set: detect (quantized CUSUM)
    then offset-correct (median-of-w before/after from ORIGINAL values,
    cumulative, processor.py:376-401).  Emits every row so the oracle
    certifies the full corrected series, not just the jump rows."""
    g, _, v = _series_sorted(g)
    idx = K.cusum_jumps_quantized(v, window_size, threshold)
    v2 = K.correct_jumps(v, idx, window_size)
    return pd.DataFrame({
        key_col: np.full(len(v2), g[key_col].iloc[0]),
        id_col: g[id_col].to_numpy(),
        "value_jumpcorr": round_half_away(v2, 6),
    })


def corrected_series_group(g: pd.DataFrame, config=None,
                           key_col="user_id", id_col="event_id"
                           ) -> pd.DataFrame:
    """Full 3-step corrected series per user; gap-inserted rows get
    event_id = -1.  Returns (user_id, t, value_corrected, inserted)."""
    g, t, v = _series_sorted(g)
    ids = g[id_col].to_numpy(np.int64)
    t2, v2 = K.process_series(t, v, config)
    # map original ids onto surviving timestamps (inserted rows: id -1),
    # vectorized: t is sorted, so searchsorted(side="right")-1 finds the
    # LAST original row at each (int-truncated) timestamp — the same
    # last-wins tie rule the previous dict-based mapping had
    t2i = t2.astype(np.int64)
    pos = np.searchsorted(t, t2i, side="right") - 1
    safe = np.maximum(pos, 0)
    hit = (pos >= 0) & (t[safe] == t2i)
    out_ids = np.where(hit, ids[safe], np.int64(-1))
    return pd.DataFrame({
        key_col: np.full(len(t2), g[key_col].iloc[0]),
        "t": t2.astype(np.int64),
        "value_corrected": round_half_away(v2, 6),
        "inserted": out_ids == -1,
    })


def tail_nonzero_avg_group(g: pd.DataFrame, n=5, key_col="user_id"
                           ) -> pd.DataFrame:
    """(user_id, tail_avg, head_avg): non-zero mean of the last/first n
    values by (ts, event_id) — the level-shift building block (A6)."""
    g, _, v = _series_sorted(g)
    return pd.DataFrame({
        key_col: [g[key_col].iloc[0]],
        "tail_avg": [round_half_away(K.nonzero_mean(v[-n:]), 6)],
        "head_avg": [round_half_away(K.nonzero_mean(v[:n]), 6)],
    })


def level_shift_group(g: pd.DataFrame, segment_col="day", n=5,
                      key_col="user_id") -> pd.DataFrame:
    """Year-boundary level-shift fold mapped to (user, day) segments:
    each day's values aligned to the corrected previous day's tail
    (cumulative, apply_refined_corrections semantics).  Emits the per-
    boundary shift log: (user_id, segment, shift)."""
    g, t, v = _series_sorted(g)
    days = (t // 86400).astype(np.int64)
    uniq = np.unique(days)
    segments = [v[days == d] for d in uniq]
    _, shifts = K.level_shift_fold(segments, min_rows=n)
    return pd.DataFrame({
        key_col: np.full(len(uniq), g[key_col].iloc[0]),
        "segment": uniq,
        "shift": round_half_away(np.asarray(shifts, np.float64), 6),
    })


def gap_fill_group(g: pd.DataFrame, key_col="user_id") -> pd.DataFrame:
    """Gap step in ISOLATION (detect_gaps → insert → positional linear
    interpolation, reference C1 without the jump/outlier passes) so the
    insertion arithmetic — banker's-rounded missing count, linspace
    truncation, exact endpoint, positional interp — is SQL-checkable.
    Returns (user_id, t, value_filled, inserted)."""
    g, t, v = _series_sorted(g)
    gaps = K.detect_gaps(t)
    new_times = K.gap_fill_times(t, gaps)
    t_all = np.concatenate([t, new_times])
    flag = np.concatenate([np.zeros(len(t), dtype=bool),
                           np.ones(len(new_times), dtype=bool)])
    v_all = np.concatenate([v, np.full(len(new_times), np.nan)])
    order = np.argsort(t_all, kind="stable")
    t_all, v_all, flag = t_all[order], v_all[order], flag[order]
    v_out = K.interp_positional(v_all, "linear")
    return pd.DataFrame({
        key_col: np.full(len(t_all), g[key_col].iloc[0]),
        "t": t_all.astype(np.int64),
        "value_filled": round_half_away(v_out, 6),
        "inserted": flag,
    })


def _grouped(events, fn, n_parts: int = 64, **kwargs):
    """Run a per-series kernel over every series of a partition group.

    The shuffle groups by ``stable_hash(user) % n_parts`` instead of by
    user: the kernels stay sequential per series (order-dependent folds —
    that's their semantics), but Ray's per-group machinery (a block
    slice, pandas conversion and task result PER KEY — billions of keys
    at scale) collapses to one call per partition with cheap in-process
    slicing."""
    from ..functions.hashing import stable_hash_array

    def _part(t: pa.Table) -> pa.Table:
        part = (stable_hash_array(t["user_id"])
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__part", pa.array(part))

    def wrapped(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        codes, _ = pd.factorize(g["user_id"], sort=False)
        order = np.argsort(codes, kind="stable")
        g = g.iloc[order]
        codes = codes[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        return pd.concat(
            [fn(g.iloc[s:e], **kwargs) for s, e in zip(starts, ends)],
            ignore_index=True)
    wrapped.__name__ = getattr(fn, "__name__", "per_series_kernel")

    return events.map_batches(_part, batch_format="pyarrow") \
        .groupby("__part").map_groups(wrapped, batch_format="pandas")


def gap_counts(events, threshold_factor=3.0):
    return _grouped(events, gap_counts_group, threshold_factor=threshold_factor)


def global_mad_outlier_counts(events, threshold=3.0):
    return _grouped(events, global_mad_group, threshold=threshold)


def hampel_flags(events, window_size=5, threshold=3.0):
    return _grouped(events, hampel_flags_group, window_size=window_size,
                    threshold=threshold)


def cusum_flags(events, window_size=5, threshold=3.0):
    return _grouped(events, cusum_flags_group, window_size=window_size,
                    threshold=threshold)


def cusum_flags_quantized(events, window_size=5, threshold=3.0):
    return _grouped(events, cusum_flags_q_group, window_size=window_size,
                    threshold=threshold)


def jump_corrected_series(events, window_size=5, threshold=3.0):
    return _grouped(events, jump_corrected_group, window_size=window_size,
                    threshold=threshold)


def gap_filled_series(events):
    return _grouped(events, gap_fill_group)


def corrected_series(events, config=None):
    return _grouped(events, corrected_series_group, config=config)


def tail_nonzero_avgs(events, n=5):
    return _grouped(events, tail_nonzero_avg_group, n=n)


def level_shifts(events, n=5):
    return _grouped(events, level_shift_group, n=n)


def corrected_nojump_group(g: pd.DataFrame, key_col="user_id"
                           ) -> pd.DataFrame:
    """Two-step composed correction, fully SQL-checkable: gap insertion +
    positional interpolation (C1), then Hampel detection with masked
    rolling-median replacement (D3+C3) on the QUANTIZED filled series —
    the 6dp rounding between steps makes both engines see identical
    doubles at the Hampel input, so the composition (not just each step
    in isolation) is oracle-exact.  The CUSUM jump step is excluded: its
    sequential reset cascade is the one reference kernel that is not
    SQL-expressible.  Returns (user_id, t, value_corrected, inserted)."""
    g, t, v = _series_sorted(g)
    gaps = K.detect_gaps(t)
    new_times = K.gap_fill_times(t, gaps)
    t_all = np.concatenate([t, new_times])
    flag = np.concatenate([np.zeros(len(t), dtype=bool),
                           np.ones(len(new_times), dtype=bool)])
    v_all = np.concatenate([v, np.full(len(new_times), np.nan)])
    order = np.argsort(t_all, kind="stable")
    t_all, v_all, flag = t_all[order], v_all[order], flag[order]
    v_filled = round_half_away(K.interp_positional(v_all, "linear"), 6)
    idx = K.hampel_outliers(v_filled, 5, 3.0, variant="processor")
    v_out = K.correct_outliers(v_filled, idx, 5, "median") \
        if len(idx) else v_filled
    return pd.DataFrame({
        key_col: np.full(len(t_all), g[key_col].iloc[0]),
        "t": t_all.astype(np.int64),
        "value_corrected": round_half_away(v_out, 6),
        "inserted": flag,
    })


def corrected_series_nojump(events):
    return _grouped(events, corrected_nojump_group)


def corrected_full_group(g: pd.DataFrame, key_col="user_id"
                         ) -> pd.DataFrame:
    """The COMPLETE 3-step composed correction, fully SQL-checkable:
    gap insertion + positional interpolation (C1), Hampel with masked
    rolling-median replacement (D3+C3), then the QUANTIZED CUSUM jump
    cascade + cumulative median-offset correction (D2+C2).  6dp rounding
    between steps and int64-micro deviations make every stage's input
    identical on both engines, so the full composition — all five
    reference correction operators chained — is oracle-exact.
    Returns (user_id, t, value_corrected, inserted)."""
    g, t, v = _series_sorted(g)
    gaps = K.detect_gaps(t)
    new_times = K.gap_fill_times(t, gaps)
    t_all = np.concatenate([t, new_times])
    flag = np.concatenate([np.zeros(len(t), dtype=bool),
                           np.ones(len(new_times), dtype=bool)])
    v_all = np.concatenate([v, np.full(len(new_times), np.nan)])
    order = np.argsort(t_all, kind="stable")
    t_all, v_all, flag = t_all[order], v_all[order], flag[order]
    v_filled = round_half_away(K.interp_positional(v_all, "linear"), 6)
    idx = K.hampel_outliers(v_filled, 5, 3.0, variant="processor")
    v_out = K.correct_outliers(v_filled, idx, 5, "median") \
        if len(idx) else v_filled
    v2 = round_half_away(v_out, 6)
    jumps = K.cusum_jumps_quantized(v2, 5, 3.0)
    v3 = K.correct_jumps(v2, jumps, 5) if len(jumps) else v2
    return pd.DataFrame({
        key_col: np.full(len(t_all), g[key_col].iloc[0]),
        "t": t_all.astype(np.int64),
        "value_corrected": round_half_away(v3, 6),
        "inserted": flag,
    })


def corrected_series_full(events):
    return _grouped(events, corrected_full_group)
