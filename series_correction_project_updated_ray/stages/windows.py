"""Streaming-window operators beyond tumbling rollups.

The reference is pure batch (SURVEY.md §2.11); these are the rebuild's
stream-shaped operators, implemented as per-key kernels over event-time-
sorted groups (the Ray Data streaming pattern: partition by key, sort
within group, window with numpy — no watermark machinery needed on batch
data).  All three are exactly SQL-expressible, so they are oracle-checked:

* session windows (gap timeout) → per-session aggregates;
* sliding event-time window (RANGE frame) → per-point trailing mean;
* as-of join (latest prior right-side row per left row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .rollup import _epoch_seconds
from ..functions.rounding import round_half_away, scaled_int


def _epoch_micros(ts_col) -> "np.ndarray":
    """Column → int64 epoch MICROseconds (the engine-wide tie
    convention): datetime columns via ns normalization, numeric columns
    are epoch seconds."""
    ts = ts_col.to_pandas()
    if pd.api.types.is_datetime64_any_dtype(ts):
        return ts.astype("datetime64[ns]").astype("int64").to_numpy() // 1000
    return ts.to_numpy(np.int64) * 1_000_000


def _epoch_seconds(ts: pd.Series) -> np.ndarray:
    """Seconds-resolution epoch ints — the session-gap time base."""
    if pd.api.types.is_datetime64_any_dtype(ts):
        return (ts.astype("datetime64[ns]").astype("int64").to_numpy()
                // 1_000_000_000)
    return ts.to_numpy(np.int64)


def _session_boundaries(codes: np.ndarray, t: np.ndarray,
                        timeout_s: int) -> np.ndarray:
    """Boundary mask of the (codes, t)-sorted stream: True where a new
    key starts or the inter-event gap exceeds ``timeout_s`` — THE
    session rule, shared by every sessionizing kernel so the semantics
    can never drift apart."""
    n = len(t)
    boundary = np.ones(n, dtype=bool)
    if n > 1:
        boundary[1:] = (codes[1:] != codes[:-1]) \
            | (np.diff(t) > timeout_s)
    return boundary


def _sorted_group(g: pd.DataFrame, ts_col="ts", id_col="event_id"):
    g = g.sort_values([ts_col, id_col], kind="stable").reset_index(drop=True)
    ts = g[ts_col]
    if pd.api.types.is_datetime64_any_dtype(ts):
        t = ts.astype("datetime64[ns]").astype("int64").to_numpy() // 1_000_000_000
    else:
        t = ts.to_numpy(np.int64)
    return g, t


class SessionWindows:
    """Per-PARTITION kernel: sessions split where the inter-event gap
    exceeds ``timeout_s``; emits (key, session_id [1-based per key],
    n_events, t_start, t_end).  All keys co-located in one partition
    group are sessionized by one lexsort + boundary scan — no per-key
    Python calls (a key per call is billions of calls at web scale)."""

    def __init__(self, timeout_s: int = 1800, key_col="user_id",
                 ts_col="ts", id_col="event_id"):
        self.timeout_s, self.key_col = timeout_s, key_col
        self.ts_col, self.id_col = ts_col, id_col
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[self.key_col], sort=False)
        t = _epoch_seconds(g[self.ts_col])
        order = np.lexsort((g[self.id_col].to_numpy(), t, codes))
        codes, t = codes[order], t[order]
        keys = g[self.key_col].to_numpy()[order]
        n = len(t)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = codes[1:] != codes[:-1]
        boundary = _session_boundaries(codes, t, self.timeout_s)
        starts = np.flatnonzero(boundary)
        ends = np.r_[starts[1:], n]
        # 1-based session index WITHIN each key: session ordinal minus the
        # ordinal of the key's first session
        first_of_key = np.flatnonzero(new_key[starts])
        runs = np.diff(np.r_[first_of_key, len(starts)])
        sid = (np.arange(len(starts), dtype=np.int64)
               - np.repeat(first_of_key, runs) + 1)
        return pd.DataFrame({
            # key values from the sorted original column: factorize codes
            # null keys -1 and uniques.take(-1) would wrap to the last
            # real key, mislabeling the null group's sessions
            self.key_col: keys[starts],
            "session_id": sid,
            "n_events": (ends - starts).astype(np.int64),
            "t_start": t[starts],
            "t_end": t[ends - 1],
        })


class SlidingMean:
    """Per-PARTITION kernel: trailing event-time window mean — for each
    point, the mean of same-key values with t in [t_i - width, t_i]
    (inclusive RANGE frame).  One lexsort per partition; window bounds
    via two searchsorted calls per co-located key (tiny slices — the
    per-key Ray group overhead this replaces is orders of magnitude
    bigger), prefix-sum mean evaluated vectorized over the whole
    partition."""

    def __init__(self, width_s: int = 300, key_col="user_id", ts_col="ts",
                 id_col="event_id", value_col="value", round_to=6):
        self.width_s, self.key_col = width_s, key_col
        self.ts_col, self.id_col, self.value_col = ts_col, id_col, value_col
        self.round_to = round_to
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[self.key_col], sort=False)
        # microsecond resolution so RANGE-frame tie semantics can't differ
        # from the SQL oracle (second-floored times could alias two events)
        ts = g[self.ts_col]
        if pd.api.types.is_datetime64_any_dtype(ts):
            t = ts.astype("datetime64[ns]").astype("int64").to_numpy() // 1000
        else:
            t = ts.to_numpy(np.int64) * 1_000_000
        ids = g[self.id_col].to_numpy()
        order = np.lexsort((ids, t, codes))
        codes, t = codes[order], t[order]
        g = g.iloc[order]
        v = g[self.value_col].to_numpy(np.float64)
        n = len(t)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) \
            if n else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], n]
        means = np.empty(n, dtype=np.float64)
        w = self.width_s * 1_000_000
        for s, e in zip(starts, ends):
            seg = t[s:e]
            # SEGMENT-local prefix sums: bit-identical float arithmetic
            # to the per-group kernel this replaces (a partition-global
            # cumsum would drift by accumulated ulps near round
            # boundaries)
            csum = np.r_[0.0, np.cumsum(v[s:e])]
            lo = np.searchsorted(seg, seg - w, side="left")
            # RANGE frames include ALL peer rows with the same ordering
            # value: the upper bound is the last tie, not the current row
            hi = np.searchsorted(seg, seg, side="right")
            means[s:e] = (csum[hi] - csum[lo]) / (hi - lo)
        return pd.DataFrame({
            self.key_col: g[self.key_col].to_numpy(),
            self.id_col: g[self.id_col].to_numpy(),
            "sliding_mean": round_half_away(means, self.round_to),
        })


class AsofJoinGroup:
    """Per-PARTITION cogroup kernel: each left row matched to the LATEST
    right row with right.t <= left.t of the same key; unmatched left rows
    keep nulls — pandas.merge_asof semantics ≡ SQL ASOF LEFT JOIN.  One
    lexsort per partition; one searchsorted per co-located key."""

    def __init__(self, key_col="user_id", ts_col="t", id_col="event_id",
                 right_value="value", out_name="last_purchase_value",
                 round_to=6):
        self.key_col, self.ts_col, self.id_col = key_col, ts_col, id_col
        self.right_value, self.out_name = right_value, out_name
        self.round_to = round_to
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[self.key_col], sort=False)
        t = g[self.ts_col].to_numpy(np.int64)
        ids = g[self.id_col].to_numpy()
        order = np.lexsort((ids, t, codes))
        codes, t, ids = codes[order], t[order], ids[order]
        is_l = (g["__side"].to_numpy() == "l")[order]
        rv_all = g[self.right_value].to_numpy(np.float64)[order]
        keys = g[self.key_col].to_numpy()[order]
        n = len(t)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) \
            if n else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], n]
        out_k, out_i, out_v = [], [], []
        for s, e in zip(starts, ends):
            m = is_l[s:e]
            lt = t[s:e][m]
            rt = t[s:e][~m]
            if len(rt) == 0:
                matched = np.full(len(lt), np.nan)
            else:
                rv = rv_all[s:e][~m]
                pos = np.searchsorted(rt, lt, side="right") - 1
                matched = np.where(pos >= 0, rv[np.clip(pos, 0, None)],
                                   np.nan)
            out_k.append(keys[s:e][m])
            out_i.append(ids[s:e][m])
            out_v.append(matched)
        if not out_k:
            return pd.DataFrame({self.key_col: [], self.id_col: [],
                                 self.out_name: []})
        return pd.DataFrame({
            self.key_col: np.concatenate(out_k),
            self.id_col: np.concatenate(out_i),
            self.out_name: round_half_away(np.concatenate(out_v),
                                           self.round_to),
        })


def _add_key_partition(ds, key_col: str, n_parts: int = 64):
    """Append ``__part = stable_hash(key) % n_parts`` — the partition-
    group shuffle key that co-locates whole keys while keeping the group
    count fixed (n_parts) instead of |keys|."""
    from ..functions.hashing import stable_hash_array

    def _part(t: pa.Table) -> pa.Table:
        part = (stable_hash_array(t[key_col])
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__part", pa.array(part))
    return ds.map_batches(_part, batch_format="pyarrow")


def session_windows(events, timeout_s=1800, n_parts: int = 64):
    return _add_key_partition(events, "user_id", n_parts) \
        .groupby("__part").map_groups(
            SessionWindows(timeout_s), batch_format="pandas")


def sliding_mean(events, width_s=300, n_parts: int = 64):
    return _add_key_partition(events, "user_id", n_parts) \
        .groupby("__part").map_groups(
            SlidingMean(width_s), batch_format="pandas")


def asof_join_events(events, right_type="purchase"):
    """Each event matched to the user's latest prior-or-equal event of
    ``right_type`` — one co-grouped shuffle (union + groupby)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _prep(batch: pa.Table, side: str) -> pa.Table:
        # microseconds — exact tie semantics vs the epoch_us SQL oracle;
        # numeric ts columns are epoch SECONDS (same dtype branch as every
        # sibling operator), not nanoseconds
        t = _epoch_micros(batch["ts"])
        out = pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "t": pa.array(t),
            "value": batch["value"],
            "__side": pa.array([side] * len(batch), pa.string()),
        })
        if side == "r":
            out = out.filter(pc.equal(batch["event_type"], right_type))
        return out

    left = events.map_batches(lambda b: _prep(b, "l"), batch_format="pyarrow")
    right = events.map_batches(lambda b: _prep(b, "r"), batch_format="pyarrow")
    both = _add_key_partition(left.union(right), "user_id")
    return both.groupby("__part").map_groups(
        AsofJoinGroup(), batch_format="pandas")


class _TopNPerGroup:
    """Per-PARTITION kernel: ROW_NUMBER() OVER (PARTITION BY …) <= n for
    every group co-located in the partition — one pandas stable sort +
    cython cumcount, no per-group Python calls."""

    def __init__(self, group_col, sort_cols, descending, n):
        self.group_col, self.sort_cols = group_col, sort_cols
        self.descending, self.n = descending, n
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(
            [self.group_col] + list(self.sort_cols),
            ascending=[True] + [not d for d in self.descending],
            kind="stable")
        # dropna=False: null group keys rank as their own group instead
        # of producing NaN ranks that astype(int64) would throw on
        rn = out.groupby(self.group_col, sort=False,
                         dropna=False).cumcount() + 1
        out = out.assign(rn=rn.astype(np.int64))
        out = out[out["rn"] <= self.n]
        return out.drop(columns=["__part"], errors="ignore")


def topn_per_group(ds, group_col: str, sort_cols: list[str],
                   descending: list[bool], n: int, n_parts: int = 64):
    """Top-n rows per group with a rank column (deterministic only if
    ``sort_cols`` is a total order within a group — pass a unique
    tiebreak column).  One shuffle (the partition groupby); ranking is
    one vectorized sort + cumcount per partition."""
    return _add_key_partition(ds, group_col, n_parts) \
        .groupby("__part").map_groups(
            _TopNPerGroup(group_col, sort_cols, descending, n),
            batch_format="pandas")


class RangeJoinAggGroup:
    """map_groups kernel for one user: every left row aggregated over the
    right rows whose timestamp falls in [t_left - window, t_left]
    (inclusive — microsecond semantics, matching the SQL BETWEEN oracle).

    Vectorized: rights sorted once, two searchsorted calls give each left
    row's window bounds, a cents-scaled prefix sum makes the per-window
    value sums exact integer arithmetic (no float accumulation drift, so
    the LEFT JOIN oracle matches at atol=0).
    """

    def __init__(self, window_us: int):
        self.window_us = window_us
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=False)
        t = g["t"].to_numpy(np.int64)
        order = np.lexsort((t, codes))
        codes, t = codes[order], t[order]
        is_l = (g["__side"].to_numpy() == "l")[order]
        g = g.iloc[order]
        v100_all = scaled_int(g["value"].to_numpy(np.float64))
        keys = g["user_id"].to_numpy()
        ids = g["event_id"].to_numpy()
        n = len(t)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) \
            if n else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], n]
        frames = []
        for s, e in zip(starts, ends):
            m = is_l[s:e]
            tl = t[s:e][m]
            tr = t[s:e][~m]
            v100 = v100_all[s:e][~m]
            csum = np.concatenate([[0], np.cumsum(v100)])
            lo = np.searchsorted(tr, tl - self.window_us, side="left")
            hi = np.searchsorted(tr, tl, side="right")
            frames.append(pd.DataFrame({
                "user_id": keys[s:e][m],
                "event_id": ids[s:e][m],
                "t": tl,
                "n_in_range": (hi - lo).astype(np.int64),
                "vsum": (csum[hi] - csum[lo]) / 100.0,
            }))
        if not frames:
            return pd.DataFrame({
                "user_id": [], "event_id": [],
                "t": pd.Series([], dtype=np.int64),
                "n_in_range": pd.Series([], dtype=np.int64),
                "vsum": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)


def range_join_agg(events, *, left_type="purchase", right_type="click",
                   window_s: int = 3600):
    """Interval/range join as aggregation: for every ``left_type`` event,
    count + exact value-sum of the same user's ``right_type`` events in the
    trailing ``window_s`` window.  One co-grouped shuffle (tagged union +
    groupby on the user key) — the same partitioning-key-reuse pattern as
    the as-of join; no all-pairs blowup because the join collapses to a
    per-left aggregate inside the group kernel."""
    import pyarrow.compute as pc

    def _prep(batch: pa.Table, side: str, typ: str) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        out = pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "t": pa.array(t),
            "value": batch["value"],
            "__side": pa.array([side] * len(batch), pa.string()),
        })
        return out.filter(pc.equal(batch["event_type"], typ))

    left = events.map_batches(lambda b: _prep(b, "l", left_type),
                              batch_format="pyarrow")
    right = events.map_batches(lambda b: _prep(b, "r", right_type),
                               batch_format="pyarrow")
    return _add_key_partition(left.union(right), "user_id") \
        .groupby("__part").map_groups(
            RangeJoinAggGroup(window_s * 1_000_000), batch_format="pandas")


class FunnelGroup:
    """map_groups kernel for one user: first ``first_type`` event, then the
    first ``then_type`` event at-or-after it — the 2-step funnel /
    sequence-match shape (MATCH_RECOGNIZE's simplest pattern).  Emits one
    row per converting user with the conversion latency."""

    def __init__(self, first_type: str, then_type: str):
        self.first_type, self.then_type = first_type, then_type
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes = codes[order]
        keys = g["user_id"].to_numpy()[order]
        ts = g["t"].to_numpy(np.int64)[order]
        typ = g["event_type"].to_numpy()[order]
        if len(codes) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=g["user_id"].dtype),
                "t_first": pd.Series([], dtype=np.int64),
                "t_then": pd.Series([], dtype=np.int64),
                "latency_s": pd.Series([], dtype=np.int64)})
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(codes)])
        BIG = np.iinfo(np.int64).max
        # per-key min A timestamp, then min B timestamp at-or-after it —
        # two masked reduceat min-scans, no per-key Python
        t0 = np.minimum.reduceat(
            np.where(typ == self.first_type, ts, BIG), starts)
        t1 = np.minimum.reduceat(
            np.where((typ == self.then_type)
                     & (ts >= np.repeat(t0, lens)), ts, BIG), starts)
        conv = (t0 < BIG) & (t1 < BIG)
        return pd.DataFrame({
            # sorted-original key values — not uniques.take, which wraps
            # factorize's -1 null code onto the last real key
            "user_id": keys[starts][conv],
            "t_first": t0[conv],
            "t_then": t1[conv],
            "latency_s": (t1[conv] - t0[conv]) // 1_000_000,
        })


def funnel(events, *, first_type="click", then_type="purchase",
           n_parts: int = 64):
    """Per-user 2-step funnel conversion (first→then) — one
    partition-group shuffle; the kernel funnels every co-located user in
    two masked reduceat min-scans.  Timestamps compare in microseconds
    (the engine-wide tie convention)."""

    def _prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = _epoch_micros(batch["ts"])
        out = pa.table({"user_id": batch["user_id"],
                        "event_type": batch["event_type"],
                        "t": pa.array(t)})
        keep = pc.is_in(out["event_type"],
                        value_set=pa.array([first_type, then_type]))
        return out.filter(keep)

    return _add_key_partition(
        events.map_batches(_prep, batch_format="pyarrow"),
        "user_id", n_parts) \
        .groupby("__part").map_groups(
        FunnelGroup(first_type, then_type), batch_format="pandas")


class RunningSumGroup:
    """Per-PARTITION kernel: cumulative sum/count over each key's
    event-time order — the SUM(...) OVER (PARTITION BY key ORDER BY ts,
    id ROWS UNBOUNDED PRECEDING) window shape, segmented-vectorized for
    every key in the partition group (global int64 cents cumsum minus
    per-segment base; exact, so the oracle matches at atol=0)."""

    def __init__(self):
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=False)
        t = g["t"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy()
        order = np.lexsort((ids, t, codes))
        codes = codes[order]
        g = g.iloc[order]
        v100 = scaled_int(g["value"].to_numpy(np.float64))
        # segmented prefix sums via one global cumsum; the guard keeps the
        # GLOBAL magnitude inside int64 (per-key prefixes alone don't
        # bound it once many keys share a partition)
        if float(np.abs(v100).sum(dtype=np.float64)) > 2**62:
            raise OverflowError(
                "running_sum: partition cents magnitude exceeds int64 — "
                "raise n_parts so fewer keys share a partition")
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) \
            if len(codes) else np.array([], dtype=np.int64)
        lens = np.diff(np.r_[starts, len(codes)])
        cs = np.cumsum(v100)
        base = cs[starts] - v100[starts]
        running = cs - np.repeat(base, lens)
        counts = (np.arange(len(codes), dtype=np.int64)
                  - np.repeat(starts, lens) + 1)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "t": g["t"].to_numpy(np.int64),
            "running_sum": running / 100.0,
            "running_count": counts,
        })


def running_sum(events, n_parts: int = 64):
    """Per-user cumulative value sum in event-time order — one
    partition-group shuffle, segmented cumsum across all co-located
    users."""

    def _prep(batch: pa.Table) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        return pa.table({"user_id": batch["user_id"],
                         "event_id": batch["event_id"],
                         "t": pa.array(t),
                         "value": batch["value"]})

    prepped = events.map_batches(_prep, batch_format="pyarrow")
    return _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(RunningSumGroup(),
                                      batch_format="pandas")


class LagDeltaGroup:
    """Per-partition kernel: SQL LAG diffs over each key's event-time
    order — ``dv`` = value - lag(value) (cents-exact arithmetic, one
    float division on output) and ``dt_us`` = t - lag(t); the first row
    of every key emits NULL for both, matching LAG's default."""

    def __init__(self):
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=False)
        t = g["t"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy()
        order = np.lexsort((ids, t, codes))
        codes, t = codes[order], t[order]
        g = g.iloc[order]
        v100 = scaled_int(g["value"].to_numpy(np.float64))
        n = len(codes)
        first = np.r_[True, codes[1:] != codes[:-1]] if n \
            else np.array([], dtype=bool)
        dv = np.full(n, np.nan)
        dt = np.full(n, np.nan)
        if n > 1:
            dv[1:] = (v100[1:] - v100[:-1]) / 100.0
            dt[1:] = (t[1:] - t[:-1]).astype(np.float64)
        dv[first] = np.nan
        dt[first] = np.nan
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "t": t,
            "dv": dv,
            "dt_us": dt,
        })


def lag_deltas(events, n_parts: int = 64):
    """Per-user consecutive-event deltas (the LAG window-function shape):
    value and time diffs in (ts, event_id) order — one partition-group
    shuffle, segmented vectorized diffs for all co-located keys."""

    def _prep(batch: pa.Table) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        return pa.table({"user_id": batch["user_id"],
                         "event_id": batch["event_id"],
                         "t": pa.array(t),
                         "value": batch["value"]})

    prepped = events.map_batches(_prep, batch_format="pyarrow")
    return _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(LagDeltaGroup(),
                                      batch_format="pandas")


class EventSequenceGroup:
    """Per-partition kernel: each user's event-type sequence joined in
    (ts, event_id) order — the string_agg / collect_list shape that
    builds behavioral sequences for sequence-model training."""

    def __init__(self, sep: str = "->"):
        self.sep = sep
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g["user_id"], sort=False)
        t = g["t"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy()
        order = np.lexsort((ids, t, codes))
        codes = codes[order]
        types = g["event_type"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) \
            if len(codes) else np.array([], dtype=np.int64)
        ends = np.r_[starts[1:], len(codes)]
        # string_agg semantics: NULL event_types are skipped inside the
        # join (an all-NULL group emits NULL seq) while COUNT(*) keeps
        # every row; key values come from the SORTED ORIGINAL column so a
        # NULL user_id stays its own group (factorize codes it -1, which
        # would otherwise wrap onto the LAST real user's slot)
        keys = g["user_id"].to_numpy()[order]
        seqs = []
        for s, e in zip(starts, ends):
            ts_ = [x for x in types[s:e] if x is not None
                   and not (isinstance(x, float) and np.isnan(x))]
            seqs.append(self.sep.join(ts_) if ts_ else None)
        return pd.DataFrame({
            "user_id": keys[starts] if len(starts) else keys[:0],
            "seq": seqs,
            "n_events": (ends - starts).astype(np.int64),
        })


def user_event_sequences(events, *, sep: str = "->", n_parts: int = 64):
    """Per-user ordered event-type sequences (string_agg ORDER BY shape)
    — one partition-group shuffle; only (user, type, ts, id) rows move,
    and each key's sequence is assembled exactly once."""

    def _prep(batch: pa.Table) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        return pa.table({"user_id": batch["user_id"],
                         "event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "t": pa.array(t)})

    prepped = events.map_batches(_prep, batch_format="pyarrow")
    return _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(EventSequenceGroup(sep),
                                      batch_format="pandas")


class TimeWeightedAvgGroup:
    """Per-partition kernel: trapezoidal time-weighted average of every
    (key, window) cell — Σ dt·(c_i + c_{i+1}) over consecutive points in
    (t, id) order, divided by 2·span.  Integer-exact numerator (cents ×
    micros in int64, overflow-guarded), one float division sequence on
    output identical to the oracle.  Cells with <2 points or zero span
    emit NULL (undefined integral)."""

    def __init__(self, width_s: int):
        self.width_us = width_s * 1_000_000
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        from .rollup import _segment_starts
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": g["user_id"],
                "window_start": pd.Series([], dtype=np.int64),
                "twa": pd.Series([], dtype=np.float64),
                "n": pd.Series([], dtype=np.int64)})
        ucodes, _ = pd.factorize(g["user_id"], sort=False)
        t = g["t"].to_numpy(np.int64)
        w = t // self.width_us * self.width_us
        ids = g["event_id"].to_numpy()
        order = np.lexsort((ids, t, w, ucodes))
        ucodes, t, w = ucodes[order], t[order], w[order]
        g = g.iloc[order]
        c = scaled_int(g["value"].to_numpy(np.float64))
        n = len(t)
        starts, ends = _segment_starts(ucodes, w)
        if n > 1:
            dt = t[1:] - t[:-1]
            cs = c[1:] + c[:-1]
            # the pair that BRIDGES two cells never contributes (and its
            # epoch-scale dt would both wrap the int64 product and trip
            # the guard) — mask it BEFORE guarding and multiplying
            bridge = np.zeros(n - 1, dtype=bool)
            bridge[starts[1:] - 1] = True
            fdt = np.where(bridge, 0.0, dt.astype(np.float64))
            fcs = np.abs(cs).astype(np.float64)
            if float((fdt * fcs).sum()) > 2**62:
                raise OverflowError(
                    "time_weighted_avg: trapezoid numerator approaching "
                    "int64 — use narrower windows or limb accumulation")
            term = np.where(bridge, np.int64(0), dt) * cs
            tsum = np.concatenate([[0], np.cumsum(term)])
            segsum = tsum[ends - 1] - tsum[starts]
        else:
            segsum = np.zeros(len(starts), dtype=np.int64)
        span = t[ends - 1] - t[starts]
        cnt = (ends - starts).astype(np.int64)
        ok = (cnt >= 2) & (span > 0)
        twa = np.full(len(starts), np.nan)
        with np.errstate(invalid="ignore"):
            twa[ok] = segsum[ok].astype(np.float64) \
                / span[ok].astype(np.float64) / 200.0
        from ..functions.rounding import round_half_away
        twr = round_half_away(twa, 6)
        out = pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[starts],
            "window_start": (w[starts] // 1_000_000),
            "twa": np.where(ok, twr, np.nan),
            "n": cnt,
        })
        return out


def time_weighted_avg(events, *, width_s: int = 3600, n_parts: int = 64):
    """Trapezoidal time-weighted average per (user, window) — the
    irregular-sampling analogue of the plain window mean.  One
    partition-group shuffle of (user, t, id, cents) rows; every cell's
    integral is computed segment-vectorized."""

    def _prep(batch: pa.Table) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        return pa.table({"user_id": batch["user_id"],
                         "event_id": batch["event_id"],
                         "t": pa.array(t),
                         "value": batch["value"]})

    prepped = events.map_batches(_prep, batch_format="pyarrow")
    return _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(TimeWeightedAvgGroup(width_s),
                                      batch_format="pandas")


class TrendGroup:
    """Per-partition kernel: least-squares slope/intercept of value vs
    time for every (key, window) cell.  All five sums (n, Σt, Σv, Σtv,
    Σt²) are exact int64 — t is SECONDS relative to the window start
    (≤ width, so t² stays tiny) and v is cents — and the closed-form
    division runs the identical float op order as the oracle.  Cells
    with <2 points or zero time variance emit NULL."""

    def __init__(self, width_s: int):
        self.width_s = width_s
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        ucodes, _ = pd.factorize(g["user_id"], sort=False)
        ts = g["t"].to_numpy(np.int64) // 1_000_000  # epoch seconds
        w = ts - ts % self.width_s
        order = np.lexsort((ts, w, ucodes))
        ucodes, ts, w = ucodes[order], ts[order], w[order]
        g = g.iloc[order]
        v = scaled_int(g["value"].to_numpy(np.float64))
        t = ts - w  # 0 ≤ t < width
        n = len(t)
        starts = np.flatnonzero(np.r_[True, (ucodes[1:] != ucodes[:-1])
                                      | (w[1:] != w[:-1])]) \
            if n else np.array([], dtype=np.int64)
        cnt = np.diff(np.r_[starts, n]).astype(np.int64)
        st = np.add.reduceat(t, starts) if n else np.empty(0, np.int64)
        sv = np.add.reduceat(v, starts) if n else np.empty(0, np.int64)
        stv = np.add.reduceat(t * v, starts) if n \
            else np.empty(0, np.int64)
        stt = np.add.reduceat(t * t, starts) if n \
            else np.empty(0, np.int64)
        # numerator/denominator in EXACT integer arithmetic (object
        # arrays = arbitrary-precision Python ints): n·Σtv can exceed
        # 2^53, and the oracle computes the HUGEINT product exactly
        # before its single CAST to double
        num_i = (cnt.astype(object) * stv.astype(object)
                 - st.astype(object) * sv.astype(object))
        den_i = (cnt.astype(object) * stt.astype(object)
                 - st.astype(object) * st.astype(object))
        denom = np.array([float(x) for x in den_i], dtype=np.float64)
        numf = np.array([float(x) for x in num_i], dtype=np.float64)
        nf = cnt.astype(np.float64)
        stf, svf = st.astype(np.float64), sv.astype(np.float64)
        ok = (cnt >= 2) & (denom > 0.0)
        slope = np.full(len(starts), np.nan)
        intercept = np.full(len(starts), np.nan)
        with np.errstate(invalid="ignore"):
            slope[ok] = numf[ok] / denom[ok] / 100.0
            intercept[ok] = (svf[ok] / nf[ok] / 100.0
                             - slope[ok] * (stf[ok] / nf[ok]))
        from ..functions.rounding import round_half_away
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[starts],
            "window_start": w[starts],
            "slope": np.where(ok, round_half_away(slope, 6), np.nan),
            "intercept": np.where(ok, round_half_away(intercept, 6),
                                  np.nan),
            "n": cnt,
        })


def window_trend(events, *, width_s: int = 3600, n_parts: int = 64):
    """Per-(user, window) least-squares trend (slope in value/second,
    intercept at the window start) — detection of drifting series, the
    regression analogue of the window mean.  One partition-group
    shuffle; integer-exact sufficient statistics."""

    def _prep(batch: pa.Table) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        return pa.table({"user_id": batch["user_id"],
                         "t": pa.array(t),
                         "value": batch["value"]})

    prepped = events.map_batches(_prep, batch_format="pyarrow")
    return _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(TrendGroup(width_s),
                                      batch_format="pandas")


class InterarrivalGroup:
    """Per-partition kernel: inter-event-time statistics per key — count,
    mean gap, and coefficient of variation (the burstiness signal: CV≈1
    Poisson, >1 bursty, <1 regular).  Gaps are EPOCH-SECOND diffs in the
    (ts, event_id) order, so Σdt telescopes to an exact span and Σdt² is
    an exact (guarded) int64 sum; the float formula runs in oracle op
    order.  Keys with <2 gaps or zero mean emit NULL stats."""

    def __init__(self):
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        from .rollup import _segment_starts
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": g["user_id"],
                "n_events": pd.Series([], dtype=np.int64),
                "mean_dt_s": pd.Series([], dtype=np.float64),
                "cv_dt": pd.Series([], dtype=np.float64)})
        ucodes, _ = pd.factorize(g["user_id"], sort=False)
        t = g["t"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy()
        order = np.lexsort((ids, t, ucodes))
        ucodes, t = ucodes[order], t[order]
        g = g.iloc[order]
        ts = t // 1_000_000  # epoch seconds (flooring preserves order)
        starts, ends = _segment_starts(ucodes)
        cnt = (ends - starts).astype(np.int64)
        n = len(ts)
        if n > 1:
            dt = ts[1:] - ts[:-1]
            bridge = np.zeros(n - 1, dtype=bool)
            bridge[starts[1:] - 1] = True
            dt = np.where(bridge, np.int64(0), dt)
            fdt = dt.astype(np.float64)
            if float((fdt * fdt).sum()) > 2**62:
                raise OverflowError(
                    "interarrival_stats: Σdt² approaching int64 — "
                    "accumulate in (hi, lo) limbs")
            c2 = np.concatenate([[0], np.cumsum(dt * dt)])
            sq = (c2[ends - 1] - c2[starts]).astype(np.float64)
        else:
            sq = np.zeros(len(starts))
        span = (ts[ends - 1] - ts[starts]).astype(np.float64)  # Σdt exact
        m = cnt - 1  # gap count per key
        ok = m >= 2
        mean_dt = np.full(len(starts), np.nan)
        cv = np.full(len(starts), np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            mf = m.astype(np.float64)
            mean_dt[ok] = span[ok] / mf[ok]
            var = sq[ok] / mf[ok] - mean_dt[ok] * mean_dt[ok]
            cv[ok] = np.sqrt(np.maximum(var, 0.0)) / mean_dt[ok]
        good = ok & (mean_dt > 0)
        from ..functions.rounding import round_half_away
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[starts],
            "n_events": cnt,
            "mean_dt_s": np.where(good, round_half_away(mean_dt, 6),
                                  np.nan),
            "cv_dt": np.where(good, round_half_away(cv, 6), np.nan),
        })


def interarrival_stats(events, n_parts: int = 64):
    """Per-user inter-event-time mean and coefficient of variation —
    one partition-group shuffle; exact integer micros moments."""

    def _prep(batch: pa.Table) -> pa.Table:
        t = _epoch_micros(batch["ts"])
        return pa.table({"user_id": batch["user_id"],
                         "event_id": batch["event_id"],
                         "t": pa.array(t)})

    prepped = events.map_batches(_prep, batch_format="pyarrow")
    return _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(InterarrivalGroup(),
                                      batch_format="pandas")


class SessionCooccurrence:
    """Per-PARTITION combiner for session-level event-type
    co-occurrence (market-basket over session windows): sessionize
    every co-located key with the :class:`SessionWindows` boundary
    scan, reduce each session to its DISTINCT event types, emit every
    unordered type pair (a < b, binary/lexicographic — type codes come
    from the SORTED unique array so the pair order matches SQL string
    comparison) once per session, and return PARTIAL pair counts —
    ≤ |types|² rows leave each partition, so the final groupby moves a
    few hundred bytes per block regardless of corpus size.  Null keys
    drop (the oracle's equi-self-join semantics)."""

    def __init__(self, timeout_s: int = 1800, key_col="user_id",
                 ts_col="ts", id_col="event_id", type_col="event_type"):
        self.timeout_s, self.key_col = timeout_s, key_col
        self.ts_col, self.id_col, self.type_col = ts_col, id_col, type_col
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "type_a": pd.Series([], dtype=object),
            "type_b": pd.Series([], dtype=object),
            "cnt": pd.Series([], dtype=np.int64)})
        codes, _ = pd.factorize(g[self.key_col], sort=False)
        if (codes < 0).any():
            g = g.iloc[codes >= 0]
            codes = codes[codes >= 0]
        if len(g) == 0:
            return empty
        t = _epoch_seconds(g[self.ts_col])
        order = np.lexsort((g[self.id_col].to_numpy(), t, codes))
        codes, t = codes[order], t[order]
        types = g[self.type_col].to_numpy()[order]
        boundary = _session_boundaries(codes, t, self.timeout_s)
        gsid = np.cumsum(boundary) - 1          # global session ordinal
        # NULL types shape session boundaries (they are events) but pair
        # with nothing — the oracle's a < b comparison is never true for
        # NULL — so drop them AFTER sessionizing
        nn = ~pd.isnull(types)
        gsid, types = gsid[nn], types[nn]
        if len(types) == 0:
            return empty
        uniq_types = np.unique(types)           # SORTED: code order ==
        ntypes = len(uniq_types)                # lexicographic order
        tcode = np.searchsorted(uniq_types, types)
        # distinct (session, type) cells, session-major then type-asc
        cells = np.unique(gsid * np.int64(ntypes) + tcode)
        sess_of = cells // ntypes
        tc = cells % ntypes
        seg_first = np.r_[True, sess_of[1:] != sess_of[:-1]]
        starts = np.flatnonzero(seg_first)
        ends = np.r_[starts[1:], len(cells)]
        m = len(cells)
        counts = np.repeat(ends, ends - starts) - np.arange(m) - 1
        P = int(counts.sum())
        if P == 0:
            return empty
        a = np.repeat(np.arange(m), counts)
        cum0 = np.r_[0, np.cumsum(counts)][:-1]
        b = a + 1 + (np.arange(P) - np.repeat(cum0, counts))
        pairkey = tc[a].astype(np.int64) * ntypes + tc[b]
        u, cnt = np.unique(pairkey, return_counts=True)
        return pd.DataFrame({
            "type_a": uniq_types[u // ntypes],
            "type_b": uniq_types[u % ntypes],
            "cnt": cnt.astype(np.int64),
        })


def session_cooccurrence(events, timeout_s: int = 1800,
                         n_parts: int = 64):
    """Event-type co-occurrence within session windows (the
    market-basket / association screen): for every unordered pair of
    event types, the number of sessions containing BOTH.  One
    partition-group shuffle + a tiny ≤|types|²-row final groupby of
    per-partition partial counts."""
    import pyarrow as pa

    from ray.data.aggregate import Sum
    partials = _add_key_partition(events, "user_id", n_parts) \
        .groupby("__part").map_groups(SessionCooccurrence(timeout_s),
                                      batch_format="pandas")

    def _to_arrow(t: pa.Table) -> pa.Table:   # arrow re-block before the
        return t                              # keyed groupby (15× faster)
    return partials.map_batches(_to_arrow, batch_format="pyarrow") \
        .groupby(["type_a", "type_b"]) \
        .aggregate(Sum("cnt", alias_name="n_sessions"))


# --- event-path mining ----------------------------------------------------------

class _PathTrigramPartial:
    """Per-partition kernel for :func:`top_event_paths`: each key's
    event-type stream in (t, event_id) order emits its length-3
    transition paths ``a>b>c``; the partition-local (path, cnt)
    Counter partial keeps the shuffle at |path-vocab| rows."""

    def __init__(self):
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        if len(g) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        codes, _ = pd.factorize(g["user_id"], sort=False)
        keep = codes >= 0
        g, codes = g.iloc[keep], codes[keep]
        if len(g) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        t = g["t"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy()
        order = np.lexsort((ids, t, codes))
        codes = codes[order]
        et = g["event_type"].to_numpy()[order]
        same2 = (codes[2:] == codes[:-2]) if len(codes) > 2 else \
            np.array([], dtype=bool)
        c: "Counter[str]" = Counter()
        idx = np.flatnonzero(same2)
        a, b, d = et[idx], et[idx + 1], et[idx + 2]
        for x, y, z in zip(a, b, d):
            c[f"{x}>{y}>{z}"] += 1
        return pd.DataFrame({
            "path": list(c.keys()),
            "cnt": np.fromiter(c.values(), dtype=np.int64,
                               count=len(c))})


def top_event_paths(events, *, k: int = 10, n_parts: int = 64):
    """Corpus top-k event-type trigram paths (``a>b>c`` within a
    user's time-ordered stream) — the clickstream path-mining staple.
    One user-keyed partition-group shuffle emits |path-vocab| partials,
    a tiny Sum groupby merges them, and top-k is the partial top-k (no
    global sort).  Ties break lexicographically on the path."""
    from ray.data.aggregate import Sum

    from .relational import topk_by
    from .timeseries import _prep_events

    prepped = _prep_events(events, cols=("user_id", "event_id",
                                         "event_type"))
    partials = _add_key_partition(prepped, "user_id", n_parts) \
        .groupby("__part").map_groups(_PathTrigramPartial(),
                                      batch_format="pandas")
    merged = partials.groupby("path").aggregate(
        Sum("cnt", alias_name="cnt"))
    return topk_by(merged, ["cnt", "path"], [True, False], k)


def bounce_rate(events, *, timeout_s: int = 1800, n_parts: int = 64):
    """Per-user session bounce rate: the share of sessions holding a
    single event — the engagement-quality staple, composed on the
    certified sessionization kernel.  Session rows reduce to per-user
    integer counts (one |users|-row groupby); the close is one rounded
    division."""
    from ray.data.aggregate import Sum

    sessions = session_windows(events, timeout_s=timeout_s,
                               n_parts=n_parts)

    def _flags(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": g["user_id"],
            "one": np.ones(len(g), dtype=np.int64),
            "bounce": (g["n_events"].to_numpy(np.int64) == 1)
            .astype(np.int64)})

    flagged = sessions.map_batches(_flags, batch_format="pandas")
    summed = flagged.groupby("user_id").aggregate(
        Sum("one", alias_name="n_sessions"),
        Sum("bounce", alias_name="n_bounce"))

    def _close(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away
        ns = t["n_sessions"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nb = t["n_bounce"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "n_sessions": pa.array(ns),
            "n_bounce": pa.array(nb),
            "bounce_rate": pa.array(round_half_away(
                nb.astype(np.float64) / ns.astype(np.float64), 6))})

    return summed.map_batches(_close, batch_format="pyarrow")


# --- trailing-window distinct actives ---------------------------------------

_DAY_US = 86_400_000_000


def rolling_active_users(events, *, window_days: int = 7):
    """Trailing-``window_days`` distinct active users per day (the DAU/
    WAU rolling-retention shape): for every day with data, how many
    distinct users appeared in the ``window_days``-day window ending
    that day.

    A windowed COUNT(DISTINCT) can't pre-aggregate — counts of
    overlapping windows don't merge — so the plan works in distinct
    CELLS, which do: (1) per-batch local dedup shrinks events to
    (day, user) cells before the first shuffle; (2) each cell fans out
    to the ≤``window_days`` window-end days it can serve, filtered to
    days that exist (the observed-day set is bounded by the calendar,
    not the data, so it broadcasts as a closure constant); (3) one
    distinct shuffle collapses (window_day, user) duplicates a user
    active on several days of one window would create; (4) integer
    count partials close per day.  Shuffle volume is O(cells ×
    window_days), never O(events)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import distributed_distinct

    def _cells(t: pa.Table) -> pa.Table:
        if "ts" not in t.column_names:
            return pa.table({"day": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        day = np.asarray(_epoch_micros(t["ts"])) // _DAY_US
        out = pa.table({"day": pa.array(day),
                        "user_id": t["user_id"]})
        out = out.filter(pc.is_valid(out["user_id"]))
        return out.group_by(["day", "user_id"]).aggregate([])

    cells = distributed_distinct(
        events.map_batches(_cells, batch_format="pyarrow"),
        ["day", "user_id"]).materialize()
    day_rows = distributed_distinct(cells, ["day"]).take_all()
    days_arr = np.sort(np.array([int(r["day"]) for r in day_rows],
                                dtype=np.int64))
    offsets = np.arange(window_days, dtype=np.int64)

    def _fan_out(t: pa.Table) -> pa.Table:
        day = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        win = (day[:, None] + offsets[None, :]).ravel()
        u = np.repeat(uid, window_days)
        keep = np.isin(win, days_arr, assume_unique=False)
        return pa.table({"day": pa.array(win[keep]),
                         "user_id": pa.array(u[keep])})

    expanded = distributed_distinct(
        cells.map_batches(_fan_out, batch_format="pyarrow"),
        ["day", "user_id"])

    def _count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"day": t["day"].to_numpy(zero_copy_only=False),
                           "active": np.ones(len(t), dtype=np.int64)})
        part = df.groupby("day", as_index=False, sort=False).sum()
        return pa.Table.from_pandas(
            part, schema=pa.schema([("day", pa.int64()),
                                    ("active", pa.int64())]),
            preserve_index=False)

    return expanded.map_batches(_count_partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("active", alias_name="active"))
