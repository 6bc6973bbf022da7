"""Exact-compat Seatek batch correction (reference entry point 3.1).

Replicates ``scripts/processor.py:process_data`` frame semantics on the
reference loader's column naming — including the documented quirks
(SURVEY.md §1.2): column 0 is *named* "Time (Seconds)" but holds sensor 1;
the auto-detected value column is Value2; gap-inserted rows carry NaN in
every non-interpolated column; each step re-sorts by the time column when
configured.

The Ray plan: parse files → group by (series, year_idx) → per-file frame
kernel (pandas inside map_groups; per-file frames are tiny) → corrected
Dataset + per-file summary rows [Series, Year, Y-Index, Filename, Status,
Records] (batch_correction.py:629-663).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import kernels as K


def process_frame(df: pd.DataFrame, config: dict | None = None,
                  time_col: str = "Time (Seconds)",
                  value_col: str | None = None) -> pd.DataFrame:
    """process_data-equivalent on a wide frame (numpy kernels inside).

    Column contract: ``time_col`` must be numeric (caller converts);
    ``value_col`` defaults to the first numeric non-time column
    (discontinuity_utils.py:294-304).  Only value_col is corrected; other
    columns ride along through sorts and gap-row insertion (NaN-filled,
    NOT interpolated — matching correct_gaps' value_cols=[value_col]).
    """
    cfg = K.merge_config(config)
    out = df.copy()
    if not pd.api.types.is_numeric_dtype(out[time_col]):
        raise ValueError("Time column is not numeric and could not be converted")
    if value_col is None:
        numeric = [c for c in out.columns
                   if pd.api.types.is_numeric_dtype(out[c]) and c != time_col]
        if not numeric:
            raise ValueError("No numeric value columns found in the data")
        value_col = numeric[0]

    out = out.sort_values(by=time_col, kind="stable").reset_index(drop=True)

    # Step 1: gaps
    t = out[time_col].to_numpy()
    gaps = K.detect_gaps(t, cfg["gap_threshold_factor"])
    if len(gaps):
        new_times = K.gap_fill_times(t, gaps)
        if len(new_times):
            gap_rows = pd.DataFrame(np.nan, index=range(len(new_times)),
                                    columns=out.columns)
            gap_rows[time_col] = new_times
            out = pd.concat([out, gap_rows], ignore_index=True)
            out = out.sort_values(by=time_col, kind="stable") \
                     .reset_index(drop=True)
        out[value_col] = K.interp_positional(out[value_col].to_numpy(float),
                                             cfg["gap_method"])
        out = out.sort_values(by=time_col, kind="stable").reset_index(drop=True)

    # Step 2: outliers
    v = out[value_col].to_numpy(float)
    outliers = K.hampel_outliers(v, cfg["window_size"], cfg["threshold"])
    if len(outliers):
        out[value_col] = K.correct_outliers(v, outliers, cfg["window_size"],
                                            cfg["outlier_method"])

    # Step 3: jumps
    v = out[value_col].to_numpy(float)
    jumps = K.cusum_jumps(v, cfg["window_size"], cfg["threshold"])
    if len(jumps):
        out[value_col] = K.correct_jumps(v, jumps, cfg["window_size"])
    return out


class CompatFileKernel:
    """map_groups kernel: one (series, year_idx) compat frame → corrected."""

    def __init__(self, config: dict | None = None):
        self.config = config
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        meta = g[["series", "year_idx"]].iloc[0]
        body = g.drop(columns=["series", "year_idx"])
        try:
            corrected = process_frame(body, self.config)
            corrected.insert(0, "series", meta["series"])
            corrected.insert(1, "year_idx", np.int32(meta["year_idx"]))
            corrected["status"] = "Processed"
            return corrected
        except ValueError:
            # per-file failures downgrade to a status row, run continues
            # (batch_correction.py:622-627)
            return pd.DataFrame({"series": [meta["series"]],
                                 "year_idx": [np.int32(meta["year_idx"])],
                                 "status": ["Failed (Processing Error)"]})


def batch_correct(data_dir: str, config: dict | None = None,
                  series: list[str] | None = None,
                  year_range: tuple[int, int] | None = None):
    """Corrected Dataset over a Seatek dir (compat semantics)."""
    from ..sources.seatek import read_seatek
    ds = read_seatek(data_dir, mode="compat", series=series,
                     year_range=year_range)
    return ds.groupby(["series", "year_idx"]).map_groups(
        CompatFileKernel(config), batch_format="pandas")


class LongSeriesKernel:
    """map_groups kernel for the INTENDED semantics (SURVEY.md §1.2): every
    (series, year, sensor) is an independent series over the real
    last-column timestamps — the knowingly-fixed version of the reference's
    only-Value2 quirk.  Emits the corrected long rows (gap-inserted rows
    appear with inserted=True)."""

    def __init__(self, config: dict | None = None):
        self.config = config
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        from .. import kernels as K
        g = g.sort_values("t", kind="stable")
        t = g["t"].to_numpy(np.float64)
        v = g["value"].to_numpy(np.float64)
        t2, v2 = K.process_series(t, v, self.config)
        orig = set(t.tolist())
        return pd.DataFrame({
            "series": np.full(len(t2), g["series"].iloc[0], dtype=object),
            "year_idx": np.full(len(t2), g["year_idx"].iloc[0], np.int32),
            "sensor_id": np.full(len(t2), g["sensor_id"].iloc[0], np.int32),
            "t": t2,
            "value_corrected": v2,
            "inserted": np.fromiter((x not in orig for x in t2.tolist()),
                                    dtype=bool, count=len(t2)),
        })


def correct_all_sensors(data_dir: str, config: dict | None = None):
    """Long-form correction of every sensor column independently — one
    groupby shuffle keyed (series, year_idx, sensor_id)."""
    from ..sources.seatek import read_seatek
    long_ds = read_seatek(data_dir, mode="long")
    return long_ds.groupby(["series", "year_idx", "sensor_id"]).map_groups(
        LongSeriesKernel(config), batch_format="pandas")


def summarize(corrected, first_year: int = 1995,
              year_index_map: dict[int, int] | None = None) -> pd.DataFrame:
    """[Series, Year, Y-Index, Filename, Status, Records] summary
    (batch_correction.py:629-640).  Year = ``year_index_map[yidx]`` when a
    map is configured (the reference's optional config key), else
    positional ``first_year + yidx - 1``; filename template K4
    'Year_{year} (Y{yi:02d})_Data'."""
    from ray.data.aggregate import Count
    df = corrected.groupby(["series", "year_idx"]).aggregate(
        Count(alias_name="Records")).to_pandas()
    if year_index_map:
        df["Year"] = df["year_idx"].map(
            lambda i: year_index_map.get(int(i), first_year + int(i) - 1))
    else:
        df["Year"] = first_year + df["year_idx"] - 1
    df["Filename"] = [f"Year_{y} (Y{int(i):02d})_Data.xlsx"
                      for y, i in zip(df["Year"], df["year_idx"])]
    df["Status"] = "Processed"
    out = df.rename(columns={"series": "Series", "year_idx": "Y-Index"})
    return out[["Series", "Year", "Y-Index", "Filename", "Status",
                "Records"]].sort_values(["Series", "Y-Index"]) \
        .reset_index(drop=True)
