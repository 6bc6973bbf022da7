"""QA comparison export (reference entry point 3.3,
export_comparison_sheets.py).

Per (series, year): outer-join raw and corrected frames on the time column
(suffixes _raw/_processed, J1) and add ``Outlier_Flag`` from the
comparison-variant Hampel detector (D4 — the zero-MAD rule WITHOUT the
threshold·1e-6 tier) on the raw value column.

Both sides share the (series, year_idx) partitioning, so the join is a
co-grouped merge inside one map_groups — no second shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import kernels as K


class ComparisonKernel:
    """cogroup kernel over union-tagged rows of one (series, year_idx)."""

    def __init__(self, time_col="Time (Seconds)", value_col="Value2",
                 window_size=5, threshold=3.0):
        self.time_col, self.value_col = time_col, value_col
        self.window_size, self.threshold = window_size, threshold
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        raw = g[g["__side"] == "raw"].drop(columns="__side")
        proc = g[g["__side"] == "processed"].drop(columns="__side")
        keep = ["series", "year_idx", self.time_col, self.value_col]
        raw = raw[[c for c in keep if c in raw.columns]]
        proc = proc[[c for c in keep if c in proc.columns]]
        merged = raw.merge(proc, on=["series", "year_idx", self.time_col],
                           how="outer", suffixes=("_raw", "_processed"))
        merged = merged.sort_values(self.time_col, kind="stable") \
                       .reset_index(drop=True)
        vals = merged[f"{self.value_col}_raw"].astype(float)
        flags = np.zeros(len(merged), dtype=bool)
        idx = K.hampel_outliers(vals.to_numpy(), self.window_size,
                                self.threshold, variant="comparison")
        flags[idx] = True
        merged["Outlier_Flag"] = flags
        return merged


def export_comparisons(raw_ds, corrected_ds, time_col="Time (Seconds)",
                       value_col="Value2", window_size=5, threshold=3.0):
    """raw + corrected compat Datasets → comparison Dataset."""
    tag_raw = raw_ds.map_batches(
        lambda df: df.assign(__side="raw"), batch_format="pandas")
    tag_proc = corrected_ds.map_batches(
        lambda df: df.assign(__side="processed"), batch_format="pandas")
    both = tag_raw.union(tag_proc)
    return both.groupby(["series", "year_idx"]).map_groups(
        ComparisonKernel(time_col, value_col, window_size, threshold),
        batch_format="pandas")
