"""Relational building blocks: unpivot/melt, broadcast lookup join,
filters, small summary aggregates (reference operators S6/A9, J2/J4,
A7/A8, K3 as query-able stages).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sanitize import sanitize_batch


def unpivot(batch: pa.Table, id_cols: list[str], value_cols: list[str],
            var_name="measure", value_name="value") -> pa.Table:
    """Arrow melt: wide value columns → (id_cols…, measure, value) rows.

    The reference's load_identified_outliers melt
    (/root/reference/scripts/apply_refined_corrections.py:54-59) as a
    streaming batch transform — builds output columns with numpy tiling,
    no per-row Python.
    """
    n = len(batch)
    k = len(value_cols)
    out: dict[str, pa.Array] = {}
    for c in id_cols:
        col = batch[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # repeat the id column k times (one copy per measure)
        out[c] = pa.concat_arrays([col] * k)
    measure = np.concatenate([np.full(n, c, dtype=object)
                              for c in value_cols])
    values = np.concatenate(
        [batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
         for c in value_cols])
    out[var_name] = pa.array(measure, pa.string())
    out[value_name] = pa.array(values)
    return pa.table(out)


def unpivot_threshold(ds, id_cols, value_cols, threshold=0.1,
                      var_name="measure", value_name="value"):
    """melt + |value| >= threshold filter (NaN excluded, as in the
    reference: NaN >= t is False)."""
    import pyarrow.compute as pc

    def _stage(batch: pa.Table) -> pa.Table:
        t = unpivot(batch, id_cols, value_cols, var_name, value_name)
        keep = pc.greater_equal(pc.abs(t[value_name]), threshold)
        keep = pc.fill_null(keep, False)
        return t.filter(keep)

    return ds.map_batches(_stage, batch_format="pyarrow")


class BroadcastLookup:
    """Broadcast hash-join stage: small side shipped once via ray.put,
    probed per batch with a vectorized pandas map (J2/J4 pattern —
    never a shuffle)."""

    def __init__(self, lookup_ref, key_col: str, out_cols: dict[str, str]):
        import ray
        self.lookup: pd.DataFrame = ray.get(lookup_ref)
        self.key_col = key_col
        self.out_cols = out_cols  # {lookup_col: output_name}

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pandas()
        for src, dst in self.out_cols.items():
            mapped = keys.map(self.lookup[src])
            batch = batch.append_column(
                dst, pa.Array.from_pandas(mapped))
        return batch


def broadcast_enrich(ds, small_df: pd.DataFrame, key_col: str,
                     index_col: str, out_cols: dict[str, str],
                     concurrency: int = 2):
    """Enrich ``ds`` with columns from ``small_df`` (indexed by
    ``index_col``) matched on ``ds[key_col]``."""
    import ray
    ref = ray.put(small_df.set_index(index_col))
    return ds.map_batches(BroadcastLookup, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_args=(ref, key_col, out_cols))


def sanitize_dataset(ds):
    """Formula-injection sanitizer stage in front of any text export sink."""
    return ds.map_batches(sanitize_batch, batch_format="pyarrow")
