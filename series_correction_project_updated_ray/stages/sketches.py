"""Mergeable sketches for approximate aggregates at 100 TB scale.

Exact COUNT(DISTINCT) shuffles every distinct pair (see
``distinct_users``); at web scale the standard answer is a mergeable
sketch: each batch emits ONE fixed-size summary, a tiny groupby merges
them, and the error is a known function of the sketch size.

Implemented from the published HyperLogLog construction (Flajolet et al.
2007, public knowledge): 2^p registers, register = max leading-zero rank
of the hashed suffix; merge = elementwise max; estimate = bias-corrected
harmonic mean with the standard small-range (linear counting) correction.
Relative error ≈ 1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash_array


def hll_from_hashes(h: np.ndarray, p: int = 12) -> np.ndarray:
    """uint8[2^p] register array from uint64 hashes (vectorized)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h << np.uint64(p)  # remaining 64-p bits at the top
    # rank = leading zeros of suffix within (64-p) bits, +1; all-zero suffix
    # → max rank (64-p+1)
    bits = np.zeros(len(h), dtype=np.int64)
    nonzero = suffix != 0
    # bit_length via log2 on floats is unsafe at 64 bits; use a loop over
    # byte nibbles — vectorized leading-zero count
    x = suffix[nonzero]
    lz = np.full(len(x), 0, dtype=np.int64)
    shift = np.uint64(32)
    cur = x.copy()
    step = 32
    while step >= 1:
        high = cur >> np.uint64(64 - step)
        zero_high = high == 0
        lz = np.where(zero_high, lz + step, lz)
        cur = np.where(zero_high, cur << np.uint64(step), cur)
        step //= 2
    rank = np.zeros(len(h), dtype=np.int64)
    rank[nonzero] = lz + 1
    rank[~nonzero] = 64 - p + 1
    rank = np.minimum(rank, 64 - p + 1)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = sketches[0].copy()
    for s in sketches[1:]:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return float(est)


class HLLPartial:
    """map_batches combiner: one serialized sketch row per (key, batch)."""

    def __init__(self, key_col: str, value_col: str, p: int = 12):
        self.key_col, self.value_col, self.p = key_col, value_col, p

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pandas().to_numpy()
        h = stable_hash_array(batch[self.value_col].to_pandas())
        rows_k, rows_s = [], []
        for k in pd.unique(keys):
            mask = keys == k
            rows_k.append(k)
            rows_s.append(hll_from_hashes(h[mask], self.p).tobytes())
        return pa.table({self.key_col: pa.array(rows_k),
                         "sketch": pa.array(rows_s, pa.binary())})


class HLLMergeGroup:
    """map_groups: merge a key's sketches and estimate."""

    def __init__(self, key_col: str):
        self.key_col = key_col
        self.__name__ = type(self).__name__

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        regs = hll_merge([np.frombuffer(b, dtype=np.uint8)
                          for b in g["sketch"]])
        return pd.DataFrame({self.key_col: [g[self.key_col].iloc[0]],
                             "approx_distinct": [int(round(
                                 hll_estimate(regs)))]})


def approx_distinct(ds, key_col: str, value_col: str, p: int = 12):
    """Approximate per-key distinct count; shuffle moves only 4 KiB
    sketches per (key, batch)."""
    partials = ds.map_batches(HLLPartial(key_col, value_col, p),
                              batch_format="pyarrow")
    return partials.groupby(key_col).map_groups(
        HLLMergeGroup(key_col), batch_format="pandas")
