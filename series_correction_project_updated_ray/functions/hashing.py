"""Deterministic, vectorized hashing utilities.

Python's builtin ``hash`` is process-salted, so every key derivation here
uses ``pandas.util.hash_array`` (cython-vectorized SipHash with a fixed
default key — stable across processes and nodes, which the partitioning
contract requires: the same doc_id must land in the same series bucket on
every worker of every run).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_VOCAB = 50257


def stable_hash_array(values) -> np.ndarray:
    """uint64 deterministic hash of a string/object sequence (vectorized)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    if isinstance(values, pd.Series):
        return pd.util.hash_pandas_object(values, index=False).to_numpy()
    return pd.util.hash_array(np.asarray(values, dtype=object))


def series_bucket(doc_ids, num_buckets: int) -> np.ndarray:
    """Bucket id in [0, num_buckets) for each doc_id."""
    return (stable_hash_array(doc_ids) % np.uint64(num_buckets)).astype(np.int64)


def minhash_signatures(shingle_sets: list[np.ndarray], num_perm: int,
                       seed: int = 1234) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures from per-doc shingle-hash
    arrays, using universal hashing h_i(x) = (a_i * x + b_i) mod p.

    Vectorized per document over all permutations at once; empty shingle sets
    get the max hash value.
    """
    p = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    out = np.full((len(shingle_sets), num_perm), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, sh in enumerate(shingle_sets):
            if len(sh) == 0:
                continue
            # (num_perm, n_shingles) — uint64 wraparound is deterministic
            # and fine for hashing
            h = (a[:, None] * sh[None, :] + b[:, None]) % p
            out[i] = h.min(axis=1)
    return out


def simhash64(token_hash_sets: list[np.ndarray],
              weights: list[np.ndarray] | None = None) -> np.ndarray:
    """64-bit SimHash per document from token-hash arrays."""
    n = len(token_hash_sets)
    out = np.zeros(n, dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, th in enumerate(token_hash_sets):
        if len(th) == 0:
            continue
        w = weights[i] if weights is not None else np.ones(len(th))
        # (n_tokens, 64) bit matrix
        bitmat = ((th[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.float64)
        score = (w[:, None] * (2 * bitmat - 1)).sum(axis=0)
        out[i] = np.uint64(
            int("".join("1" if s > 0 else "0" for s in score[::-1]), 2))
    return out


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise-free hamming distance between uint64 arrays (elementwise)."""
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
