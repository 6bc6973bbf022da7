"""Approximate/exact nearest-neighbor search over an embedding column.

* :func:`knn_brute_force` — the correctness baseline: every batch computes
  cosine against a BROADCAST query matrix (``ray.put`` once, read per actor),
  emits only its local top-k, and a final tiny sort picks the global top-k.
  The full corpus is never materialized; shipped data ≈ batches × k rows.
* :func:`knn_ivf` — the scale path: k-means-ish coarse quantizer (trained on
  a sample), vectors bucketed by nearest centroid; queries probe the
  ``nprobe`` nearest buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round_half_away


def _vec_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(col), -1)


class BatchTopK:
    """Per-batch cosine top-k against a broadcast query vector."""

    def __init__(self, query_ref, k: int, vec_col="embedding", id_col="vec_id"):
        import ray
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.q = q / max(np.linalg.norm(q), 1e-12)
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _vec_matrix(batch[self.vec_col])
        norms = np.maximum(np.linalg.norm(M, axis=1), 1e-12)
        sims = (M @ self.q) / norms
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(sims) > self.k:
            # prune with the FULL ordering (sim desc, id asc) so block-level
            # cuts never violate the documented deterministic tie-break
            order = np.lexsort((ids, -sims))[:self.k]
            sims, ids = sims[order], ids[order]
        return pa.table({self.id_col: pa.array(ids),
                         "cosine_sim": pa.array(sims)})


def knn_brute_force(embeddings, query_vec, k: int = 10,
                    vec_col="embedding", id_col="vec_id", round_to=6):
    """Global cosine top-k; deterministic tie-break by ascending id."""
    import ray
    qref = ray.put(np.asarray(query_vec, dtype=np.float64))
    partial = embeddings.map_batches(
        BatchTopK, batch_format="pyarrow", concurrency=2,
        fn_constructor_args=(qref, k, vec_col, id_col))
    df = partial.to_pandas()  # ≤ k rows per block — tiny
    df = df.sort_values(["cosine_sim", id_col],
                        ascending=[False, True]).head(k)
    if round_to is not None:
        df["cosine_sim"] = round_half_away(df["cosine_sim"].to_numpy(), round_to)
    return df.reset_index(drop=True)


class IVFAssign:
    """map_batches: assign each vector to its nearest coarse centroid."""

    def __init__(self, centroids_ref, vec_col="embedding", id_col="vec_id"):
        import ray
        C = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        self.C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _vec_matrix(batch[self.vec_col])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(Mn @ self.C.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))


def train_centroids(embeddings, n_centroids=16, sample_frac=0.25, seed=7,
                    iters=10, vec_col="embedding"):
    """Lloyd iterations on a driver-side SAMPLE (the classic IVF recipe:
    train small, assign big)."""
    sample = embeddings.random_sample(sample_frac, seed=seed).take_all()
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def knn_ivf(embeddings, query_vec, k=10, n_centroids=16, nprobe=4,
            vec_col="embedding", id_col="vec_id", seed=7):
    """IVF-bucketed ANN: probe only the nprobe nearest cells."""
    import ray
    C = train_centroids(embeddings, n_centroids, seed=seed, vec_col=vec_col)
    cref = ray.put(C)
    assigned = embeddings.map_batches(
        IVFAssign, batch_format="pyarrow", concurrency=2,
        fn_constructor_args=(cref, vec_col, id_col))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(C @ qn))[:nprobe].tolist())
    probed = assigned.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["ivf_cell"],
                             value_set=pa.array(sorted(probe), pa.int32()))),
        batch_format="pyarrow")
    return knn_brute_force(probed, query_vec, k, vec_col, id_col)
