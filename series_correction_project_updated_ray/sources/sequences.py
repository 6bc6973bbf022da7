"""The canonical engine input: a Parquet table of pre-tokenized sequences
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``
(BASELINE.json input_hint).

Two ways to obtain one:

* :func:`sequences_from_documents` — derive it from the test corpus's
  ``documents`` table with the deterministic pseudo-BPE tokenizer (a
  ``map_batches`` stage; the documents table is the only sanctioned input
  data in this sandbox).
* :func:`write_synthetic_sequences` — a seeded generator producing the
  FIXTURES.md §F1 shape (log-normal-ish lengths, skewed source mix) for
  scale/bench experiments, written as partitioned Parquet under /tmp.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..functions.text import tokenize_to_ids

SEQUENCES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def _tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,source,…) → sequences(doc_id,tokens,n_tok,source)."""
    texts = batch["text"].to_pandas()
    sources = batch["source"].to_pandas()
    ids = batch["doc_id"].to_pandas()
    token_arrays = tokenize_to_ids(texts)
    doc_ids = (sources.astype(str) + "/" + ids.astype(str).str.zfill(8)).to_numpy(object)
    n_tok = np.fromiter((len(a) for a in token_arrays), dtype=np.int32,
                        count=len(token_arrays))
    tokens = pa.array(
        [a for a in token_arrays],
        type=pa.list_(pa.int32()))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, type=pa.string()), tokens,
         pa.array(n_tok, type=pa.int32()),
         pa.array(sources.to_numpy(object), type=pa.string())],
        schema=SEQUENCES_SCHEMA)


def sequences_from_documents(sf_dir: str, *, columns=("doc_id", "text", "source")
                             ) -> "ray.data.Dataset":
    """Read documents.parquet (pruned to the needed columns) and tokenize it
    into the canonical sequences shape as a streaming map_batches stage."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=list(columns))
    return ds.map_batches(_tokenize_batch, batch_format="pyarrow")


def write_synthetic_sequences(out_dir: str, num_docs: int, seed: int = 42,
                              rows_per_file: int = 100_000) -> str:
    """Seeded FIXTURES.md §F1 generator (for /tmp scale experiments only).

    source mix deliberately skewed (80% web / 15% books / 5% code) to
    exercise the salting path; n_tok log-normal-ish clipped to [16, 4096].
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = 0
    part = 0
    while written < num_docs:
        n = min(rows_per_file, num_docs - written)
        src = rng.choice(["web", "books", "code"], size=n, p=[0.8, 0.15, 0.05])
        n_tok = np.clip(np.exp(rng.normal(5.5, 1.0, n)), 16, 4096).astype(np.int32)
        flat = rng.integers(0, 50257, size=int(n_tok.sum()), dtype=np.int32)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32() if offsets[-1] < 2**31 else pa.int64()).cast(pa.int32()),
            pa.array(flat, type=pa.int32()))
        idx = np.arange(written, written + n)
        doc_id = pa.array([f"{s}/{i:08d}" for s, i in zip(src, idx)],
                          type=pa.string())
        tbl = pa.Table.from_arrays(
            [doc_id, tokens, pa.array(n_tok, type=pa.int32()),
             pa.array(src, type=pa.string())], schema=SEQUENCES_SCHEMA)
        pq.write_table(tbl, os.path.join(out_dir, f"part-{part:05d}.parquet"))
        written += n
        part += 1
    return out_dir


def read_sequences(path: str, num_blocks: int | None = None
                   ) -> "ray.data.Dataset":
    """num_blocks sizes the read for the downstream groupby shuffle —
    ~2 blocks per CPU keeps the sort map/reduce fan balanced (measured:
    64 blocks beats both 32 and 256 at 100k docs / 32 CPUs)."""
    if num_blocks is None:
        return ray.data.read_parquet(path)
    return ray.data.read_parquet(path, override_num_blocks=num_blocks)
