"""Text-analysis map_batches stages over the documents table.

Quality features / token counts are chosen to be EXACTLY expressible in
DuckDB SQL (the oracle): whitespace token counts follow
``regexp_split_to_array(text, '\\s+')`` semantics, word/punct counts follow
``regexp_extract_all`` with the same ASCII classes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as T


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pandas()
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_ws_tokens": pa.array(T.whitespace_token_count(texts)),
        "n_bpe_tokens": pa.array(T.bpe_ish_token_count(texts)),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    from ..functions.rounding import round_half_away
    texts = batch["text"].to_pandas()
    f = T.quality_features(texts)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(f["n_chars"]),
        "n_words": pa.array(f["n_words"]),
        "n_punct": pa.array(f["n_punct"]),
        "punct_ratio": pa.array(round_half_away(f["punct_ratio"], 6)),
        "stop_ratio": pa.array(round_half_away(f["stop_ratio"], 6)),
    })


class LangIdStage:
    """Actor-pool language-ID stage (marker sets built once per actor)."""

    def __init__(self):
        self.detect = T.detect_language

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pandas()
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(self.detect(texts), pa.string()),
        })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pandas()
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(T.rolling_fingerprint(texts).astype(np.int64)),
    })


def token_counts(docs):
    return docs.map_batches(token_count_batch, batch_format="pyarrow")


def quality_scores(docs):
    return docs.map_batches(quality_batch, batch_format="pyarrow")


def language_id(docs):
    return docs.map_batches(LangIdStage, batch_format="pyarrow",
                            concurrency=2)


def fingerprints(docs):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")
