"""Tests for the winnowing span-dedup primitives (textstage.py):
selection semantics vs a literal single-doc implementation, the
Schleimer et al. §3 guarantee, and the cross-doc match aggregate."""

import numpy as np
import pandas as pd
import pyarrow as pa

from series_correction_project_updated_ray.stages.textstage import (
    WinnowFingerprints, winnow_fingerprints, winnow_matches)

B = np.uint64(1099511628211)


def _grams(tids, k):
    out = []
    with np.errstate(over="ignore"):
        for i in range(len(tids) - k + 1):
            acc = np.uint64(tids[i])
            for j in range(1, k):
                acc = acc * B + np.uint64(tids[i + j])
            out.append(acc)
    return out


def _winnow_one(tids, k, w):
    gs = _grams(tids, k)
    sel = set()
    for e in range(w - 1, len(gs)):
        lo = e - w + 1
        mn = min(gs[lo:e + 1])
        p = max(i for i in range(lo, e + 1) if gs[i] == mn)
        sel.add((p, int(gs[p].view(np.int64))))
    return sel


def _seq_table(docs: dict[str, list[int]]) -> pa.Table:
    ids = list(docs)
    toks = pa.array([docs[d] for d in ids], type=pa.list_(pa.int32()))
    return pa.table({"doc_id": pa.array(ids, pa.string()), "tokens": toks})


def test_winnow_kernel_matches_literal():
    rng = np.random.default_rng(4)
    docs = {f"d{i}": rng.integers(0, 50, rng.integers(0, 60)).tolist()
            for i in range(30)}
    got = WinnowFingerprints(5, 4)(_seq_table(docs)).to_pandas()
    for d, tids in docs.items():
        have = set(zip(got.loc[got.doc_id == d, "pos"],
                       got.loc[got.doc_id == d, "fp"]))
        assert have == _winnow_one(tids, 5, 4), d


def test_winnow_rightmost_tie_and_short_docs():
    # constant token stream → every k-gram hash equal → each window
    # must pick its RIGHTMOST position (= window end)
    tids = [7] * 12
    got = WinnowFingerprints(3, 4)(_seq_table({"c": tids})).to_pandas()
    assert sorted(got["pos"]) == list(range(3, 10))
    # shorter than k+w-1 → no complete window → nothing
    for n in range(0, 6):
        out = WinnowFingerprints(3, 4)(_seq_table({"s": [1] * n}))
        assert len(out) == 0


def test_winnow_guarantee_shared_run():
    """Any shared token run of length ≥ k + w − 1 yields at least one
    identical (fp) selection in both documents."""
    rng = np.random.default_rng(9)
    k, w = 5, 4
    run = rng.integers(0, 50257, k + w - 1).tolist()
    a = rng.integers(0, 50257, 40).tolist() + run + \
        rng.integers(0, 50257, 40).tolist()
    b = rng.integers(0, 50257, 17).tolist() + run
    got = WinnowFingerprints(k, w)(_seq_table({"a": a, "b": b})).to_pandas()
    fa = set(got.loc[got.doc_id == "a", "fp"])
    fb = set(got.loc[got.doc_id == "b", "fp"])
    assert fa & fb, "shared run produced no common fingerprint"


def test_winnow_ray_end_to_end_and_matches(ray_session):
    import ray.data

    rng = np.random.default_rng(2)
    shared = rng.integers(0, 50257, 30).tolist()
    docs = {f"u{i}": rng.integers(0, 50257, 80).tolist() for i in range(20)}
    docs["x1"] = docs["u0"][:10] + shared + docs["u1"][:10]
    docs["x2"] = shared + docs["u2"][:25]
    ds = ray.data.from_arrow(_seq_table(docs)).repartition(5)

    fp = winnow_fingerprints(ds, k=5, w=4).to_pandas()
    for d in ("x1", "x2", "u5"):
        have = set(zip(fp.loc[fp.doc_id == d, "pos"],
                       fp.loc[fp.doc_id == d, "fp"]))
        assert have == _winnow_one(docs[d], 5, 4)

    m = winnow_matches(ds, k=5, w=4, min_docs=2).to_pandas()
    assert len(m) > 0 and (m["n_docs"] >= 2).all()
    # every reported fp is selected by ≥ 2 distinct docs in the raw set
    per_fp = fp.groupby("fp")["doc_id"].nunique()
    assert set(m["fp"]) == set(per_fp[per_fp >= 2].index)
    occ = fp.groupby("fp").size()
    got_occ = m.set_index("fp")["n_occ"].sort_index()
    assert (got_occ == occ[got_occ.index]).all()
