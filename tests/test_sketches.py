"""HyperLogLog sketch accuracy + mergeability."""

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_ray.functions.hashing import (
    stable_hash_array)
from series_correction_project_updated_ray.stages.sketches import (
    hll_estimate, hll_from_hashes, hll_merge)


def _hashes(values):
    return stable_hash_array(pd.Series(values).astype(str))


@pytest.mark.parametrize("n", [100, 5000, 100_000])
def test_hll_accuracy(n):
    h = _hashes([f"v{i}" for i in range(n)])
    est = hll_estimate(hll_from_hashes(h, p=12))
    assert abs(est - n) / n < 0.05  # 1.04/sqrt(4096) ~ 1.6%; 3-sigma margin


def test_hll_duplicates_dont_inflate():
    vals = [f"v{i % 500}" for i in range(50_000)]
    est = hll_estimate(hll_from_hashes(_hashes(vals), p=12))
    assert abs(est - 500) / 500 < 0.05


def test_hll_merge_equals_union():
    a = _hashes([f"a{i}" for i in range(3000)])
    b = _hashes([f"a{i}" for i in range(1500, 4500)])  # overlapping
    merged = hll_merge([hll_from_hashes(a, 12), hll_from_hashes(b, 12)])
    direct = hll_from_hashes(np.concatenate([a, b]), 12)
    np.testing.assert_array_equal(merged, direct)


def test_approx_distinct_stage(ray_session):
    import ray.data as rd
    from series_correction_project_updated_ray.stages.sketches import (
        approx_distinct)
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 20000),
        "v": [f"u{x}" for x in rng.integers(0, 700, 20000)],
    })
    out = approx_distinct(rd.from_pandas(df), "k", "v").to_pandas()
    truth = df.groupby("k")["v"].nunique()
    for _, row in out.iterrows():
        t = truth[row["k"]]
        assert abs(row["approx_distinct"] - t) / t < 0.06


def test_kll_single_sketch_rank_accuracy():
    from series_correction_project_updated_ray.stages.sketches import KLLSketch
    rng = np.random.default_rng(21)
    v = rng.lognormal(3, 1, 200_000)
    sk = KLLSketch()
    for chunk in np.array_split(v, 37):
        sk.update_many(chunk)
    assert sk.n == len(v)
    sv = np.sort(v)
    for p in (0.1, 0.5, 0.9, 0.99):
        est = sk.quantiles([p])[0]
        true_rank = np.searchsorted(sv, est) / len(v)
        assert abs(true_rank - p) < 0.02, (p, true_rank)


def test_kll_merge_equivalent_to_single():
    from series_correction_project_updated_ray.stages.sketches import KLLSketch
    rng = np.random.default_rng(22)
    v = rng.normal(0, 1, 100_000)
    shards = [KLLSketch() for _ in range(8)]
    for i, chunk in enumerate(np.array_split(v, 8)):
        shards[i].update_many(chunk)
    merged = shards[0]
    for s in shards[1:]:
        merged.merge(s)
    assert merged.n == len(v)
    sv = np.sort(v)
    for p in (0.25, 0.5, 0.75, 0.95):
        est = merged.quantiles([p])[0]
        true_rank = np.searchsorted(sv, est) / len(v)
        assert abs(true_rank - p) < 0.025, (p, true_rank)


def test_kll_roundtrip_bytes():
    from series_correction_project_updated_ray.stages.sketches import KLLSketch
    rng = np.random.default_rng(23)
    sk = KLLSketch()
    sk.update_many(rng.uniform(0, 1, 50_000))
    back = KLLSketch.from_bytes(sk.to_bytes())
    assert back.n == sk.n
    np.testing.assert_array_equal(back.quantiles([0.1, 0.5, 0.9]),
                                  sk.quantiles([0.1, 0.5, 0.9]))


def test_approx_quantiles_distributed(ray_session):
    import ray.data as rd
    from series_correction_project_updated_ray.stages.sketches import (
        approx_quantiles)
    rng = np.random.default_rng(24)
    n = 120_000
    df = pd.DataFrame({"key": rng.choice(["a", "b", "c"], n),
                       "v": rng.exponential(10, n)})
    out = approx_quantiles(rd.from_pandas(df).repartition(16), "key", "v",
                           probs=(0.5, 0.9, 0.99)).to_pandas()
    assert sorted(out["key"]) == ["a", "b", "c"]
    for _, row in out.iterrows():
        g = np.sort(df.loc[df["key"] == row["key"], "v"].to_numpy())
        assert row["n"] == len(g)
        for p in (50, 90, 99):
            true_rank = np.searchsorted(g, row[f"p{p}"]) / len(g)
            assert abs(true_rank - p / 100) < 0.03, (row["key"], p, true_rank)


def test_mg_error_bound_and_merge():
    from series_correction_project_updated_ray.stages.sketches import (
        mg_build, mg_merge)
    rng = np.random.default_rng(25)
    # zipf-ish: heavy head + long tail
    items = rng.zipf(1.5, 50_000)
    items = items[items < 10_000]
    k = 64
    shards = [mg_build(c, k) for c in np.array_split(items, 16)]
    acc = {}
    for s in shards:
        acc = mg_merge(acc, s, k)
    true = pd.Series(items).value_counts()
    n = len(items)
    for item, est in acc.items():
        t = true.get(item, 0)
        assert est <= t  # MG never overestimates
        assert t - est <= n / (k + 1) + 1
    # every item with true count > n/(k+1) must survive
    for item, t in true.items():
        if t > n / (k + 1):
            assert item in acc, (item, t)


def test_heavy_hitters_distributed(ray_session):
    import ray.data as rd
    from series_correction_project_updated_ray.stages.sketches import (
        heavy_hitters)
    rng = np.random.default_rng(26)
    n = 60_000
    # two keys with different known-hot items over a uniform background
    hot = {"a": 17, "b": 99}
    key = rng.choice(["a", "b"], n)
    item = rng.integers(0, 5000, n)
    mask = rng.uniform(size=n) < 0.2  # 20% of rows are the key's hot item
    item[mask] = np.vectorize(hot.get)(key[mask])
    df = pd.DataFrame({"key": key, "item": item})
    out = heavy_hitters(rd.from_pandas(df).repartition(16), "key", "item",
                        k=64, top_n=5).to_pandas()
    for kk, hot_item in hot.items():
        top1 = out[out["key"] == kk].sort_values("est", ascending=False).iloc[0]
        assert top1["item"] == hot_item
