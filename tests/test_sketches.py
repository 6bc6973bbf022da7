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
