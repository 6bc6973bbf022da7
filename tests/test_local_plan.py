"""Zero-shuffle (bucketed) plan must produce exactly the shuffle plan's
rollup output."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def bucketed_input(tmp_path_factory):
    from series_correction_project_updated_ray.sources.sequences import (
        write_synthetic_sequences_bucketed)
    p = str(tmp_path_factory.mktemp("seqs") / "bucketed")
    write_synthetic_sequences_bucketed(p, 3000, seed=9, n_files=8,
                                       buckets_per_source=8, chunk=700)
    return p


def _canon(df):
    return df.sort_values(["series_key", "tier", "window_start"]) \
             .reset_index(drop=True)


def test_local_equals_shuffle_plan(ray_session, bucketed_input):
    from series_correction_project_updated_ray.sources.sequences import (
        read_sequences)
    from series_correction_project_updated_ray.stages.correction import (
        correct_and_rollup, correct_and_rollup_local)
    local = correct_and_rollup_local(
        bucketed_input, buckets_per_source=8, step_seconds=1).to_pandas()
    shuffled = correct_and_rollup(
        read_sequences(bucketed_input), buckets_per_source=8,
        step_seconds=1).to_pandas()
    a, b = _canon(local), _canon(shuffled)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_layout_colocates_series(ray_session, bucketed_input):
    """Every series_key appears in exactly one bucket file."""
    import glob
    import pyarrow.parquet as pq
    from series_correction_project_updated_ray.stages.correction import (
        add_series_key)
    seen: dict[int, str] = {}
    for f in sorted(glob.glob(f"{bucketed_input}/bucket-*.parquet")):
        keys = set(add_series_key(pq.read_table(f), 8)["series_key"]
                   .to_numpy().tolist())
        for k in keys:
            assert seen.setdefault(k, f) == f
