"""Config loader (S4/S5/J2), step registry (§2.10), report sinks (K/J4/A7)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_ray import kernels as K
from series_correction_project_updated_ray.sources.config import (
    enrich_with_river_mappings, filter_series_by_river_miles, load_config)
from series_correction_project_updated_ray.stages.steps import (
    CorrectionStep, default_steps, make_step, register_step, run_steps)


# --- config (S4/S5/J2) -----------------------------------------------------

def test_load_config_traversal_guard(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"defaults": {"window_size": 5}}))
    assert load_config("cfg.json")["defaults"]["window_size"] == 5
    outside = tmp_path.parent / "evil.json"
    outside.write_text("{}")
    with pytest.raises(ValueError):
        load_config(str(outside))
    with pytest.raises(ValueError):
        load_config("../evil.json")


def test_river_mile_enrichment_and_filter():
    rm = pd.DataFrame({"SENSOR_ID": [26, 27, 28, 29],
                       "RIVER_MILE": [54.0, 54.0, 68.5, 68.5]})
    cfg = enrich_with_river_mappings({}, rm)
    assert cfg["SENSOR_TO_RIVER"][26] == 54.0
    assert cfg["RIVER_TO_SENSORS"][54.0] == [26, 27]
    assert filter_series_by_river_miles([26, 28, 99], [54.0], cfg) == [26]
    assert filter_series_by_river_miles([26, 28, 99], "all", cfg) == [26, 28]
    # no map → passthrough sorted
    assert filter_series_by_river_miles([3, 1], [54.0], {}) == [1, 3]


# --- step registry (§2.10) -------------------------------------------------

def test_default_steps_match_process_series():
    rng = np.random.default_rng(8)
    v = rng.normal(5, 0.5, 300)
    v[100] += 40
    v[200:] += 10
    t = np.arange(300, dtype=np.int64)
    t1, v1 = K.process_series(t, v)
    t2, v2 = run_steps(t.copy(), v.copy(), default_steps())
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(v1, v2)


def test_custom_step_registration():
    register_step("clip", lambda t, v, **kw: np.where(v > kw["hi"])[0],
                  lambda t, v, idx, **kw: (t, np.minimum(v, kw["hi"])))
    step = make_step("clip", {"hi": 10.0}, {"hi": 10.0})
    t = np.arange(5, dtype=np.int64)
    v = np.array([1.0, 50.0, 2.0, 3.0, 99.0])
    _, v2 = run_steps(t, v, [step])
    assert v2.max() == 10.0


def test_step_order_matters():
    steps = [make_step("global_mad", {"threshold": 3.0}, {"threshold": 3.0})]
    t = np.arange(10, dtype=np.int64)
    v = np.array([1.0, 1.1, 0.9, 1.0, 1.2, 100.0, 0.8, 1.0, 1.1, 0.9])
    _, v2 = run_steps(t, v, steps)
    assert v2[5] == pytest.approx(np.nanmedian(v))


# --- reports (K1/K2, A7, J4) ----------------------------------------------

def test_write_csv_safely_dataframe(tmp_path):
    from series_correction_project_updated_ray.pipelines.reports import (
        write_csv_safely)
    df = pd.DataFrame({"a": ["=cmd()", "ok"], "b": [1, 2]})
    out = tmp_path / "x.csv"
    write_csv_safely(df, str(out), index=False)
    text = out.read_text()
    assert "'=cmd()" in text


def test_write_csv_safely_dataset(ray_session, tmp_path):
    import ray.data as rd
    from series_correction_project_updated_ray.pipelines.reports import (
        write_csv_safely)
    ds = rd.from_pandas(pd.DataFrame({"a": ["+inj", "fine"]}))
    out = str(tmp_path / "ds_csv")
    write_csv_safely(ds, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    joined = "".join(open(os.path.join(out, f)).read() for f in files)
    assert "'+inj" in joined


def test_per_file_summary(ray_session):
    import ray.data as rd
    from series_correction_project_updated_ray.pipelines.reports import (
        per_file_summary)
    rows = []
    for y in (1, 2):
        v = np.full(20, 5.0)
        v[3] = 50.0  # one clear outlier
        for i, x in enumerate(v):
            rows.append(("26", y, float(i), x))
    df = pd.DataFrame(rows, columns=["series", "year_idx", "Time (Seconds)",
                                     "Value2"])
    s = per_file_summary(rd.from_pandas(df)).to_pandas() \
        .sort_values("Y_Index").reset_index(drop=True)
    assert len(s) == 2
    assert (s["Outlier_Count"] == 1).all()
    assert (s["Records"] == 20).all()
    assert s["Median"].iloc[0] == 5.0


def test_overview_table():
    from series_correction_project_updated_ray.pipelines.reports import (
        overview_table)
    log = pd.DataFrame([{
        "Series": "S26", "Year_Pair_Outlier": "1995 (Y01) to 1996 (Y02)",
        "Sensor": "Sensor 3", "Original_Difference_Summary": 2.5,
        "Calculated_Level_Shift": 1.23456, "Correction_Type": "Level Shift",
        "File_Corrected": "S26_Y02_refined_corrected.csv",
        "Rationale": "x"}])
    avgs = pd.DataFrame([
        {"Series": "S26", "Year_Num_YY": 1, "Begin_Avg": 4.1, "End_Avg": 4.9},
        {"Series": "S26", "Year_Num_YY": 2, "Begin_Avg": 5.0, "End_Avg": 5.2}])
    out = overview_table(log, avgs)
    assert len(out) == 1
    assert out["Prev_End_Avg"].iloc[0] == 4.9
    assert out["Next_Begin_Avg"].iloc[0] == 5.0
    assert out["Level_Shift"].iloc[0] == 1.235  # safe_round to 3


def test_match_processed_filename():
    from series_correction_project_updated_ray.functions.parsing import (
        match_processed_filename)
    assert match_processed_filename("Series26_File03_Processed.xlsx") == ("series", 3)
    assert match_processed_filename("Year_1997 (Y03)_Data.xlsx") == ("year", 3)
    assert match_processed_filename("Seatek_Analysis_Summary.xlsx") is None
    # memoized second call
    assert match_processed_filename("Year_1997 (Y03)_Data.xlsx") == ("year", 3)
