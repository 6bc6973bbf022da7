"""Seatek wide-file source, compat batch correction, level-shift workflow,
comparison export — including direct parity against the reference
implementation (used as an oracle; skipped when absent)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def seatek_dir(tmp_path_factory):
    from series_correction_project_updated_ray.sources.seatek import (
        write_seatek_fixture)
    p = str(tmp_path_factory.mktemp("seatek") / "data")
    write_seatek_fixture(p, series_ids=("26", "27"), n_years=3, rows=60)
    return p


def test_discover_files(seatek_dir):
    from series_correction_project_updated_ray.sources.seatek import (
        discover_files)
    files = discover_files(seatek_dir)
    assert len(files) == 6
    assert files[0][:2] == ("26", 1)
    only = discover_files(seatek_dir, series=["27"], year_range=(2, 3))
    assert [(s, y) for s, y, _ in only] == [("27", 2), ("27", 3)]


def test_read_seatek_long(ray_session, seatek_dir):
    from series_correction_project_updated_ray.sources.seatek import read_seatek
    df = read_seatek(seatek_dir, mode="long").to_pandas()
    assert len(df) == 6 * 60 * 32
    assert set(df["sensor_id"].unique()) == set(range(1, 33))
    one = df[(df["series"] == "26") & (df["year_idx"] == 1)
             & (df["sensor_id"] == 1)].sort_values("t")
    assert len(one) == 60
    assert (np.diff(one["t"]) == 13090).all()


def test_read_seatek_compat_naming(ray_session, seatek_dir):
    from series_correction_project_updated_ray.sources.seatek import read_seatek
    df = read_seatek(seatek_dir, mode="compat").to_pandas()
    assert "Time (Seconds)" in df.columns
    assert "Value2" in df.columns and "Value33" in df.columns
    assert len(df) == 6 * 60


def test_batch_correct_and_summary(ray_session, seatek_dir):
    from series_correction_project_updated_ray.pipelines.seatek_compat import (
        batch_correct, summarize)
    corrected = batch_correct(seatek_dir).materialize()
    df = corrected.to_pandas()
    assert (df["status"] == "Processed").all()
    summary = summarize(corrected)
    assert list(summary.columns) == ["Series", "Year", "Y-Index", "Filename",
                                     "Status", "Records"]
    assert len(summary) == 6
    assert summary["Year"].tolist()[:3] == [1995, 1996, 1997]
    assert summary["Filename"].iloc[0] == "Year_1995 (Y01)_Data.xlsx"


def _assert_process_frame_parity(files):
    """Point-for-point process_frame vs reference process_data over the
    given [(sid, yidx, path)] list (the reference acts as oracle only)."""
    import logging
    logging.disable(logging.CRITICAL)
    sys.path.insert(0, REFERENCE)
    from scripts.processor import process_data as ref_process
    from series_correction_project_updated_ray.pipelines.seatek_compat import (
        process_frame)
    from series_correction_project_updated_ray.sources.seatek import (
        parse_seatek_text)

    for sid, yidx, path in files:
        with open(path, "rb") as f:
            arr = parse_seatek_text(f.read())
        cols = {"Time (Seconds)": arr[:, 0]}
        for j in range(1, arr.shape[1]):
            cols[f"Value{j + 1}"] = arr[:, j]
        df = pd.DataFrame(cols)
        want = ref_process(df.copy())
        got = process_frame(df.copy())
        assert len(want) == len(got), (sid, yidx)
        for c in want.columns:
            np.testing.assert_allclose(
                want[c].to_numpy(float), got[c].to_numpy(float),
                equal_nan=True, err_msg=f"{sid}/{yidx}/{c}")


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_process_frame_parity_with_reference(seatek_dir):
    """Our compat frame kernel vs the reference process_data, point for
    point, on every fixture file."""
    from series_correction_project_updated_ray.sources.seatek import (
        discover_files)
    _assert_process_frame_parity(discover_files(seatek_dir))


@pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, "data")),
                    reason="reference corpus absent")
def test_process_frame_parity_real_corpus():
    """Same point-for-point parity over the reference's REAL shipped
    corpus (38 S*_Y*.txt files, ~10k rows) — covers the tied-zeros sort
    quirk and the Value2-only correction path on production-shaped
    data."""
    from series_correction_project_updated_ray.sources.seatek import (
        discover_files)
    files = discover_files(os.path.join(REFERENCE, "data"))
    assert len(files) >= 38, "expected the full real corpus"
    _assert_process_frame_parity(files)


def test_level_shift_workflow(ray_session, seatek_dir):
    from series_correction_project_updated_ray.pipelines.levelshift import (
        apply_level_shifts, correction_log)
    from series_correction_project_updated_ray.sources.seatek import read_seatek
    long_ds = read_seatek(seatek_dir, mode="long")
    yty = pd.DataFrame({
        "Year_Pair": ["1995 (Y01) to 1996 (Y02)", "1996 (Y02) to 1997 (Y03)"],
        **{f"Sensor {i}": [0.0, 0.0] for i in range(1, 33)},
    })
    yty["Sensor 3"] = [2.5, -1.4]   # |diff| >= 0.1 → corrections fire
    yty["Sensor 7"] = [0.05, 0.0]   # below threshold → ignored
    shifted, plan = apply_level_shifts(long_ds, yty)
    assert len(plan) == 2
    assert (plan["series"] == "26").all()  # first sorted series wins
    out = shifted.to_pandas()
    log = correction_log(shifted, plan)
    assert len(log) == 2
    assert (log["Correction_Type"] == "Level Shift").all()
    assert log["File_Corrected"].tolist() == [
        "S26_Y02_refined_corrected.csv", "S26_Y03_refined_corrected.csv"]
    # fold semantics: after alignment, year means of sensor 3 are close
    s3 = out[(out["series"] == "26") & (out["sensor_id"] == 3)]
    tail = s3[s3["year_idx"] == 1].sort_values("t")["value_shifted"].tail(5)
    head = s3[s3["year_idx"] == 2].sort_values("t")["value_shifted"].head(5)
    from series_correction_project_updated_ray.kernels import nonzero_mean
    assert abs(nonzero_mean(tail.to_numpy()) - nonzero_mean(head.to_numpy())) < 1e-9
    # untouched sensor unchanged
    s7 = out[(out["series"] == "27") & (out["sensor_id"] == 7)]
    np.testing.assert_array_equal(s7["value"], s7["value_shifted"])


def test_level_shift_accumulation_reference_vectors(ray_session):
    """Reference fixture: prev year constant 10/20, next year 1/2 → after
    two shifts next-year sensors equal 10 and 20
    (test_apply_refined_corrections.py:79-127)."""
    import ray.data as rd
    from series_correction_project_updated_ray.pipelines.levelshift import (
        apply_level_shifts)
    rows = []
    for yi, (a, b) in ((1, (10.0, 20.0)), (2, (1.0, 2.0))):
        for k in range(5):
            rows.append(("26", yi, 1, k + yi * 100, a))
            rows.append(("26", yi, 2, k + yi * 100, b))
    long_df = pd.DataFrame(rows, columns=["series", "year_idx", "sensor_id",
                                          "t", "value"])
    yty = pd.DataFrame({"Year_Pair": ["1995 (Y01) to 1996 (Y02)"],
                        "Sensor 1": [9.0], "Sensor 2": [18.0]})
    shifted, plan = apply_level_shifts(rd.from_pandas(long_df), yty)
    out = shifted.to_pandas()
    y2s1 = out[(out["year_idx"] == 2) & (out["sensor_id"] == 1)]
    y2s2 = out[(out["year_idx"] == 2) & (out["sensor_id"] == 2)]
    np.testing.assert_allclose(y2s1["value_shifted"], 10.0)
    np.testing.assert_allclose(y2s2["value_shifted"], 20.0)


def test_comparison_export(ray_session, seatek_dir):
    from series_correction_project_updated_ray.pipelines.comparison import (
        export_comparisons)
    from series_correction_project_updated_ray.pipelines.seatek_compat import (
        batch_correct)
    from series_correction_project_updated_ray.sources.seatek import read_seatek
    raw = read_seatek(seatek_dir, mode="compat")
    corrected = batch_correct(seatek_dir).drop_columns(["status"])
    comp = export_comparisons(raw, corrected).to_pandas()
    assert {"Value2_raw", "Value2_processed", "Outlier_Flag"} <= set(comp.columns)
    assert len(comp) >= 6 * 60
    assert comp["Outlier_Flag"].dtype == bool


def test_correct_all_sensors_long(ray_session, seatek_dir):
    from series_correction_project_updated_ray.pipelines.seatek_compat import (
        correct_all_sensors)
    out = correct_all_sensors(seatek_dir).to_pandas()
    # every (series, year, sensor) combination present
    combos = out.groupby(["series", "year_idx", "sensor_id"]).size()
    assert len(combos) == 2 * 3 * 32
    # uniform cadence -> no gap insertion; injected Value3 outlier corrected
    assert (~out["inserted"]).all()
    s3 = out[(out["series"] == "26") & (out["year_idx"] == 1)
             & (out["sensor_id"] == 2)].sort_values("t")
    assert s3["value_corrected"].max() < 20.0  # the +25 spike is gone


def test_fallback_processing_mode(ray_session, tmp_path, seatek_dir):
    """Reference _process_fallback_mode (batch_correction.py:519-581):
    no discoverable files -> process config raw_data lists, K5 output
    names, summary rows with Year=None; empty files skipped; bad files
    downgrade to Failed rows; parity of Records vs process_frame."""
    from series_correction_project_updated_ray.pipelines.seatek_compat import (
        batch_process, process_frame)
    from series_correction_project_updated_ray.sources.seatek import (
        load_raw_frame)

    raw1 = str(tmp_path / "raw1.txt")
    raw2 = str(tmp_path / "raw2.txt")
    empty = str(tmp_path / "empty.txt")
    rng = np.random.default_rng(7)
    for p, n in [(raw1, 40), (raw2, 25)]:
        with open(p, "w") as f:
            f.write("# comment line\n\n")
            for i in range(n):
                f.write(f"{1.0 + i * 0.13:.2f} {rng.normal(5, 0.5):.2f} "
                        f"{i * 13090}\n")
    open(empty, "w").close()

    cfg = {"series": {"26": {"raw_data": [raw1, empty]},
                      "27": {"raw_data": [raw2]},
                      "28": {"raw_data": [str(tmp_path / "missing.txt")]}}}
    nofiles = str(tmp_path / "nofiles")
    os.makedirs(nofiles)
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)

    summary = batch_process(nofiles, cfg, output_dir=outdir, dry_run=False)
    assert list(summary.columns) == ["Series", "Year", "Y-Index", "Filename",
                                     "Status", "Records"]
    assert summary["Year"].isna().all()
    # empty file yields NO row (reference's `if not df.empty` guard)
    assert len(summary) == 3
    ok = summary[summary["Status"] == "Fallback Processed"]
    assert set(zip(ok["Series"], ok["Y-Index"])) == {(26, 1), (27, 1)}
    bad = summary[summary["Status"] == "Failed (Processing Error)"]
    assert list(bad["Series"]) == [28] and list(bad["Records"]) == [0]
    # Records parity with the (reference-parity-certified) frame kernel
    for sid, path in [(26, raw1), (27, raw2)]:
        expect = len(process_frame(load_raw_frame(path)))
        got = int(summary.loc[summary["Series"] == sid, "Records"].iloc[0])
        assert got == expect
    # K5 naming: Series{id}_File{i:02d}_Processed.{xlsx|csv}
    names = sorted(os.listdir(outdir))
    stems = {n.rsplit(".", 1)[0] for n in names}
    assert stems == {"Series26_File01_Processed", "Series27_File01_Processed"}

    # discovery NON-empty -> main mode wins (same decision as reference)
    main = batch_process(seatek_dir, cfg)
    assert (main["Status"] == "Processed").all() and len(main) == 6


def test_load_raw_frame_semantics(tmp_path):
    """All-or-nothing numeric conversion + naming, vs parse_seatek_text's
    coerce (reference _load_raw_data keeps bad columns as strings)."""
    from series_correction_project_updated_ray.sources.seatek import (
        load_raw_frame)
    p = str(tmp_path / "mixed.txt")
    with open(p, "w") as f:
        f.write("1.0 abc 100\n2.0 3.5 200\n")
    df = load_raw_frame(p)
    assert list(df.columns) == ["Time (Seconds)", "Value2", "Value3"]
    assert df["Value2"].dtype == object          # poisoned column stays str
    assert df["Value3"].dtype == np.int64
    assert load_raw_frame(str(tmp_path / "mixed.txt")) is not None
    open(str(tmp_path / "none.txt"), "w").close()
    assert load_raw_frame(str(tmp_path / "none.txt")).empty
