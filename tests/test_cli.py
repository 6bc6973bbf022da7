"""CLI surface tests (subprocess — each command owns its Ray session)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "series_correction_project_updated_ray", *argv],
        env=env, capture_output=True, text=True, cwd="/tmp")


@pytest.fixture(scope="module")
def cli_dirs(tmp_path_factory):
    from series_correction_project_updated_ray.sources.seatek import (
        write_seatek_fixture)
    from series_correction_project_updated_ray.sources.sequences import (
        write_synthetic_sequences)
    root = tmp_path_factory.mktemp("cli")
    write_seatek_fixture(str(root / "seatek"), n_years=2, rows=40)
    write_synthetic_sequences(str(root / "seqs"), 600, seed=5,
                              rows_per_file=200)
    return root


def test_cli_seatek_dry_run(cli_dirs):
    r = _run("seatek-correct", "--data-dir", str(cli_dirs / "seatek"),
             "--dry-run", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-500:]
    assert "Year_1995 (Y01)_Data.xlsx" in r.stdout
    assert "Processed" in r.stdout


def test_cli_rollup_and_skew_report(cli_dirs):
    out = str(cli_dirs / "out")
    r = _run("rollup", "--input", str(cli_dirs / "seqs"), "--output", out,
             "--n-partitions", "4", "--step-seconds", "1", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["partitions_processed"] == 4
    assert payload["rows_in"] == 600
    # resume: immediate rerun is a committed no-op
    r2 = _run("rollup", "--input", str(cli_dirs / "seqs"), "--output", out,
              "--n-partitions", "4", "--step-seconds", "1", "--num-cpus", "4")
    assert json.loads(r2.stdout.strip().splitlines()[-1])[
        "partitions_processed"] == 0
    r3 = _run("skew-report", "--output", out)
    assert r3.returncode == 0
    assert "rows_per_s" in r3.stdout


def test_cli_unknown_command():
    r = _run("definitely-not-a-command")
    assert r.returncode != 0


def test_cli_ingest_incremental(cli_dirs, tmp_path_factory):
    import pyarrow.parquet as pq
    root = tmp_path_factory.mktemp("ingest")
    src = pq.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["event_type", "ts", "value"])
    for i in range(2):
        pq.write_table(src.slice(i * 2000, 2000),
                       str(root / f"wave{i}.parquet"))
    store = str(root / "store")
    r1 = _run("ingest", "--store", store, "--files",
              str(root / "wave0.parquet"), "--width", "3600",
              "--num-cpus", "4")
    assert r1.returncode == 0, r1.stderr[-500:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["new_files"] == 1 and out1["live_deltas"] == 1
    # second call sees both files, ingests only the new one, compacts
    r2 = _run("ingest", "--store", store, "--files",
              str(root / "wave0.parquet"), str(root / "wave1.parquet"),
              "--width", "3600", "--compact", "--num-cpus", "4")
    assert r2.returncode == 0, r2.stderr[-500:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["new_files"] == 1
    assert out2["total_files"] == 2
    assert out2["live_deltas"] == 1  # compacted


def test_cli_seatek_fallback_mode(cli_dirs, tmp_path_factory):
    """No discoverable files + --config raw_data lists -> fallback rows."""
    root = tmp_path_factory.mktemp("fb")
    raw = root / "raw1.txt"
    with open(raw, "w") as f:
        for i in range(30):
            f.write(f"{1.0 + i * 0.13:.2f} {5.0 + (i % 3) * 0.2:.2f} "
                    f"{i * 13090}\n")
    cfg = root / "cfg.json"
    cfg.write_text(json.dumps(
        {"series": {"26": {"raw_data": [str(raw)]}}}))
    empty = root / "nofiles"
    empty.mkdir()
    r = _run("seatek-correct", "--data-dir", str(empty),
             "--config", str(cfg), "--dry-run", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-500:]
    assert "Fallback Processed" in r.stdout
    assert "raw1.txt" in r.stdout


def test_cli_analyze_mutates_config_and_runs(cli_dirs, tmp_path_factory):
    """run_analysis.py twin: the --set override (default
    defaults.threshold=3.0) is persisted into the config file, then the
    batch correction runs over the data dir."""
    root = tmp_path_factory.mktemp("an")
    cfg = root / "config.json"
    cfg.write_text(json.dumps({"defaults": {"threshold": 2.0,
                                            "window_size": 5}}))
    r = _run("analyze", "--config", str(cfg),
             "--data-dir", str(cli_dirs / "seatek"),
             "--output", str(root / "out"),
             "--dry-run", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-500:]
    assert "set defaults.threshold = 3.0" in r.stdout
    assert "Processed" in r.stdout
    saved = json.loads(cfg.read_text())
    assert saved["defaults"]["threshold"] == 3.0
    assert saved["defaults"]["window_size"] == 5  # untouched keys kept

    def _records(stdout):
        return sum(int(line.split()[-1]) for line in stdout.splitlines()
                   if "Processed" in line)
    base_records = _records(r.stdout)

    # explicit override path, non-default value, nested creation — AND
    # the mutated config must reach the kernels: an aggressive gap
    # threshold inserts more rows, so Records must grow vs the default
    r = _run("analyze", "--config", str(cfg),
             "--data-dir", str(cli_dirs / "seatek"),
             "--output", str(root / "out2"),
             "--set", "defaults.gap_threshold_factor=0.5",
             "--set", "processor.outlier_method=\"median\"",
             "--dry-run", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-500:]
    saved = json.loads(cfg.read_text())
    assert saved["defaults"]["gap_threshold_factor"] == 0.5
    assert saved["processor"]["outlier_method"] == "median"
    assert _records(r.stdout) > base_records
