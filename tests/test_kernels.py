"""Kernel parity tests.

Vectors ported from the reference suite
(/root/reference/scripts/tests/test_processor.py,
test_processor_jumps.py, test_discontinuity_utils.py,
test_updated_processor.py, test_apply_refined_corrections.py) — expected
values are the reference tests' own assertions.
"""

import numpy as np
import pytest

from series_correction_project_updated_ray import kernels as K


# --- Hampel outliers -------------------------------------------------------

def test_outlier_basic():
    v = [1.0, 1.1, 0.9, 1.0, 100.0, 1.2, 0.8, 1.0, 1.1, 0.9]
    assert K.hampel_outliers(np.array(v), 5, 3.0).tolist() == [4]


def test_outlier_none():
    v = [1.0, 1.1, 0.9, 1.0, 1.2, 0.8, 1.0, 1.1, 0.9]
    assert K.hampel_outliers(np.array(v), 5, 3.0).tolist() == []


def test_outlier_short():
    assert K.hampel_outliers(np.array([1.0, 1.1, 100.0]), 5, 3.0).tolist() == []


def test_outlier_nan():
    v = [1.0, 1.1, np.nan, 1.0, 100.0, 1.2, np.nan, 1.0, 1.1, 0.9]
    assert K.hampel_outliers(np.array(v), 3, 3.0).tolist() == [4]


def test_outlier_zero_mad():
    v = [1.0, 1.0, 1.0, 100.0, 1.0, 1.0, 1.0]
    assert K.hampel_outliers(np.array(v), 5, 3.0).tolist() == [3]


def test_outlier_comparison_variant_matches_on_vectors():
    # Same results on the reference vectors; the variants differ only in the
    # zero-MAD epsilon tier (threshold*1e-6 vs 1e-6).
    v = np.array([1.0, 1.0, 1.0, 100.0, 1.0, 1.0, 1.0])
    assert K.hampel_outliers(v, 5, 3.0, variant="comparison").tolist() == [3]
    # Divergence case: abs_diff between 1e-6 and threshold*1e-6
    v2 = np.array([1.0, 1.0, 1.0, 1.0 + 2e-6, 1.0, 1.0, 1.0])
    assert K.hampel_outliers(v2, 5, 3.0, variant="processor").tolist() == []
    assert K.hampel_outliers(v2, 5, 3.0, variant="comparison").tolist() == [3]


# --- CUSUM jumps -----------------------------------------------------------

def test_jump_small():
    assert K.cusum_jumps(np.array([1.0, 2.0]), 3, 2.0).tolist() == []


def test_jump_basic():
    v = [1.0, 1.0, 1.1, 0.9, 1.0, 10.0, 10.1, 9.9, 10.0, 10.0]
    assert K.cusum_jumps(np.array(v), 3, 3.0).tolist() == [5]


def test_jump_matches_python_loop_reference():
    """Cross-check vectorized CUSUM scan against a literal port of the
    reference Python loop on a random series."""
    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, 500)
    v[200:] += 6.0
    v[400:] -= 4.0
    w, thr = 5, 3.0
    dev = K.cusum_deviations(v, w)
    jumps, c = [], 0.0
    for i in range(w, len(v)):
        c += dev[i]
        if abs(c) > thr:
            jumps.append(i)
            c = 0.0
    assert K.cusum_jumps(v, w, thr).tolist() == jumps


def test_jump_quantized_matches_literal_int_fold():
    """Quantized CUSUM vs a literal integer-fold port (the exact contract
    the DuckDB recursive-CTE oracle replicates)."""
    rng = np.random.default_rng(11)
    v = rng.normal(0, 1, 400)
    v[150:] += 5.0
    w, thr = 5, 3.0
    dev = K.cusum_deviations(v, w)
    q = np.round(dev[w:] * 1_000_000).astype(np.int64)
    jumps, c = [], 0
    for i, d in enumerate(q.tolist()):
        c += d
        if abs(c) > 3_000_000:
            jumps.append(i + w)
            c = 0
    assert K.cusum_jumps_quantized(v, w, thr).tolist() == jumps
    # micro-quantization does not move crossings on generic data
    assert K.cusum_jumps_quantized(v, w, thr).tolist() == \
        K.cusum_jumps(v, w, thr).tolist()


def test_jump_quantized_small_and_compose():
    assert K.cusum_jumps_quantized(np.array([1.0, 2.0]), 3, 2.0).tolist() == []
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, 120)
    v[60:] += 30.0
    jq = K.cusum_jumps_quantized(v, 5, 3.0)
    assert 60 in jq.tolist()
    out = K.correct_jumps(v, jq, 5)
    assert len(out) == len(v)
    # the +30 shelf is pulled back toward the base level
    assert abs(np.median(out[70:]) - np.median(v[:50])) < \
        abs(np.median(v[70:]) - np.median(v[:50]))


# --- gap detection ---------------------------------------------------------

def test_gap_basic():
    t = np.array([1.0, 2.0, 3.0, 10.0, 11.0, 12.0])
    assert K.detect_gaps(t, 3.0).tolist() == [3]


def test_gap_none():
    assert K.detect_gaps(np.arange(1.0, 7.0), 3.0).tolist() == []


def test_gap_small():
    assert K.detect_gaps(np.array([1.0]), 3.0).tolist() == []


def test_gap_zero_median():
    assert K.detect_gaps(np.array([1.0, 1.0, 1.0, 1.0, 2.0])).tolist() == []


def test_gap_ties():
    assert K.detect_gaps(np.array([1.0, 1.0, 1.0])).tolist() == []


# --- gap fill --------------------------------------------------------------

def test_gap_fill_times_params():
    # step=10, t_before=10, t_after=40 → 2 missing at [20, 30]
    t = np.array([0, 10, 40, 50], dtype=np.int64)
    new = K.gap_fill_times(t, np.array([2]))
    assert new.tolist() == [20, 30]
    assert new.dtype == np.int64


def test_gap_fill_no_prior_uses_following_step():
    t = np.array([0, 50, 60, 70], dtype=np.int64)
    new = K.gap_fill_times(t, np.array([1]))
    # step from following = 10 → round(50/10)-1 = 4 missing at 10,20,30,40
    assert new.tolist() == [10, 20, 30, 40]


def test_gap_fill_zero_missing():
    t = np.array([0, 10, 20], dtype=np.int64)
    assert len(K.gap_fill_times(t, np.array([1]))) == 0


def test_correct_gaps_interpolates():
    t = np.array([1, 2, 3, 10, 11, 12], dtype=np.int64)
    v = np.array([1.0, 1.0, 3.0, 10.0, 10.0, 10.0])
    t2, v2 = K.correct_gaps(t, v, K.detect_gaps(t, 3.0))
    assert t2.tolist() == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    # positional-linear between v=3.0 (pos 2) and v=10.0 (pos 9)
    expected = np.interp(np.arange(12), [0, 1, 2, 9, 10, 11],
                         [1.0, 1.0, 3.0, 10.0, 10.0, 10.0])
    np.testing.assert_allclose(v2, expected)


# --- jump correction -------------------------------------------------------

def test_correct_jumps_empty():
    v = np.array([1.0, 1.1, 1.2, 1.0, 1.1])
    np.testing.assert_array_equal(K.correct_jumps(v, np.array([])), v)


def test_correct_jumps_basic():
    v = np.array([1.0] * 5 + [10.0] * 5)
    np.testing.assert_allclose(K.correct_jumps(v, [5], 2), np.ones(10))


def test_correct_jumps_multiple_offsets_from_original():
    v = np.array([1.0] * 5 + [10.0] * 5 + [5.0] * 5)
    np.testing.assert_allclose(K.correct_jumps(v, [5, 10], 2), np.ones(15))


def test_correct_jumps_boundary_ignored():
    v = np.ones(10)
    np.testing.assert_array_equal(
        K.correct_jumps(v, [0, 1, 2, 7, 8, 9], 3), v)


def test_correct_jumps_nan_windows():
    v = np.array([1.0, np.nan, 1.0, 10.0, np.nan, 10.0, 10.0, 10.0])
    out = K.correct_jumps(v, [3], 3)
    expected = np.array([1.0, np.nan, 1.0, 1.0, np.nan, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(out, expected)


# --- outlier correction ----------------------------------------------------

def test_correct_outliers_median():
    v = np.array([1.0, 1.1, 0.9, 1.0, 100.0, 1.2, 0.8, 1.0, 1.1, 0.9])
    out = K.correct_outliers(v, [4], 5, "median")
    # centered window 5 at idx 4 with outlier masked: [0.9,1.0,nan,1.2,0.8]
    assert out[4] == pytest.approx(np.nanmedian([0.9, 1.0, np.nan, 1.2, 0.8]))
    np.testing.assert_array_equal(out[:4], v[:4])


def test_correct_outliers_interpolate():
    v = np.array([1.0, 2.0, 100.0, 4.0, 5.0])
    out = K.correct_outliers(v, [2], 5, "interpolate")
    assert out[2] == pytest.approx(3.0)


def test_correct_outliers_remove():
    v = np.array([1.0, 2.0, 100.0, 4.0])
    out = K.correct_outliers(v, [2], 5, "remove")
    assert np.isnan(out[2])


def test_correct_outliers_unknown_method_noop():
    v = np.array([1.0, 2.0, 100.0, 4.0])
    np.testing.assert_array_equal(K.correct_outliers(v, [2], 5, "bogus"), v)


# --- global MAD variant ----------------------------------------------------

def test_global_mad():
    v = np.array([1.0, 1.1, 0.9, 1.0, 1.2, 100.0, 0.8, 1.0, 1.1, 0.9])
    corrected, mask = K.global_mad_outliers(v, 3.0)
    assert mask.tolist() == [False] * 5 + [True] + [False] * 4
    assert corrected[5] == pytest.approx(np.nanmedian(v))


# --- level shift -----------------------------------------------------------

def test_nonzero_mean():
    assert K.nonzero_mean(np.array([0.0, 2.0, 4.0, np.nan])) == 3.0
    assert K.nonzero_mean(np.array([0.0, 0.0])) == 0.0
    assert K.nonzero_mean(np.array([])) == 0.0


def test_level_shift_fold_aligns_constant_segments():
    # reference: prev year constant 10, next year constant 1 → next becomes 10
    segs = [np.full(5, 10.0), np.full(5, 1.0)]
    out, shifts = K.level_shift_fold(segs)
    np.testing.assert_allclose(out[1], np.full(5, 10.0))
    assert shifts == [0.0, 9.0]


def test_level_shift_fold_accumulates():
    # three segments 10 → 1 → 5: seg2 aligns to corrected seg1 (=10)
    segs = [np.full(5, 10.0), np.full(5, 1.0), np.full(5, 5.0)]
    out, _ = K.level_shift_fold(segs)
    for o in out:
        np.testing.assert_allclose(o, np.full(5, 10.0))


def test_level_shift_short_segment_skipped():
    segs = [np.full(5, 10.0), np.full(3, 1.0)]
    out, shifts = K.level_shift_fold(segs)
    np.testing.assert_allclose(out[1], np.full(3, 1.0))
    assert np.isnan(shifts[1])


# --- fused pipeline --------------------------------------------------------

def test_process_series_end_to_end():
    t = np.arange(20, dtype=np.int64)
    v = np.ones(20)
    v[7] = 100.0  # outlier
    t2, v2 = K.process_series(t, v)
    assert len(t2) == 20
    np.testing.assert_allclose(v2, np.ones(20))


def test_process_series_gap_expansion():
    t = np.array([0, 1, 2, 3, 10, 11, 12, 13], dtype=np.int64)
    v = np.ones(8)
    t2, v2 = K.process_series(t, v)
    assert t2.tolist() == list(range(14))
    np.testing.assert_allclose(v2, np.ones(14))


# --- rollup ----------------------------------------------------------------

def test_rollup_series_basic():
    t = np.array([0, 30, 60, 90, 3600], dtype=np.int64)
    v = np.array([1.0, 3.0, 5.0, 7.0, 9.0])
    r = K.rollup_series(t, v, 60)
    assert r["window_start"].tolist() == [0, 60, 3600]
    assert r["min"].tolist() == [1.0, 5.0, 9.0]
    assert r["max"].tolist() == [3.0, 7.0, 9.0]
    assert r["sum"].tolist() == [4.0, 12.0, 9.0]
    assert r["count"].tolist() == [2, 2, 1]


def test_rollup_skips_nan():
    t = np.array([0, 30], dtype=np.int64)
    v = np.array([np.nan, 2.0])
    r = K.rollup_series(t, v, 60)
    assert r["count"].tolist() == [1]
    assert r["sum"].tolist() == [2.0]


def test_rollup_cascade_matches_direct():
    rng = np.random.default_rng(3)
    t = np.sort(rng.integers(0, 200_000, 5000)).astype(np.int64)
    v = rng.normal(10, 2, 5000)
    m1 = K.rollup_series(t, v, 60)
    h_direct = K.rollup_series(t, v, 3600)
    h_cascade = K.rollup_cascade(m1, 3600)
    for k in ("window_start", "min", "max", "count"):
        np.testing.assert_array_equal(h_cascade[k], h_direct[k])
    np.testing.assert_allclose(h_cascade["sum"], h_direct["sum"], rtol=1e-12)


def test_rollup_cascade_1d():
    rng = np.random.default_rng(4)
    t = np.sort(rng.integers(0, 5_000_000, 20000)).astype(np.int64)
    v = rng.normal(0, 1, 20000)
    m1 = K.rollup_series(t, v, 60)
    h1 = K.rollup_cascade(m1, 3600)
    d1 = K.rollup_cascade(h1, 86400)
    d_direct = K.rollup_series(t, v, 86400)
    np.testing.assert_array_equal(d1["window_start"], d_direct["window_start"])
    np.testing.assert_array_equal(d1["count"], d_direct["count"])
    np.testing.assert_allclose(d1["min"], d_direct["min"])
