"""Wave-13a operators: planted closed-form discriminator fixtures (the
round-12 lesson: replays that mirror the engine formula are blind to
shared errors — planted fixtures with textbook-derived expectations are
not), plus numpy replays where the replay is genuinely independent."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _events_frame(values, event_types, ts, user_ids=None):
    n = len(values)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(ts),
            "user_id": np.asarray(
                user_ids if user_ids is not None else np.arange(n),
                dtype=np.int64,
            ),
            "event_type": event_types,
            "value": np.asarray(values, dtype=np.float64),
            "props": "{}",
        }
    )


def _bucket_series_frame(series, metric="m"):
    """One event per 5-minute bucket so the AR(2) bucket mean is exact."""
    t0 = pd.Timestamp("2024-01-01")
    ts = [t0 + pd.Timedelta(seconds=300 * i) for i in range(len(series))]
    return _events_frame(series, [metric] * len(series), ts)


def _period3(n, base=(10.0, 14.0, 12.0)):
    return [base[i % 3] for i in range(n)]


# ---------------------------------------------------------------------------
# Durbin-Watson
# ---------------------------------------------------------------------------


def test_dw_perfect_ar2_fit_is_degenerate(spark, tmp_path):
    """A pure period-3 cycle satisfies an exact order-2 recurrence
    (phase-system determinant 12 != 0), so OLS recovers it exactly up
    to e6 coefficient rounding and every residual e3-quantizes to 0:
    the degenerate row must appear (not silently drop), dw = 0."""
    _bucket_series_frame(_period3(120)).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_durbin_watson", str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert bool(row["degenerate"])
    assert int(row["dw_e6"]) == 0
    assert not bool(row["positive_autocorr"])
    assert not bool(row["negative_autocorr"])


def test_dw_discriminates_residual_memory(spark, tmp_path):
    """A SMALL period-12 sinusoid rides a dominant period-3 carrier:
    OLS spends the AR(2) root pair on the carrier, so the smooth
    sinusoid survives into the residuals (lag-1 autocorrelation
    ~cos(2pi/12) = +0.87, DW << 2). A small alternating disturbance
    survives the same way with r_1 ~ -1 (DW > 2). The planted ordering
    is textbook, not a mirror of the engine arithmetic."""
    n = 240
    base = np.array(_period3(n))
    slow = base + 0.5 * np.sin(2 * np.pi * np.arange(n) / 12)
    alt = base + np.where(np.arange(n) % 2 == 0, 0.5, -0.5)

    _bucket_series_frame(slow).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    dw_slow = int(
        _collect(spark, "timeseries_durbin_watson", str(tmp_path))["dw_e6"].iloc[0]
    )
    _bucket_series_frame(alt).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    dw_alt = int(
        _collect(spark, "timeseries_durbin_watson", str(tmp_path))["dw_e6"].iloc[0]
    )
    assert dw_slow < 1_500_000, dw_slow  # long-memory residuals flag
    assert dw_alt > 2_500_000, dw_alt  # alternating residuals flag
    assert dw_slow < dw_alt


def test_dw_smoke_bounds(spark):
    out = _collect(spark, "timeseries_durbin_watson")
    assert len(out) == 5
    assert not out["degenerate"].any()
    # DW is bounded in [0, 4]
    assert (out["dw_e6"] >= 0).all() and (out["dw_e6"] <= 4_000_000).all()


# ---------------------------------------------------------------------------
# Ljung-Box on AR(2) residuals
# ---------------------------------------------------------------------------


def test_lb_resid_discriminates_whiteness(spark, tmp_path):
    """The surviving period-12 sinusoid residual stream must reject
    whiteness (r_1..r_8 load the cosine taper — Q explodes)."""
    n = 240
    base = np.array(_period3(n))
    slow = base + 0.5 * np.sin(2 * np.pi * np.arange(n) / 12)
    _bucket_series_frame(slow).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_ljung_box_resid", str(tmp_path))
    assert len(out) == 1
    assert int(out["df"].iloc[0]) == 6
    assert bool(out["reject_whiteness"].iloc[0])
    assert int(out["n_lags"].iloc[0]) == 8


def test_lb_resid_smoke_consistent_with_dw(spark):
    lb = _collect(spark, "stats_ljung_box_resid").set_index("event_type")
    assert len(lb) == 5
    assert (lb["df"] == 6).all()
    assert (lb["lb_q_e6"] >= 0).all()
    assert (lb["n_resid"] > 100).all()


# ---------------------------------------------------------------------------
# ICC
# ---------------------------------------------------------------------------


def _icc_frame(n_days, biases, f):
    rows_v, rows_t, ts = [], [], []
    t0 = pd.Timestamp("2024-01-01")
    for d in range(n_days):
        for r, (name, bias) in enumerate(biases):
            rows_v.append(f(d) + bias)
            rows_t.append(name)
            ts.append(t0 + pd.Timedelta(days=d, hours=r))
    return _events_frame(rows_v, rows_t, ts)


def test_icc_perfect_agreement_is_exactly_one(spark, tmp_path):
    """Identical raters: MSC = MSE = 0, so both ICC forms are exactly
    1e9 (closed form — any spurious factor in a mean square breaks
    it)."""
    _icc_frame(10, [("a", 0.0), ("b", 0.0), ("c", 0.0)],
               lambda d: 2.0 * d + 1.0).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_icc_agreement", str(tmp_path))
    assert len(out) == 1
    assert int(out["n_subjects"].iloc[0]) == 10
    assert int(out["n_raters"].iloc[0]) == 3
    assert int(out["icc21_e9"].iloc[0]) == 1_000_000_000
    assert int(out["icc31_e9"].iloc[0]) == 1_000_000_000
    assert int(out["msc_e3"].iloc[0]) == 0
    assert int(out["mse_e3"].iloc[0]) == 0


def test_icc_rater_bias_splits_the_two_forms(spark, tmp_path):
    """Constant rater offsets: consistency ICC(3,1) stays exactly 1
    (MSE = 0), absolute-agreement ICC(2,1) drops below 1 (MSC > 0) —
    the defining discrimination between the two Shrout-Fleiss forms."""
    _icc_frame(10, [("a", 0.0), ("b", 10.0), ("c", 20.0)],
               lambda d: 2.0 * d + 1.0).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_icc_agreement", str(tmp_path))
    assert int(out["icc31_e9"].iloc[0]) == 1_000_000_000
    assert int(out["icc21_e9"].iloc[0]) < 1_000_000_000
    assert int(out["msc_e3"].iloc[0]) > 0
    assert int(out["mse_e3"].iloc[0]) == 0


def test_icc_replay_smoke(spark):
    """Independent numpy replay of the Shrout-Fleiss mean squares from
    the day x metric grid of e3 daily means (complete days only)."""
    out = _collect(spark, "stats_icc_agreement")
    ev = pd.read_parquet(f"{SF_SMOKE_DIR}/events.parquet")
    ev["d"] = ev["ts"].astype("int64") // (86400 * 1_000_000)
    ev["v_e3"] = _rha(ev["value"].to_numpy() * 1000)
    cell = (
        ev.groupby(["d", "event_type"])["v_e3"]
        .agg(lambda s: _rha(s.sum() / len(s))[()])
        .unstack()
    )
    cell = cell.dropna()
    x = cell.to_numpy(dtype=np.int64)
    n, k = x.shape
    t = x.sum()
    msr = (n * (x.sum(axis=1) ** 2).sum() - t * t) / (n * k) / (n - 1) / 1e6
    msc = (k * (x.sum(axis=0) ** 2).sum() - t * t) / (n * k) / (k - 1) / 1e6
    sst = (n * k * (x.astype(np.int64) ** 2).sum() - t * t) / (n * k) / 1e6
    mse = (sst - msr * (n - 1) - msc * (k - 1)) / ((n - 1) * (k - 1))
    icc21 = (msr - mse) / (msr + (k - 1) * mse + k * (msc - mse) / n)
    icc31 = (msr - mse) / (msr + (k - 1) * mse)
    row = out.iloc[0]
    assert int(row["n_subjects"]) == n and int(row["n_raters"]) == k
    assert abs(int(row["icc21_e9"]) - _rha(icc21 * 1e9)) <= 1
    assert abs(int(row["icc31_e9"]) - _rha(icc31 * 1e9)) <= 1


# ---------------------------------------------------------------------------
# Theil's U
# ---------------------------------------------------------------------------


def test_theil_u_deterministic_mapping_is_exactly_one(spark, tmp_path):
    """Each hour maps to exactly one event_type: H(X|Y) = 0, and the
    joint-cell quantized terms equal the Y-marginal terms EXACTLY, so
    u_x_given_y must be exactly 1e9."""
    rows_v, rows_t, ts = [], [], []
    t0 = pd.Timestamp("2024-01-01")
    for h in range(48):
        for j in range(3 + h % 2):
            rows_v.append(1.0)
            rows_t.append(f"t{h % 4}")
            ts.append(t0 + pd.Timedelta(hours=h, seconds=j))
    _events_frame(rows_v, rows_t, ts).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_theil_u", str(tmp_path))
    assert int(out["u_x_given_y_e9"].iloc[0]) == 1_000_000_000
    assert int(out["hxy_e9"].iloc[0]) == int(out["hy_e9"].iloc[0])


def test_theil_u_independence_is_near_zero(spark, tmp_path):
    """Uniform (type x hour) grid: mutual information 0 up to the e9
    per-term quantization."""
    rows_v, rows_t, ts = [], [], []
    t0 = pd.Timestamp("2024-01-01")
    for h in range(24):
        for x in range(4):
            for j in range(5):
                rows_v.append(1.0)
                rows_t.append(f"t{x}")
                ts.append(t0 + pd.Timedelta(hours=h, seconds=x * 10 + j))
    _events_frame(rows_v, rows_t, ts).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_theil_u", str(tmp_path))
    assert abs(int(out["u_x_given_y_e9"].iloc[0])) < 2000
    assert abs(int(out["u_symmetric_e9"].iloc[0])) < 2000


def test_theil_u_replay_smoke(spark):
    out = _collect(spark, "stats_theil_u")
    ev = pd.read_parquet(f"{SF_SMOKE_DIR}/events.parquet")
    ev["y"] = (ev["ts"].astype("int64") // 3_600_000_000) % 24
    n = len(ev)

    def h_e9(counts):
        p = counts / n
        return int(_rha(-p * np.log(p) * 1e9).sum())

    hx = h_e9(ev.groupby("event_type").size().to_numpy())
    hy = h_e9(ev.groupby("y").size().to_numpy())
    hxy = h_e9(ev.groupby(["event_type", "y"]).size().to_numpy())
    row = out.iloc[0]
    assert int(row["hx_e9"]) == hx
    assert int(row["hy_e9"]) == hy
    assert int(row["hxy_e9"]) == hxy
    assert int(row["u_x_given_y_e9"]) == int(_rha((hx + hy - hxy) / hx * 1e9))


# ---------------------------------------------------------------------------
# Storey q-values
# ---------------------------------------------------------------------------


def _arm(uid):
    return "A" if int(hashlib.md5(f"ab|{uid}".encode()).hexdigest()[0], 16) < 8 else "B"


def test_storey_planted_half_null(spark, tmp_path):
    """Two null metrics (identical constant arms -> p ~ 1) and two
    separated metrics (p ~ 0): pi0 = min(1, 2*2/4) must be exactly 1e9,
    the separated metrics significant, the null ones not."""
    rows_v, rows_t, uids, ts = [], [], [], []
    t0 = pd.Timestamp("2024-01-01")
    for uid in range(200):
        a = _arm(uid)
        for m in ("n1", "n2"):
            rows_v.append(5.0)
            rows_t.append(m)
            uids.append(uid)
            ts.append(t0 + pd.Timedelta(seconds=len(ts)))
        for m in ("s1", "s2"):
            base = 1.0 if a == "A" else 50.0
            rows_v.append(base + 0.1 * (uid % 2))
            rows_t.append(m)
            uids.append(uid)
            ts.append(t0 + pd.Timedelta(seconds=len(ts)))
    _events_frame(rows_v, rows_t, ts, uids).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_storey_qvalue", str(tmp_path)).set_index(
        "event_type"
    )
    assert (out["pi0_e9"] == 1_000_000_000).all()
    assert bool(out.loc["s1", "significant_q05"])
    assert bool(out.loc["s2", "significant_q05"])
    assert not bool(out.loc["n1", "significant_q05"])
    assert not bool(out.loc["n2", "significant_q05"])


def test_storey_replay_smoke(spark):
    """Replay pi0 / min-monotone q from the emitted p_e9 (the p-value
    pipeline itself is pinned by the BH battery)."""
    out = (
        _collect(spark, "stats_storey_qvalue")
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    p = out["p_e9"].to_numpy(dtype=np.int64)
    m = len(p)
    n_over = int((p > 500_000_000).sum())
    pi0 = min(10**9, int(_rha(2 * n_over / m * 1e9)[()]))
    assert (out["pi0_e9"] == pi0).all()
    qraw = _rha(pi0 / 1e9 * m * (p / 1e9) / (np.arange(m) + 1) * 1e9)
    qmon = np.minimum(np.minimum.accumulate(qraw[::-1])[::-1], 10**9)
    assert (out["q_e9"].to_numpy(dtype=np.int64) == qmon).all()
    assert (out["significant_q05"] == (qmon <= 50_000_000)).all()


# ---------------------------------------------------------------------------
# Kleinberg burst
# ---------------------------------------------------------------------------


def _hourly_frame(counts, metric="m"):
    rows_v, rows_t, ts = [], [], []
    t0 = pd.Timestamp("2024-01-01")
    for h, c in enumerate(counts):
        for j in range(c):
            rows_v.append(1.0)
            rows_t.append(metric)
            ts.append(t0 + pd.Timedelta(hours=h, seconds=j))
    return _events_frame(rows_v, rows_t, ts)


def test_kleinberg_flat_series_has_no_bursts(spark, tmp_path):
    _hourly_frame([8] * 120).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_kleinberg_burst", str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert int(row["burst_hours"]) == 0
    assert int(row["burst_episodes"]) == 0
    assert not bool(row["bursty"])
    assert int(row["gain_e3"]) == 0  # all-base path IS the optimum


def test_kleinberg_planted_burst_window(spark, tmp_path):
    """100 quiet hours, 20 hours at 8x the quiet rate, 100 quiet: one
    episode covering (about) the planted window."""
    counts = [5] * 100 + [40] * 20 + [5] * 100
    _hourly_frame(counts).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_kleinberg_burst", str(tmp_path))
    row = out.iloc[0]
    assert int(row["n_hours"]) == 220
    assert int(row["burst_episodes"]) == 1
    assert 18 <= int(row["burst_hours"]) <= 22
    assert bool(row["bursty"])
    assert int(row["gain_e3"]) > 0


def test_kleinberg_smoke_shape(spark):
    out = _collect(spark, "timeseries_kleinberg_burst")
    assert len(out) == 5
    assert (out["burst_hours"] <= out["n_hours"]).all()
    assert (out["gain_e3"] >= 0).all()
    # burst hours imply at least one episode and vice versa
    assert ((out["burst_hours"] > 0) == (out["burst_episodes"] > 0)).all()
