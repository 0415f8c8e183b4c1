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
# Basket association rules
# ---------------------------------------------------------------------------


def _li_part_frames(order_parts, brands):
    """order_parts: {orderkey: [partkeys]}; brands: {partkey: brand}."""
    rows = []
    for o, parts in order_parts.items():
        for i, pk in enumerate(parts):
            rows.append((o, pk, i + 1))
    li = pd.DataFrame(
        {
            "l_orderkey": np.asarray([r[0] for r in rows], dtype=np.int64),
            "l_partkey": np.asarray([r[1] for r in rows], dtype=np.int64),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.asarray([r[2] for r in rows], dtype=np.int32),
            "l_quantity": 1.0,
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Series(
                [pd.Timestamp("1995-06-01")] * len(rows)
            ).astype("datetime64[us]"),
        }
    )
    pt = pd.DataFrame(
        {
            "p_partkey": np.asarray(sorted(brands), dtype=np.int64),
            "p_name": "part",
            "p_brand": [brands[k] for k in sorted(brands)],
            "p_type": "t",
            "p_size": np.int32(1),
            "p_retailprice": 1.0,
        }
    )
    return li, pt


def test_basket_planted_exact_rationals(spark, tmp_path):
    """(B1,B2) co-occurs in 6 of 10 baskets; B1 in 8, B2 in 6: conf
    a->b = 3/4, conf b->a = 1, lift = 6*10/(8*6) = 1.25 — all exact.
    The (B1,B3) pair (2 baskets) sits below min support and must not
    appear."""
    brands = {1: "B1", 3: "B2", 4: "B3", 5: "B4"}
    orders = {o: [1, 3] for o in range(1, 7)}
    orders.update({7: [1, 4], 8: [1, 4]})
    orders.update({9: [5], 10: [5]})
    li, pt = _li_part_frames(orders, brands)
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    pt.to_parquet(tmp_path / "part.parquet", index=False)
    out = _collect(spark, "basket_association_rules", str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["brand_a"], row["brand_b"]) == ("B1", "B2")
    assert int(row["n_ab"]) == 6 and int(row["n_a"]) == 8
    assert int(row["n_baskets"]) == 10
    assert int(row["support_e9"]) == 600_000_000
    assert int(row["conf_a_to_b_e9"]) == 750_000_000
    assert int(row["conf_b_to_a_e9"]) == 1_000_000_000
    assert int(row["lift_e9"]) == 1_250_000_000
    assert bool(row["positively_associated"])


def test_basket_smoke_invariants(spark):
    out = _collect(spark, "basket_association_rules")
    assert (out["n_ab"] >= 5).all()
    assert (out["n_ab"] <= out[["n_a", "n_b"]].min(axis=1)).all()
    assert (out["brand_a"] < out["brand_b"]).all()
    # lift replay from the emitted exact counts
    lift = _rha(
        out["n_ab"] * out["n_baskets"] / out["n_a"] / out["n_b"] * 1e9
    )
    assert (out["lift_e9"].to_numpy(dtype=np.int64) == lift).all()


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
# Kleinberg multi-state hierarchy
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


def test_kleinberg_multistate_flat_series(spark, tmp_path):
    _hourly_frame([8] * 120).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_kleinberg_multistate", str(tmp_path))
    row = out.iloc[0]
    assert int(row["hours_elevated"]) == 0
    assert int(row["hours_hyper"]) == 0
    assert int(row["burst_episodes"]) == 0
    assert int(row["final_level"]) == 0
    assert int(row["gain_e3"]) == 0
    assert not bool(row["bursty"])


def test_kleinberg_multistate_hyper_burst(spark, tmp_path):
    """8x the quiet rate for 20 hours: the 4x level (closest in NLL)
    must claim the window — hyper hours ~ the window, one episode."""
    counts = [5] * 100 + [40] * 20 + [5] * 100
    _hourly_frame(counts).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_kleinberg_multistate", str(tmp_path))
    row = out.iloc[0]
    assert int(row["burst_episodes"]) == 1
    assert 18 <= int(row["hours_hyper"]) <= 22
    assert int(row["hours_elevated"]) >= int(row["hours_hyper"])
    assert bool(row["bursty"]) and int(row["gain_e3"]) > 0


def test_kleinberg_multistate_moderate_burst_stays_level_one(spark, tmp_path):
    """~2x the mean rate: level 1 claims the window, level 2 never
    activates — the hierarchy discrimination the 2-state row cannot
    express."""
    counts = [5] * 100 + [12] * 20 + [5] * 100
    _hourly_frame(counts).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_kleinberg_multistate", str(tmp_path))
    row = out.iloc[0]
    assert int(row["burst_episodes"]) == 1
    assert 16 <= int(row["hours_elevated"]) <= 22
    assert int(row["hours_hyper"]) == 0


def test_kleinberg_multistate_smoke_shape(spark):
    out = _collect(spark, "timeseries_kleinberg_multistate")
    assert len(out) == 5
    assert (out["hours_hyper"] <= out["hours_elevated"]).all()
    assert (out["hours_elevated"] <= out["n_hours"]).all()
    assert (out["gain_e3"] >= 0).all()
    assert ((out["hours_elevated"] > 0) == (out["burst_episodes"] > 0)).all()


def test_ar2_oracle_is_order_deterministic(tmp_path):
    """The round-15 determinism retrofit: the AR(2) fit (and the
    DW / LB-resid diagnostics slicing it) must return ONE answer
    across repeated DuckDB runs on a near-constant frame. The
    pre-retrofit text (ROUND of parallel double aggregates) measured
    THREE distinct outcomes in 12 runs on exactly this frame class —
    DuckDB's parallel aggregation order decided e6 midpoints."""
    import duckdb
    import numpy as np
    import pandas as pd

    from emr_with_custom_metrics_spark.registry import all_specs

    rng = np.random.default_rng(223)
    n = 1000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 20, n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n
            ),
            "value": np.full(n, 7.0)
            + rng.choice([0.0, 0.0, 0.0, 0.001], n),
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    for name in (
        "timeseries_ar2_forecast",
        "timeseries_durbin_watson",
        "stats_ljung_box_resid",
    ):
        oracle = all_specs()[name].oracle
        seen = set()
        for _ in range(8):
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')"
            )
            out = con.sql(oracle).df()
            cols = sorted(out.columns)
            out = out[cols].sort_values(cols).reset_index(drop=True)
            seen.add(tuple(map(tuple, out.astype(str).values)))
            con.close()
        assert len(seen) == 1, f"{name}: {len(seen)} distinct outcomes"
