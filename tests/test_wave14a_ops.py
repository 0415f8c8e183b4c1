"""Planted-fixture tests for wave 14a (closed-form answers computed by
hand, then cross-engine frame equality on the same fixture — the
round-12 rule: a replay test mirroring the engine formula is blind to
shared errors)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _collect(spark, name, sf_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _duck_oracle(name, sf_dir, tables=("events",)):
    import duckdb

    from emr_with_custom_metrics_spark.registry import all_specs

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(all_specs()[name].oracle).df()
    finally:
        con.close()


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> None:
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert len(av) == len(bv), c
        assert (av == bv).all(), (c, av, bv)


def _events(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["value"] = df["value"].astype(np.float64)
    return df


# ---------------------------------------------------------------------------
# Nelson-Aalen
# ---------------------------------------------------------------------------


def test_nelson_aalen_hand_computed(spark, tmp_path):
    """Lifetimes 10, 10, 5, 0 with the corpus ending at day 10: the
    censor cut is day 3, so only the day-0 user churns. Grid: t=0 has
    d=1, n=4 -> H = 0.25, exp(-0.25), var 1/16; t=5 and t=10 add
    nothing."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u, last_day in [(1, 10), (2, 10), (3, 5), (4, 0)]:
        for d in {0, last_day}:
            rows.append((eid, t0 + pd.Timedelta(days=d), u, "view",
                         1.0, "{}"))
            eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "survival_nelson_aalen", str(tmp_path))
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["day"]) == [0, 5, 10]
    assert list(out["churned"]) == [1, 0, 0]
    assert list(out["at_risk"]) == [4, 3, 2]
    assert list(out["cum_hazard_e9"]) == [250_000_000] * 3
    assert list(out["hazard_var_e12"]) == [62_500_000_000] * 3
    assert (
        out["breslow_survival_e6"] == round(math.exp(-0.25) * 1e6)
    ).all()
    _frames_equal(out, _duck_oracle("survival_nelson_aalen", tmp_path))


def test_nelson_aalen_distinct_from_km(spark, tmp_path):
    """On the same fixture the KM product (1 - 1/4) = 0.75 differs from
    the Breslow exp(-0.25) = 0.7788 — the estimators genuinely
    diverge, so the new row is not a renamed KM."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u, last_day in [(1, 10), (2, 10), (3, 5), (4, 0)]:
        for d in {0, last_day}:
            rows.append((eid, t0 + pd.Timedelta(days=d), u, "view",
                         1.0, "{}"))
            eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    na = _collect(spark, "survival_nelson_aalen", str(tmp_path))
    km = _collect(spark, "survival_kaplan_meier", str(tmp_path))
    na0 = int(na[na["day"] == 0].iloc[0]["breslow_survival_e6"])
    km0 = int(km[km["day"] == 0].iloc[0]["survival_e6"])
    assert km0 == 750_000
    assert na0 == round(math.exp(-0.25) * 1e6) != km0


# ---------------------------------------------------------------------------
# Seasonal Mann-Kendall
# ---------------------------------------------------------------------------


def test_seasonal_mk_cycle_degenerate_trend_detected(spark, tmp_path):
    """A pure diurnal cycle constant across days has every stratum
    constant -> degenerate (V18 = 0, no spurious trend). A per-day
    monotone increase at every hour gives exactly S = 24*C(n,2) and
    V18 = 24*n(n-1)(2n+5) (no ties within strata), z per the
    continuity-corrected closed form."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    n_days = 5
    for d in range(n_days):
        for h in range(24):
            # cyc: depends only on hour; up: d+1 events every hour
            for _ in range(3 if h == 12 else 1):
                rows.append((eid, t0 + pd.Timedelta(days=d, hours=h,
                                                    minutes=1),
                             eid % 7, "cyc", 1.0, "{}"))
                eid += 1
            for _ in range(d + 1):
                rows.append((eid, t0 + pd.Timedelta(days=d, hours=h,
                                                    minutes=2),
                             eid % 7, "up", 1.0, "{}"))
                eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_seasonal_mann_kendall", str(tmp_path))
    cyc = out[out["event_type"] == "cyc"].iloc[0]
    assert bool(cyc["degenerate"]) is True
    assert int(cyc["s_total"]) == 0
    assert bool(cyc["increasing_trend"]) is False
    up = out[out["event_type"] == "up"].iloc[0]
    n = n_days
    s_exp = 24 * n * (n - 1) // 2
    v18_exp = 24 * n * (n - 1) * (2 * n + 5)
    assert int(up["s_total"]) == s_exp
    assert int(up["v18_total"]) == v18_exp
    z = (s_exp - 1.0) / math.sqrt(v18_exp / 18.0)
    assert int(up["z_e6"]) == round(z * 1e6)
    assert bool(up["increasing_trend"]) is True
    _frames_equal(
        out, _duck_oracle("stats_seasonal_mann_kendall", tmp_path)
    )


# ---------------------------------------------------------------------------
# Energy distance
# ---------------------------------------------------------------------------


def test_energy_distance_hand_computed(spark, tmp_path):
    """X ~ {0, 1} uniform, Y = {0, 0}: E|X-X'| = 0.5, E|Y-Y'| = 0,
    E|X-Y| = 0.5 -> D = 0.5 and H = D/(2*0.5) = 0.5 exactly."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (0, t0, 0, "x", 0.0, "{}"),
        (1, t0 + pd.Timedelta(seconds=1), 1, "x", 1.0, "{}"),
        (2, t0 + pd.Timedelta(seconds=2), 2, "y", 0.0, "{}"),
        (3, t0 + pd.Timedelta(seconds=3), 3, "y", 0.0, "{}"),
    ]
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_energy_distance", str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["ma"], r["mb"]) == ("x", "y")
    assert int(r["e_within_a_e6"]) == 500_000
    assert int(r["e_within_b_e6"]) == 0
    assert int(r["e_between_e6"]) == 500_000
    assert int(r["energy_dist_e6"]) == 500_000
    assert int(r["h_coef_e9"]) == 500_000_000
    assert not bool(r["degenerate"])
    _frames_equal(out, _duck_oracle("stats_energy_distance", tmp_path))


def test_energy_distance_zero_iff_identical(spark, tmp_path):
    """Identical distributions -> D = 0 (the defining property)."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for m in ("a", "b"):
        for v in (1.0, 2.0, 2.0, 7.5):
            rows.append((eid, t0 + pd.Timedelta(seconds=eid), eid, m,
                         v, "{}"))
            eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_energy_distance", str(tmp_path))
    assert int(out.iloc[0]["energy_dist_e6"]) == 0
    assert int(out.iloc[0]["h_coef_e9"]) == 0
    _frames_equal(out, _duck_oracle("stats_energy_distance", tmp_path))


# ---------------------------------------------------------------------------
# Theta method
# ---------------------------------------------------------------------------


def test_theta_constant_series_is_exact(spark, tmp_path):
    """A constant series: slope 0, intercept c, theta2 line constant c,
    SES level stays exactly c, forecast exactly c, SSE exactly 0."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    c = 4
    for h in range(30):
        for _ in range(c):
            rows.append((eid, t0 + pd.Timedelta(hours=h, minutes=1),
                         eid % 5, "flat", 1.0, "{}"))
            eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_theta_method", str(tmp_path))
    r = out[out["event_type"] == "flat"].iloc[0]
    assert int(r["slope_e9"]) == 0
    assert int(r["intercept_e6"]) == c * 1_000_000
    assert int(r["ses_level_e6"]) == c * 1_000_000
    assert int(r["forecast_next_e6"]) == c * 1_000_000
    assert int(r["sse_e3"]) == 0
    _frames_equal(out, _duck_oracle("timeseries_theta_method", tmp_path))


def test_theta_linear_series_slope_exact(spark, tmp_path):
    """v_t = 2t: the integer least-squares fit recovers slope exactly 2
    and intercept 0; the theta2 line equals the original line, so the
    SES level trails it and the combined forecast lands between the
    level and the t = n+1 line value."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    n = 24
    for h in range(n):
        for _ in range(2 * (h + 1)):
            rows.append((eid, t0 + pd.Timedelta(hours=h, minutes=1),
                         eid % 5, "lin", 1.0, "{}"))
            eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_theta_method", str(tmp_path))
    r = out[out["event_type"] == "lin"].iloc[0]
    assert int(r["slope_e9"]) == 2_000_000_000
    assert int(r["intercept_e6"]) == 0
    lvl = int(r["ses_level_e6"])
    line_next = 2 * (n + 1) * 1_000_000
    fc = int(r["forecast_next_e6"])
    assert lvl < fc < line_next
    assert fc == round(0.5 * line_next + 0.5 * lvl)
    _frames_equal(out, _duck_oracle("timeseries_theta_method", tmp_path))
