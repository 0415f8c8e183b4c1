"""Behavior tests for wave 10e (assumption diagnostics): numpy replays
for each statistic plus the structural identities (Brier = REL − RES +
UNC, entropy-rate weighting, Granger F on planted causality).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _events():
    return duckdb.sql(
        "SELECT event_id, user_id, event_type, "
        "CAST(ROUND(value*1000) AS BIGINT) AS v_e3, epoch_us(ts) AS us "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()


# ---------------------------------------------------------------------------
# Brown-Forsythe
# ---------------------------------------------------------------------------


def test_brown_forsythe_matches_numpy(spark):
    r = _collect(spark, "stats_brown_forsythe").iloc[0]
    ev = _events().sort_values(["event_type", "v_e3", "event_id"])
    groups = []
    for et, g in ev.groupby("event_type"):
        v = g["v_e3"].to_numpy(dtype=np.int64)
        med = np.sort(v)[math.floor((len(v) * 50 + 99) / 100) - 1]
        groups.append(np.abs(v - med))
    k = len(groups)
    nn = sum(len(z) for z in groups)
    sqm = sum(
        math.floor(float(z.sum()) * z.sum() / len(z) + 0.5) for z in groups
    )
    ts1 = sum(int(z.sum()) for z in groups)
    ts2 = sum(int((z.astype(np.int64) ** 2).sum()) for z in groups)
    ssb = (sqm - ts1 * ts1 / nn) / 1e6
    ssw = (ts2 - sqm) / 1e6
    w = (ssb / (k - 1)) / (ssw / (nn - k))
    assert int(r["n_groups"]) == k and int(r["n_total"]) == nn
    assert abs(int(r["w_e6"]) - w * 1e6) <= 2
    assert bool(r["heteroscedastic"]) == (w > 2.37)


def test_brown_forsythe_flags_planted_heteroscedasticity(spark, tmp_path):
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 4000
    half = n // 2
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": ["tight"] * half + ["wide"] * half,
            "value": np.concatenate(
                [100 + rng.normal(0, 1, half), 100 + rng.normal(0, 30, half)]
            ),
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    r = _collect(spark, "stats_brown_forsythe", sf_dir=str(tmp_path)).iloc[0]
    assert bool(r["heteroscedastic"])


# ---------------------------------------------------------------------------
# Ljung-Box
# ---------------------------------------------------------------------------


def test_ljung_box_consumes_engine_acf_exactly(spark):
    """Q must reproduce from the engine's OWN quantized ACF rows — the
    declared cross-engine interface."""
    acf = _collect(spark, "timeseries_autocorrelation")
    out = _collect(spark, "stats_ljung_box").set_index("event_type")
    for et, g in acf.groupby("event_type"):
        g = g[g["lag"] <= 12]
        n = int((g["n_pairs"] + g["lag"]).max())
        q = (
            n
            * (n + 2)
            * sum(
                (r.acf_e6 / 1e6) ** 2 / r.n_pairs
                for r in g.itertuples(index=False)
            )
        )
        row = out.loc[et]
        assert int(row["n_obs"]) == n
        assert int(row["n_lags"]) == 12
        assert abs(int(row["q_e3"]) - q * 1e3) <= 2
        assert bool(row["reject_whiteness"]) == (q > 21.026)


def test_ljung_box_rejects_on_planted_seasonal_series(spark, tmp_path):
    """A strongly 24h-periodic synthetic series must reject whiteness
    decisively; flag must equal the q > 21.026 comparison everywhere.
    (At the smoke SF the real corpus is ~1.4 events/hour — too thin to
    reject, and the honest answer there is 'white'.)"""
    import pandas as pd

    rows = []
    eid = 0
    for h in range(240):
        cnt = 40 if (h % 24) < 12 else 5
        for _ in range(cnt):
            rows.append((eid, (h * 3600 + 7) * 1_000_000, 1, "m", 1.0,
                         "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        1, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("us")))
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = _collect(spark, "stats_ljung_box", sf_dir=str(tmp_path))
    r = out.iloc[0]
    assert bool(r["reject_whiteness"])
    assert int(r["q_e3"]) > 10 * 21026
    corpus = _collect(spark, "stats_ljung_box")
    assert (corpus["reject_whiteness"] == (corpus["q_e3"] > 21026)).all()


# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------


def test_brier_identity_and_numpy_replay(spark):
    r = _collect(spark, "ml_brier_decomposition").iloc[0]
    assert int(r["brier_e6"]) == int(r["reliability_e6"]) - int(
        r["resolution_e6"]) + int(r["uncertainty_e6"])
    ev = _events()
    ev["y"] = (ev["event_type"] == "purchase").astype(np.int64)
    lo, hi = int(ev["v_e3"].min()), int(ev["v_e3"].max())
    ev["bin"] = np.minimum(
        np.floor((ev["v_e3"] - lo) * 10.0 / (hi - lo + 1)).astype(np.int64),
        9,
    )
    cal = ev[ev["event_id"] % 2 == 0]
    tst = ev[ev["event_id"] % 2 == 1]
    p = {
        b: math.floor(g["y"].sum() / len(g) * 1e9 + 0.5)
        for b, g in cal.groupby("bin")
    }
    n = obar_num = 0
    test_bins = {}
    for b, g in tst.groupby("bin"):
        if b not in p:
            continue
        test_bins[b] = (len(g), int(g["y"].sum()))
        n += len(g)
        obar_num += int(g["y"].sum())
    obar = obar_num / n
    rel = sum(
        math.floor(nb * (p[b] / 1e9 - pb / nb) ** 2 * 1e9 + 0.5)
        for b, (nb, pb) in test_bins.items()
    )
    res = sum(
        math.floor(nb * (pb / nb - obar) ** 2 * 1e9 + 0.5)
        for b, (nb, pb) in test_bins.items()
    )
    assert int(r["n_test"]) == n
    assert abs(int(r["reliability_e6"]) - rel / n / 1e3) <= 2
    assert abs(int(r["resolution_e6"]) - res / n / 1e3) <= 2
    assert abs(int(r["uncertainty_e6"]) - obar * (1 - obar) * 1e6) <= 2


# ---------------------------------------------------------------------------
# Entropy rate
# ---------------------------------------------------------------------------


def test_entropy_rate_matches_numpy(spark):
    out = _collect(spark, "events_entropy_rate").set_index("s_from")
    ev = _events().sort_values(["user_id", "us", "event_id"])
    from collections import Counter

    cells: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            cells[(a, b)] += 1
    rows = Counter()
    for (a, _), c in cells.items():
        rows[a] += c
    n = sum(rows.values())
    h = {}
    for a in rows:
        h[a] = sum(
            math.floor(-c * math.log(c / rows[a]) * 1e9 / rows[a] + 0.5)
            for (x, _), c in cells.items()
            if x == a
        )
    rate = sum(
        math.floor(h[a] * rows[a] / n + 0.5) for a in rows
    )
    for a in rows:
        assert int(out.loc[a, "n_i"]) == rows[a]
        assert int(out.loc[a, "h_cond_e9"]) == h[a]
    assert int(out["rate_e9"].iloc[0]) == rate
    # uniform 5-state chain upper bound: ln(5) nats
    assert 0 < rate <= math.log(5) * 1e9 + 1000


# ---------------------------------------------------------------------------
# Granger
# ---------------------------------------------------------------------------


def test_granger_matches_numpy_ols(spark):
    out = _collect(spark, "timeseries_granger_lite")
    ev = _events()
    ev["d"] = (ev["us"] // 86_400_000_000).astype(np.int64)
    days = sorted(ev["d"].unique())
    series = {
        et: np.array(
            [int((g["d"] == d).sum()) for d in days], dtype=np.float64
        )
        for et, g in ev.groupby("event_type")
    }
    assert len(out) == 20
    for _, r in out.iterrows():
        y = series[r["y_metric"]]
        x = series[r["x_metric"]]
        yt, yl, xl = y[1:], y[:-1], x[:-1]
        n = len(yt)
        Xu = np.column_stack([np.ones(n), yl, xl])
        bu, *_ = np.linalg.lstsq(Xu, yt, rcond=None)
        ssr_u = float(((yt - Xu @ bu) ** 2).sum())
        Xr = np.column_stack([np.ones(n), yl])
        br, *_ = np.linalg.lstsq(Xr, yt, rcond=None)
        ssr_r = float(((yt - Xr @ br) ** 2).sum())
        f = (ssr_r - ssr_u) * (n - 3) / ssr_u
        assert int(r["n"]) == n
        # replay at coarse tolerance: lstsq vs Cramer differ in float
        # path; the oracle gate pins exactness
        assert abs(int(r["f_e6"]) - f * 1e6) <= max(50, abs(f) * 1e6 * 1e-5)
        assert bool(r["x_granger_causes_y"]) == (f > 4.23)
        assert abs(int(r["b_x_e6"]) - bu[2] * 1e6) <= max(
            50, abs(bu[2]) * 1e6 * 1e-5)


def test_granger_detects_planted_lagged_dependence(spark, tmp_path):
    """Plant x(t) driving y(t+1 day): the x->y F must dwarf y->x."""
    import pandas as pd

    rng = np.random.default_rng(5)
    days = 40
    x = rng.integers(5, 60, days)
    y = np.empty(days, dtype=np.int64)
    y[0] = 30
    for t in range(1, days):
        y[t] = 10 + 2 * x[t - 1] + int(rng.integers(0, 4))
    rows = []
    eid = 0
    for d in range(days):
        for et, cnt in (("xs", int(x[d])), ("ys", int(y[d]))):
            for _ in range(cnt):
                rows.append(
                    (eid, pd.Timestamp("2024-01-01")
                     + pd.Timedelta(days=d, seconds=eid % 80000),
                     1, et, 1.0, "{}"))
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_granger_lite",
                   sf_dir=str(tmp_path))
    fwd = out[(out["x_metric"] == "xs") & (out["y_metric"] == "ys")].iloc[0]
    rev = out[(out["x_metric"] == "ys") & (out["y_metric"] == "xs")].iloc[0]
    assert bool(fwd["x_granger_causes_y"])
    assert int(fwd["f_e6"]) > 10 * max(int(rev["f_e6"]), 1)


# ---------------------------------------------------------------------------
# Spine-budget guard (r9 VERDICT item 1)
# ---------------------------------------------------------------------------


def test_spine_budget_guard_raises_on_90_day_corpus(spark, tmp_path, duck):
    """The calendar-bounded n^2 stages (matrix profile, xcorr) must fail
    LOUDLY — on BOTH engines — when the dense hourly spine outgrows the
    1440-point budget, instead of going quadratic silently. A 90-day
    synthetic corpus (2160 hourly points) must raise; the 30-day
    fixture stays green (covered by the oracle-parity sweep)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for day in range(0, 90, 3):  # sparse events; the SPINE is dense
        rows.append((eid, (day * 86400 + 40) * 1_000_000, 1, "m", 1.0,
                     "{}"))
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    tbl = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        1, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("us")))
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    for name in ("timeseries_matrix_profile", "timeseries_cross_correlation"):
        with pytest.raises(Exception, match="dense hourly spine exceeds"):
            specs[name].fn(spark, str(tmp_path)).toPandas()

    import duckdb as _duckdb

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    for name in ("timeseries_matrix_profile", "timeseries_cross_correlation"):
        with pytest.raises(Exception, match="dense hourly spine exceeds"):
            con.sql(specs[name].oracle).df()


# ---------------------------------------------------------------------------
# Density-adaptive linkage band (round-10 x10-probe fix)
# ---------------------------------------------------------------------------


def test_linkage_band_is_density_adaptive_and_lossless(duck):
    """Band width: capped at $2,000 through n = 3,300 (so the sf0.01
    correctness gate is byte-identical to rounds 9-10), ~6.6e8/n above
    (constant block occupancy), floored at 2x the 1,000-cent jitter —
    and the +/-1 replication stays lossless at every width because the
    jitter never exceeds one band."""
    from emr_with_custom_metrics_spark.operators.linkage import _BAND_EXPR

    for n, want in ((150, 200000), (1500, 200000), (3300, 200000),
                    (15000, 44000), (150000, 4400), (1_000_000, 2000)):
        got = duck.sql(
            "SELECT " + _BAND_EXPR.format(tbl=f"(SELECT 1 FROM range({n}))")
        ).fetchone()[0]
        assert got == want, (n, got, want)
        assert got >= 2000  # jitter (<=1000) < band: +/-1 bands cover
