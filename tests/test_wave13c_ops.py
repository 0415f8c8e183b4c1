"""Wave-13c operators: planted closed-form fixtures — an alternating
series whose ACF/PACF are exact rationals (AR order pick), a perfectly
periodic series (a fixed point of the Holt-Winters recursions), and
tiny exact-spectrum corpora (Simpson)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _hourly_frame(counts, metric="m"):
    rows_t, ts = [], []
    t0 = pd.Timestamp("2024-01-01")
    for h, c in enumerate(counts):
        for j in range(c):
            rows_t.append(metric)
            ts.append(t0 + pd.Timedelta(hours=h, seconds=j))
    n = len(rows_t)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(ts),
            "user_id": np.arange(n, dtype=np.int64),
            "event_type": rows_t,
            "value": 1.0,
            "props": "{}",
        }
    )


# ---------------------------------------------------------------------------
# AR order pick + fit
# ---------------------------------------------------------------------------


def test_ar_order_fit_alternating_series_picks_order_one(spark, tmp_path):
    """Counts alternate 30/10 over 48 hours: the exact centered ACF is
    r_k = (-1)^k (n-k)/n, so pacf_1 = r_1 ~ -0.98 clears the
    1.96/sqrt(48) = 0.28 band while pacf_2 = (r_2 - r_1^2)/(1 - r_1^2)
    ~ -0.01 does not: chosen_p = 1, phi_1 = the e6-quantized r_1
    EXACTLY, and the frozen fold must leave phi_2 = phi_3 = 0."""
    counts = [30 if h % 2 == 0 else 10 for h in range(48)]
    _hourly_frame(counts).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_ar_order_fit", str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert int(row["n"]) == 48
    assert int(row["chosen_p"]) == 1
    # r_1 = -47/48 -> e6 round -979167 -> phi_1 e9 = -979167000
    assert int(row["phi1_e9"]) == -979_167_000
    assert int(row["phi2_e9"]) == 0
    assert int(row["phi3_e9"]) == 0
    # v = round9(1 - phi_1^2)
    v = round((1.0 - 0.979167**2) * 1e9) / 1e9
    assert int(row["var_ratio_e9"]) == int(_rha(v * 1e9)[()])


def test_ar_order_fit_smoke_consistency(spark):
    """chosen_p within [0, 10]; var ratio in (0, 1]; and order-p
    coefficients must agree with the standalone PACF row at lag 1
    when p >= 1 (both read the same quantized ACF)."""
    out = _collect(spark, "timeseries_ar_order_fit").set_index("event_type")
    pacf = _collect(spark, "timeseries_pacf_durbin")
    p1 = pacf[pacf["lag"] == 1].set_index("event_type")["pacf_e9"]
    assert out["chosen_p"].between(0, 10).all()
    assert (out["var_ratio_e9"] > 0).all()
    assert (out["var_ratio_e9"] <= 1_000_000_000).all()
    for m, row in out.iterrows():
        if int(row["chosen_p"]) == 1:
            assert int(row["phi1_e9"]) == int(p1.loc[m]), m


# ---------------------------------------------------------------------------
# Holt-Winters seasonal
# ---------------------------------------------------------------------------


def test_hw_seasonal_perfect_periodicity_is_exact(spark, tmp_path):
    """A perfectly 24-periodic series is a FIXED POINT of the additive
    recursions (v - S_j = L at every step), so level = the day mean,
    trend = 0, SSE = 0, and the next-hour forecast equals the true
    next value — all exactly."""
    # integer pattern with an e6-exact mean (21.5)
    pattern = [10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 32,
               33, 31, 29, 27, 25, 23, 21, 19, 17, 15, 13, 11]  # mean 21.5
    counts = pattern * 4  # 96 hours
    rows_t, ts = [], []
    t0 = pd.Timestamp("2024-01-01")
    for h, c in enumerate(counts):
        for j in range(c):
            rows_t.append("m")
            ts.append(t0 + pd.Timedelta(hours=h, seconds=j))
    n = len(rows_t)
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(ts),
            "user_id": np.arange(n, dtype=np.int64),
            "event_type": rows_t,
            "value": 1.0,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_holt_winters_seasonal", str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert int(row["n_hours"]) == 96
    assert int(row["level_e6"]) == 21_500_000
    assert int(row["trend_e6"]) == 0
    assert int(row["sse_e3"]) == 0
    # after 72 post-init steps, pos % 24 = 0 -> next season slot is 1
    assert int(row["forecast_next_e6"]) == pattern[0] * 1_000_000
    assert int(row["season_amp_e6"]) == (33 - 10) * 1_000_000


def test_hw_seasonal_smoke_invariants(spark):
    out = _collect(spark, "timeseries_holt_winters_seasonal")
    assert len(out) == 5
    assert (out["n_hours"] >= 49).all()
    assert (out["sse_e3"] >= 0).all()
    assert (out["season_amp_e6"] >= 0).all()
    # forecast = level + trend + S_next: bounded by level +- amp + trend
    spread = out["season_amp_e6"] + np.abs(out["trend_e6"]) + 1
    assert (
        np.abs(out["forecast_next_e6"] - out["level_e6"]) <= spread
    ).all()


# ---------------------------------------------------------------------------
# Simpson diversity
# ---------------------------------------------------------------------------


def _docs(texts_by_source):
    rows = []
    for i, (src, text) in enumerate(texts_by_source):
        rows.append((i, text, "en", src, len(text)))
    return pd.DataFrame(
        {
            "doc_id": np.asarray([r[0] for r in rows], dtype=np.int64),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": np.asarray([r[4] for r in rows], dtype=np.int64),
        }
    )


def test_simpson_planted_extremes_and_rational(spark, tmp_path):
    _docs(
        [
            ("mono", "x x x x"),        # D = 1
            ("alldiff", "a b c d e"),   # D = 0
            ("half", "a a b b"),        # D = 4/12 = 1/3
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "text_simpson_diversity", str(tmp_path)).set_index(
        "source"
    )
    assert int(out.loc["mono", "simpson_d_e9"]) == 1_000_000_000
    assert int(out.loc["mono", "berger_parker_e9"]) == 1_000_000_000
    assert int(out.loc["alldiff", "simpson_d_e9"]) == 0
    assert int(out.loc["alldiff", "gini_simpson_e9"]) == 1_000_000_000
    assert int(out.loc["alldiff", "berger_parker_e9"]) == 200_000_000
    assert int(out.loc["half", "simpson_d_e9"]) == 333_333_333
    assert int(out.loc["half", "berger_parker_e9"]) == 500_000_000


def test_simpson_replay_smoke(spark):
    out = _collect(spark, "text_simpson_diversity").set_index("source")
    docs = pd.read_parquet(f"{SF_SMOKE_DIR}/documents.parquet")
    for src, grp in docs.groupby("source"):
        tf = pd.Series(
            [t for txt in grp["text"] for t in txt.split(" ")]
        ).value_counts()
        n = int(tf.sum())
        same = int((tf * (tf - 1)).sum())
        row = out.loc[src]
        assert int(row["n_tokens"]) == n
        assert int(row["vocab"]) == len(tf)
        assert int(row["simpson_d_e9"]) == int(_rha(same / n / (n - 1) * 1e9)[()])
        assert int(row["berger_parker_e9"]) == int(
            _rha(int(tf.max()) / n * 1e9)[()]
        )
