"""Regression tests for the four round-11 ADVICE items (round 12).

Each test builds the exact fixture the advice described as silently
wrong and pins the fixed behavior, Spark vs a DuckDB run of the same
oracle text on the fixture (so the fix is proven on BOTH engines, not
just on the real tables where the edge never fires).

Items:
1. (high) timeseries_spectral_periodogram's power_share_e9 carried a
   spurious *n — a share of VARIANCE must land in [0, 1e9].
2. (low) stats_fisher_combined / stats_kruskal_wallis inner-joined the
   pinned chi2 lookup: a family past the table silently returned zero
   rows. Lookup extended to df<=80 + LEFT JOIN with a loud in-plan
   guard past it; the lookup values themselves are re-derived here.
3. (low) stats_hill_tail_index silently omitted metrics with < 101
   positive rows; now every metric emits a row with n_insufficient.
4. (low) events_markov_absorption dropped states seen only as a
   transition TARGET from the value-iteration state list, treating
   dead ends as h = 0 like the absorbing state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def _collect(spark, name, sf_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _duck_oracle(name, sf_dir, tables):
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


def _rha(x):
    """SQL ROUND (half away from zero) as numpy."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _events_frame(event_ids, values, event_types="view", user_ids=None):
    n = len(event_ids)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.arange(n), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.asarray(event_ids, dtype=np.int64),
            "ts": ts,
            "user_id": np.asarray(
                user_ids if user_ids is not None else event_ids,
                dtype=np.int64,
            ),
            "event_type": event_types,
            "value": np.asarray(values, dtype=np.float64),
            "props": "{}",
        }
    )


# ---------------------------------------------------------------------------
# ADVICE 1 (high): periodogram power share is a fraction of variance
# ---------------------------------------------------------------------------


def test_periodogram_share_is_a_fraction(spark, tmp_path):
    """A planted pure 24h cycle: the true share is ~0.996e9. The pre-fix
    formula (extra *n) emitted ~239e9 on this fixture — the [0, 1e9]
    band is the discriminator, and both engines must agree exactly."""
    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-01-01")
    for h in range(240):
        cnt = int(10 + 8 * math.sin(2 * math.pi * h / 24))
        for i in range(cnt):
            rows.append(
                (eid, t0 + pd.Timedelta(hours=h, seconds=i), eid % 7,
                 "view", 1.0, "{}")
            )
            eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    ).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_spectral_periodogram", str(tmp_path))
    assert (out["power_share_e9"] >= 0).all()
    assert (out["power_share_e9"] <= 1_001_000_000).all()
    dom = out[out["is_dominant"]].iloc[0]
    assert int(dom["period_h"]) == 24
    assert 900_000_000 < int(dom["power_share_e9"]) <= 1_001_000_000
    _frames_equal(
        out,
        _duck_oracle(
            "timeseries_spectral_periodogram", tmp_path, ["events"]
        ),
    )


# ---------------------------------------------------------------------------
# ADVICE 2 (low): chi2 lookup — extended range + loud guard past it
# ---------------------------------------------------------------------------


def _gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x), double precision
    (series below a+1, Lentz continued fraction above)."""
    if x <= 0:
        return 0.0
    if x < a + 1:
        term = 1.0 / a
        s = term
        n = a
        while True:
            n += 1
            term *= x / n
            s += term
            if abs(term) < abs(s) * 1e-17:
                break
        return s * math.exp(-x + a * math.log(x) - math.lgamma(a))
    tiny = 1e-300
    b = x + 1 - a
    c = 1 / tiny
    d = 1 / b
    h = d
    i = 1
    while True:
        an = -i * (i - a)
        b += 2
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1 / d
        delta = d * c
        h *= delta
        if abs(delta - 1) < 1e-16:
            break
        i += 1
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1 - q


def _chi2_ppf95(df: int) -> float:
    a = df / 2.0
    lo, hi = 0.0, df + 100.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if _gammainc_p(a, mid / 2) < 0.95:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def test_chi2_lookup_values_rederived():
    """Every pinned (df, crit_e6) row in _KW_CRIT re-derives from the
    regularized incomplete gamma at e6 precision (1..80 contiguous)."""
    import duckdb

    from emr_with_custom_metrics_spark.operators.wave11a import _KW_CRIT

    rows = duckdb.connect().execute(_KW_CRIT).fetchall()
    assert [df for df, _ in sorted(rows)] == list(range(1, 81))
    for df, crit_e6 in rows:
        assert crit_e6 == round(_chi2_ppf95(df) * 1e6), df


def _metric_family_frame(k: int, rows_per_metric: int = 80):
    """k metrics, each with plenty of distinct users (both md5 arms hit)
    and mild per-metric mean differences so every Welch z is finite."""
    recs = []
    eid = 0
    for m in range(k):
        for i in range(rows_per_metric):
            recs.append((eid, eid, f"m{m:03d}", 10.0 + m * 0.01 + (i % 5)))
            eid += 1
    ids = [r[0] for r in recs]
    return _events_frame(
        ids,
        [r[3] for r in recs],
        event_types=[r[2] for r in recs],
        user_ids=[r[1] for r in recs],
    )


def test_fisher_six_metrics_now_covered(spark, tmp_path):
    """m=6 -> df=12: pre-fix the df<=11 lookup dropped the whole family
    to zero rows. Now all six rows emit, cross-engine identical."""
    _metric_family_frame(6).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_fisher_combined", str(tmp_path))
    assert len(out) == 6
    assert (out["df"] == 12).all()
    _frames_equal(
        out, _duck_oracle("stats_fisher_combined", tmp_path, ["events"])
    )


def test_kruskal_thirteen_groups_now_covered(spark, tmp_path):
    """k=13 -> df=12: same silent-empty class, same fix."""
    _metric_family_frame(13).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_kruskal_wallis", str(tmp_path))
    assert len(out) == 13
    assert (out["df"] == 12).all()
    _frames_equal(
        out, _duck_oracle("stats_kruskal_wallis", tmp_path, ["events"])
    )


def test_fisher_past_lookup_raises_loudly(spark, tmp_path):
    """m=41 -> df=82 > 80: both engines must RAISE the lookup message,
    never return zero rows."""
    import duckdb

    from emr_with_custom_metrics_spark.registry import all_specs

    _metric_family_frame(41, rows_per_metric=40).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    with pytest.raises(Exception, match="chi2 5% critical lookup"):
        _collect(spark, "stats_fisher_combined", str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    with pytest.raises(duckdb.Error, match="chi2 5% critical lookup"):
        con.execute(all_specs()["stats_fisher_combined"].oracle).df()
    con.close()


def test_kruskal_past_lookup_raises_loudly(spark, tmp_path):
    """k=82 -> df=81 > 80: the KW side of the same guard."""
    import duckdb

    from emr_with_custom_metrics_spark.registry import all_specs

    _metric_family_frame(82, rows_per_metric=12).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    with pytest.raises(Exception, match="chi2 5% critical lookup"):
        _collect(spark, "stats_kruskal_wallis", str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    with pytest.raises(duckdb.Error, match="chi2 5% critical lookup"):
        con.execute(all_specs()["stats_kruskal_wallis"].oracle).df()
    con.close()


# ---------------------------------------------------------------------------
# ADVICE 3 (low): Hill emits a flagged row for thin metrics
# ---------------------------------------------------------------------------


def test_hill_thin_metric_flagged_not_dropped(spark, tmp_path):
    """One metric with 300 positive values, one with 50: pre-fix the
    thin one vanished; now it carries n_insufficient = TRUE with zeroed
    estimates, and the thick one replays exactly in numpy."""
    vals_big = 1.0 + np.arange(300) * 0.013
    vals_small = 2.0 + np.arange(50) * 0.01
    n = 350
    frame = _events_frame(
        np.arange(n),
        np.concatenate([vals_big, vals_small]),
        event_types=["big"] * 300 + ["small"] * 50,
    )
    frame.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_hill_tail_index", str(tmp_path))
    assert sorted(out["event_type"]) == ["big", "small"]
    s = out[out["event_type"] == "small"].iloc[0]
    assert bool(s["n_insufficient"])
    assert int(s["n_pos"]) == 50
    assert int(s["k"]) == 0
    assert int(s["xk1_e3"]) == 0
    assert int(s["hill_gamma_e9"]) == 0
    assert int(s["alpha_e6"]) == 0
    assert not bool(s["heavy_tail"])

    b = out[out["event_type"] == "big"].iloc[0]
    assert not bool(b["n_insufficient"])
    v_e3 = _rha(vals_big * 1000)
    desc = np.sort(v_e3)[::-1]
    xk1 = int(desc[100])  # rn = 101 (1-based)
    lnr = _rha(np.log(desc[:100].astype(np.float64) / xk1) * 1e9)
    s_e9 = int(lnr.sum())
    assert int(b["xk1_e3"]) == xk1
    assert int(b["hill_gamma_e9"]) == int(_rha(s_e9 / 100)[()])
    assert int(b["alpha_e6"]) == int(_rha(100.0 / s_e9 * 1e9 * 1e6)[()])
    _frames_equal(
        out, _duck_oracle("stats_hill_tail_index", tmp_path, ["events"])
    )


# ---------------------------------------------------------------------------
# ADVICE 4 (low): markov absorption — dead-end states saturate, not h=0
# ---------------------------------------------------------------------------


def test_markov_dead_end_state_saturates(spark, tmp_path):
    """States: view -> purchase (u1), view -> dead (u2). 'dead' has no
    outgoing rows; pre-fix it was absent from the state list, so
    view's expected steps collapsed to 1.0 (converged). Now 'dead'
    rides an implicit self-loop (h grows 1e6/round, converged=false)
    and view honestly reads 20.5 steps after 40 rounds, unconverged."""
    frame = _events_frame(
        [0, 1, 2, 3],
        [1.0, 1.0, 1.0, 1.0],
        event_types=["view", "purchase", "view", "dead"],
        user_ids=[1, 1, 2, 2],
    )
    frame.to_parquet(tmp_path / "events.parquet", index=False)
    out = (
        _collect(spark, "events_markov_absorption", str(tmp_path))
        .set_index("state")
        .sort_index()
    )
    assert sorted(out.index) == ["dead", "purchase", "view"]
    d = out.loc["dead"]
    assert int(d["n_transitions"]) == 0
    assert int(d["exp_steps_e6"]) == 40_000_000
    assert int(d["exp_steps_prev_e6"]) == 39_000_000
    assert not bool(d["converged"])
    p = out.loc["purchase"]
    assert int(p["exp_steps_e6"]) == 0
    assert bool(p["converged"])
    v = out.loc["view"]
    assert int(v["n_transitions"]) == 2
    # h(view) = 1 + (h(dead) + h(purchase)) / 2 -> 1e6 + 39e6/2
    assert int(v["exp_steps_e6"]) == 20_500_000
    assert not bool(v["converged"])
    _frames_equal(
        out.reset_index(),
        _duck_oracle("events_markov_absorption", tmp_path, ["events"]),
    )
