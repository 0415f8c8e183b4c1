"""Behavior tests for round-9 wave 8g: l-diversity, FD profiling,
Neyman allocation, funnel time-to-convert — pinned against pandas /
pure-Python recomputation."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def test_l_diversity_matches_pandas(spark):
    qi = duckdb.sql(f"""
        SELECT CAST(FLOOR(epoch(ts)/86400) AS BIGINT) % 7 AS dow,
               CAST(FLOOR(value/25) AS BIGINT) AS band,
               event_type, COUNT(*) AS c
        FROM '{SF_SMOKE_DIR}/events.parquet' GROUP BY 1, 2, 3
    """).df()
    min_l, below, at_risk, min_ent = 10**9, 0, 0, None
    for _, g in qi.groupby(["dow", "band"]):
        l = len(g)
        n = int(g["c"].sum())
        ent_num = sum(int(c) * _rha(math.log(n / c) * 1e9) for c in g["c"])
        ent = _rha(ent_num / n)
        min_l = min(min_l, l)
        if l < 3:
            below += 1
            at_risk += n
        min_ent = ent if min_ent is None else min(min_ent, ent)
    pdf = _collect(spark, "dq_l_diversity")
    assert int(pdf["min_l"][0]) == min_l
    assert int(pdf["n_classes_below_l"][0]) == below
    assert int(pdf["n_rows_at_risk"][0]) == at_risk
    assert int(pdf["min_entropy_e9"][0]) == min_ent
    # entropy l-diversity consistency: min entropy <= ln(min_l)
    assert int(pdf["min_entropy_e9"][0]) <= _rha(math.log(max(min_l, 1)) * 1e9) + 1


def test_functional_dependencies_key_candidates_hold(spark):
    pdf = _collect(spark, "dq_functional_dependencies").set_index("fd")
    # key-led FDs must hold exactly
    for fd in ("o_orderkey->o_custkey", "o_orderkey->o_orderpriority"):
        assert bool(pdf.loc[fd, "holds"])
        assert int(pdf.loc[fd, "n_violating"]) == 0
        assert int(pdf.loc[fd, "n_extra_pairs"]) == 0
    # and the counts reconcile with direct recomputation
    for fd in pdf.index:
        lhs, rhs = fd.split("->")
        d = duckdb.sql(f"""
            SELECT COUNT(*) AS n_lhs,
                   SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS v,
                   SUM(nd) - COUNT(*) AS extra
            FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd
                  FROM '{SF_SMOKE_DIR}/orders.parquet' GROUP BY {lhs})
        """).fetchone()
        assert int(pdf.loc[fd, "n_lhs"]) == d[0]
        assert int(pdf.loc[fd, "n_violating"]) == d[1]
        assert int(pdf.loc[fd, "n_extra_pairs"]) == d[2]


def test_neyman_allocation_matches_numpy(spark):
    df = duckdb.sql(f"""
        SELECT event_type, CAST(ROUND(value*1000) AS BIGINT) AS v
        FROM '{SF_SMOKE_DIR}/events.parquet'
    """).df()
    pdf = _collect(spark, "sample_neyman_allocation").set_index("event_type")
    ws = {}
    for et, g in df.groupby("event_type"):
        v = g["v"].to_numpy(np.float64)
        n = len(v)
        s1, s2 = float(v.sum()), float((v.astype(np.int64) ** 2).sum())
        sd_e6 = _rha(math.sqrt((s2 - s1 * s1 / n) / (n - 1)) * 1000)
        w_e3 = _rha(n * sd_e6 / 1000)
        ws[et] = (n, sd_e6, w_e3)
    tw = sum(w for _, _, w in ws.values())
    for et, (n, sd_e6, w_e3) in ws.items():
        row = pdf.loc[et]
        assert int(row["n_rows"]) == n
        assert int(row["sd_e6"]) == sd_e6
        assert int(row["w_e3"]) == w_e3
        assert int(row["alloc"]) == _rha(1000.0 * w_e3 / tw)
    # allocations sum to budget within rounding slack (one per stratum)
    assert abs(int(pdf["alloc"].sum()) - 1000) <= len(pdf)


def test_time_to_convert_matches_pandas(spark):
    ev = duckdb.sql(f"""
        SELECT user_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
        FROM '{SF_SMOKE_DIR}/events.parquet'
    """).df()
    deltas = {}
    viewers = 0
    for uid, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]["sec"]
        if views.empty:
            continue
        viewers += 1
        v0 = int(views.min())
        p = g[(g["event_type"] == "purchase") & (g["sec"] >= v0)]["sec"]
        if not p.empty:
            deltas[uid] = int(p.min()) - v0
    ordered = sorted(deltas.items(), key=lambda kv: (kv[1], kv[0]))
    n_conv = len(ordered)
    med = ordered[(n_conv + 1) // 2 - 1][1]
    p90 = ordered[math.ceil(n_conv * 0.9) - 1][1]
    pdf = _collect(spark, "funnel_time_to_convert")
    assert int(pdf["n_viewers"][0]) == viewers
    assert int(pdf["n_conv"][0]) == n_conv
    assert int(pdf["median_delta_s"][0]) == med
    assert int(pdf["p90_delta_s"][0]) == p90
    assert int(pdf["conversion_e6"][0]) == _rha(n_conv * 1e6 / viewers)
    assert int(pdf["mean_delta_ms"][0]) == _rha(
        sum(deltas.values()) * 1000 / n_conv
    )
    # sanity: deltas non-negative, median <= p90
    assert 0 <= med <= p90
