"""Behavior tests for round-9 wave 8e: AUC/AP, calibration bins,
target encoding, mutual information — each pinned against an
independent numpy reimplementation plus the structural
invariants (rank identity, probability bounds, LOO leak-freeness,
information inequalities).
"""

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


def _rankdata(v: np.ndarray) -> np.ndarray:
    """Tie-averaged ascending ranks (scipy.stats.rankdata('average');
    scipy is not in this container)."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    i = 0
    sv = v[order]
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # avg of positions i+1..j
        i = j
    return ranks


def _events_scored(sf_dir: str):
    df = duckdb.sql(f"""
        SELECT CAST(ROUND(value * 1000) AS BIGINT) AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM '{sf_dir}/events.parquet'
    """).df()
    return df["v"].to_numpy(np.int64), df["y"].to_numpy(np.int64)


# ---------------------------------------------------------------------------
# AUC / AP
# ---------------------------------------------------------------------------


def test_auc_matches_rank_identity(spark):
    v, y = _events_scored(SF_SMOKE_DIR)
    r = _rankdata(v)  # tie-averaged ranks, ascending
    np_pos, np_neg = int(y.sum()), int((1 - y).sum())
    auc = (r[y == 1].sum() - np_pos * (np_pos + 1) / 2) / (np_pos * np_neg)
    pdf = _collect(spark, "ml_eval_auc_pr")
    assert int(pdf["n_pos"][0]) == np_pos and int(pdf["n_neg"][0]) == np_neg
    assert abs(int(pdf["auc_e9"][0]) - auc * 1e9) <= 1


def test_ap_matches_sklearn_definition(spark):
    v, y = _events_scored(SF_SMOKE_DIR)
    # sklearn average_precision_score: sum_k (R_k - R_{k-1}) * P_k over
    # descending distinct thresholds
    order = np.argsort(-v, kind="stable")
    vs, ys = v[order], y[order]
    np_pos = int(y.sum())
    ap = 0.0
    tp = fp = 0
    i = 0
    while i < len(vs):
        j = i
        while j < len(vs) and vs[j] == vs[i]:
            j += 1
        dtp = int(ys[i:j].sum())
        tp += dtp
        fp += (j - i) - dtp
        if dtp > 0:
            ap += dtp * tp / (tp + fp)
        i = j
    ap /= np_pos
    pdf = _collect(spark, "ml_eval_auc_pr")
    # engine quantizes each term to e9 before the sum: allow one quantum
    # per threshold group of slack, which is still << 1e-5 relative
    assert abs(int(pdf["ap_e9"][0]) / 1e9 - ap) < 1e-5
    # AUC of a near-random score should land near 0.5, AP near base rate
    assert 0.3 < int(pdf["auc_e9"][0]) / 1e9 < 0.7


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def test_calibration_bins_partition_and_bound(spark):
    v, y = _events_scored(SF_SMOKE_DIR)
    pdf = _collect(spark, "ml_calibration_bins").sort_values("bin")
    assert int(pdf["n_rows"].sum()) == len(v)
    assert int(pdf["n_pos"].sum()) == int(y.sum())
    assert set(pdf["bin"]) <= set(range(10))
    assert ((pdf["pos_rate_e6"] >= 0) & (pdf["pos_rate_e6"] <= 1_000_000)).all()
    # mean predicted score must increase with bin (percent-rank is
    # monotone in the bin cut by construction)
    assert pdf["mean_score_e6"].is_monotonic_increasing


def test_calibration_brier_matches_direct(spark):
    v, y = _events_scored(SF_SMOKE_DIR)
    r2 = (2 * _rankdata(v)).astype(np.int64)  # doubled tie-averaged ranks
    n = len(v)
    pr_e6 = np.array([_rha((rr - 2) / (2 * n - 2) * 1e6) for rr in r2])
    brier_cell = np.array(
        [
            _rha((1.0 - p / 1e6) ** 2 * 1e12) if yy else _rha((p / 1e6) ** 2 * 1e12)
            for p, yy in zip(pr_e6, y)
        ],
        dtype=np.int64,
    )
    pdf = _collect(spark, "ml_calibration_bins")
    got = float((pdf["brier_e12"] * pdf["n_rows"]).sum()) / pdf["n_rows"].sum()
    want = brier_cell.mean()
    # per-bin means are rounded once more; 10 bins x 0.5 quantum slack
    assert abs(got - want) <= 10


# ---------------------------------------------------------------------------
# Target encoding
# ---------------------------------------------------------------------------


def test_target_encoding_matches_direct(spark):
    agg = duckdb.sql(f"""
        SELECT o_orderpriority AS cat, COUNT(*) AS n,
               SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS s
        FROM '{SF_SMOKE_DIR}/orders.parquet' GROUP BY 1
    """).df()
    n_tot, s_tot = int(agg["n"].sum()), int(agg["s"].sum())
    prior = s_tot / n_tot
    pdf = _collect(spark, "ml_target_encoding")
    assert int(pdf["n_rows"].sum()) == n_tot
    for r in pdf.itertuples():
        row = agg[agg["cat"] == r.cat].iloc[0]
        enc = (float(int(row["s"]) - r.y) + 20.0 * s_tot / n_tot) / (
            int(row["n"]) - 1 + 20
        )
        assert abs(int(r.enc_e9) - _rha(enc * 1e9)) <= 1
        assert int(r.prior_e9) == _rha(prior * 1e9)
        expect_rows = int(row["s"]) if r.y == 1 else int(row["n"]) - int(row["s"])
        assert int(r.n_rows) == expect_rows
    # LOO direction: leaving out a positive must lower the encoding
    # below the same category's leave-out-negative encoding
    for cat in pdf["cat"].unique():
        sub = pdf[pdf["cat"] == cat].set_index("y")
        if {0, 1} <= set(sub.index):
            assert int(sub.loc[1, "enc_e9"]) < int(sub.loc[0, "enc_e9"])


# ---------------------------------------------------------------------------
# Mutual information
# ---------------------------------------------------------------------------


def test_mutual_information_matches_numpy(spark):
    cells = duckdb.sql(f"""
        SELECT event_type AS x,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) % 24 AS y,
               COUNT(*) AS c
        FROM '{SF_SMOKE_DIR}/events.parquet' GROUP BY 1, 2
    """).df()
    n = int(cells["c"].sum())
    rx = cells.groupby("x")["c"].sum()
    cy = cells.groupby("y")["c"].sum()
    mi_num = sum(
        int(r.c) * _rha(math.log(int(r.c) * n / (float(rx[r.x]) * cy[r.y])) * 1e9)
        for r in cells.itertuples()
    )
    hx_num = sum(int(v) * _rha(math.log(n / v) * 1e9) for v in rx)
    hy_num = sum(int(v) * _rha(math.log(n / v) * 1e9) for v in cy)
    pdf = _collect(spark, "events_mutual_information")
    assert int(pdf["n"][0]) == n
    assert abs(int(pdf["mi_e9"][0]) - _rha(mi_num / n)) <= 1
    assert abs(int(pdf["h_event_e9"][0]) - _rha(hx_num / n)) <= 1
    assert abs(int(pdf["h_hour_e9"][0]) - _rha(hy_num / n)) <= 1
    # information inequalities: 0 <= MI <= min(H); H <= ln(k)
    mi, hx, hy = (int(pdf[c][0]) for c in ("mi_e9", "h_event_e9", "h_hour_e9"))
    assert -100 <= mi <= min(hx, hy) + 100  # quantization slack
    assert hx <= _rha(math.log(5) * 1e9) + 100
    assert hy <= _rha(math.log(24) * 1e9) + 100
