"""Behavior tests for wave 10b (ML-eval completions, retrieval eval,
inequality, mining, attribution) — independent numpy/pandas replays
plus structural invariants (decile allocation conservation, Shapley
efficiency, Lorenz monotonicity, MRR consistency).
"""

from __future__ import annotations

import math
from itertools import combinations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _events():
    return duckdb.sql(
        "SELECT user_id, event_type, CAST(ROUND(value*1000) AS BIGINT) "
        f"AS v_e3, epoch_us(ts) AS us FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()


# ---------------------------------------------------------------------------
# F1 threshold
# ---------------------------------------------------------------------------


def test_f1_best_threshold_matches_numpy(spark):
    out = _collect(spark, "ml_f1_threshold")
    ev = _events()
    y = (ev["event_type"] == "purchase").to_numpy(dtype=np.int64)
    s = ev["v_e3"].to_numpy(dtype=np.int64)
    best = None
    for thr in np.unique(s):
        pred = s >= thr
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        fn = int(y.sum()) - tp
        f1_e9 = math.floor(2 * tp * 1e9 / (2 * tp + fp + fn) + 0.5)
        key = (-f1_e9, thr)
        if best is None or key < best[0]:
            best = (key, thr, tp, fp, fn, f1_e9)
    r = out[out["rnk"] == 1].iloc[0]
    assert int(r["threshold_e3"]) == best[1]
    assert (int(r["tp"]), int(r["fp"]), int(r["fn"])) == best[2:5]
    assert int(r["f1_e9"]) == best[5]


# ---------------------------------------------------------------------------
# Lift / gains
# ---------------------------------------------------------------------------


def test_lift_allocation_conserves_rows_and_positives(spark):
    out = _collect(spark, "ml_lift_gains")
    ev = _events()
    n = len(ev)
    p = int((ev["event_type"] == "purchase").sum())
    assert int(out["n_rows"].sum()) == n
    # pro-rata allocations each round at e9; the total drifts by at
    # most one ulp per straddling tie group
    assert abs(int(out["pos_e9"].sum()) - p * 10**9) <= 20
    assert int(out.iloc[-1]["cum_gain_e6"]) in (999999, 1000000, 1000001)
    cg = out.sort_values("decile")["cum_gain_e6"].to_numpy()
    assert (np.diff(cg) >= 0).all()


def test_lift_concentrates_on_perfect_score(spark, tmp_path):
    """Score == label separates perfectly: decile 1 captures every
    positive (base rate 10% -> lift 10x in decile 1, 0 elsewhere)."""
    import pandas as pd

    n = 1000
    y = np.zeros(n, dtype=np.int64)
    y[:100] = 1
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": np.where(y == 1, "purchase", "view"),
            "value": np.where(y == 1, 900.0, 1.0) + np.arange(n) * 1e-3,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "ml_lift_gains", sf_dir=str(tmp_path))
    out = out.set_index("decile")
    assert int(out.loc[1, "pos_e9"]) == 100 * 10**9
    assert int(out.loc[1, "lift_e6"]) == 10_000_000
    assert int(out.loc[1, "cum_gain_e6"]) == 1_000_000
    assert (out.loc[2:, "pos_e9"] == 0).all()


# ---------------------------------------------------------------------------
# MRR
# ---------------------------------------------------------------------------


def test_mrr_truth_and_ranks_match_numpy(spark):
    out = _collect(spark, "retrieval_mrr_eval")
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE_DIR}/embeddings.parquet'"
    ).df()
    ids = emb["vec_id"].to_numpy()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    s = V * 127 / np.abs(V).max(axis=1, keepdims=True)
    q8 = np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5))
    q8n = q8 / np.linalg.norm(q8, axis=1, keepdims=True)
    def _round_half_away(x: np.ndarray) -> np.ndarray:
        # SQL ROUND is half-away-from-zero; np.round/floor(x+.5) are not
        return np.where(x >= 0, np.floor(x + 0.5),
                        np.ceil(x - 0.5)).astype(np.int64)

    for _, r in out.iterrows():
        qi = int(np.where(ids == r["qid"])[0][0])
        c = _round_half_away(Vn @ Vn[qi] * 1e6)
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-c[i], ids[i]),
        )
        assert ids[order[0]] == r["truth_id"]
        c8 = _round_half_away(q8n @ q8n[qi] * 1e6)
        ti = int(np.where(ids == r["truth_id"])[0][0])
        better = sum(
            1
            for i in range(len(ids))
            if i != qi and (c8[i] > c8[ti]
                            or (c8[i] == c8[ti] and ids[i] < ids[ti]))
        )
        assert int(r["rank_int8"]) == 1 + better
    rr = out["rr_e6"].to_numpy(dtype=np.float64)
    assert int(out.iloc[0]["mrr_e6"]) == math.floor(rr.mean() + 0.5)
    assert (out["mrr_e6"].nunique()) == 1


def test_mrr_int8_barely_hurts_at_dim64(spark):
    """int8 symmetric quantization at dim 64 keeps the true NN at or
    near rank 1 for the overwhelming majority of queries."""
    out = _collect(spark, "retrieval_mrr_eval")
    assert int(out.iloc[0]["mrr_e6"]) > 500_000
    assert bool(out["hit_at_5"].mean() >= 0.7)


# ---------------------------------------------------------------------------
# Gini / Lorenz
# ---------------------------------------------------------------------------


def test_gini_matches_numpy(spark):
    out = _collect(spark, "stats_gini_lorenz")
    sp = duckdb.sql(
        "SELECT c.c_custkey, COALESCE(SUM(CAST(ROUND(o.o_totalprice*100) "
        "AS BIGINT)), 0) AS x "
        f"FROM '{SF_SMOKE_DIR}/customer.parquet' c "
        f"LEFT JOIN '{SF_SMOKE_DIR}/orders.parquet' o "
        "ON c.c_custkey = o.o_custkey GROUP BY 1"
    ).df().sort_values(["x", "c_custkey"])
    x = sp["x"].to_numpy(dtype=np.int64)
    n = len(x)
    s = int(x.sum())
    s1 = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
    gini = 2 * s1 / (n * s) - (n + 1) / n
    assert int(out.iloc[0]["gini_e9"]) == math.floor(gini * 1e9 + 0.5)
    cum = np.cumsum(x)
    for _, r in out.iterrows():
        k = math.floor(int(r["decile"]) * n / 10)
        assert int(r["cum_customers"]) == k
        share = cum[k - 1] / s
        assert int(r["cum_spend_share_e6"]) == math.floor(share * 1e6 + 0.5)
    shares = out.sort_values("decile")["cum_spend_share_e6"].to_numpy()
    assert (np.diff(shares) >= 0).all()
    assert int(shares[-1]) == 1_000_000


# ---------------------------------------------------------------------------
# Seasonal-naive backtest
# ---------------------------------------------------------------------------


def test_backtest_matches_numpy(spark):
    out = _collect(spark, "timeseries_backtest_snaive")
    ev = _events()
    ev["h"] = ev["us"] // 3_600_000_000
    hmin, hmax = int(ev["h"].min()), int(ev["h"].max())
    for (et, hz), grp in out.groupby(["event_type", "horizon"]):
        g = ev[ev["event_type"] == et].groupby("h").size()
        y = np.array([g.get(h, 0) for h in range(hmin, hmax + 1)],
                     dtype=np.int64)
        lag = int(hz)
        test0 = 168
        ae = np.abs(y[test0:] - y[test0 - lag:len(y) - lag])
        r = grp.iloc[0]
        assert int(r["n_test"]) == len(ae)
        assert int(r["mae_e6"]) == math.floor(ae.mean() * 1e6 + 0.5)
        assert int(r["rmse_e6"]) == math.floor(
            math.sqrt((ae.astype(np.float64) ** 2).mean()) * 1e6 + 0.5)
    # weekly seasonal naive should not beat daily by an order of
    # magnitude on 24h-periodic traffic — both present, 10 rows
    assert len(out) == 10


# ---------------------------------------------------------------------------
# PrefixSpan with gap
# ---------------------------------------------------------------------------


def test_prefixspan_gap_matches_pandas(spark):
    out = _collect(spark, "events_prefixspan_gap")
    ev = _events().sort_values(["user_id", "us"])
    ev["eid"] = duckdb.sql(
        f"SELECT event_id FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()["event_id"].reindex(ev.index)
    from collections import defaultdict

    sup = defaultdict(set)
    occ = defaultdict(int)
    gap = 86400_000_000
    for uid, g in ev.groupby("user_id"):
        rows = list(g[["event_type", "us", "eid"]].itertuples(index=False))
        n = len(rows)
        for i in range(n):
            for j in range(n):
                if (rows[j].us, rows[j].eid) <= (rows[i].us, rows[i].eid):
                    continue
                if rows[j].us > rows[i].us + gap:
                    continue
                for k in range(n):
                    if (rows[k].us, rows[k].eid) <= (rows[j].us,
                                                     rows[j].eid):
                        continue
                    if rows[k].us > rows[j].us + gap:
                        continue
                    pat = (f"{rows[i].event_type}>{rows[j].event_type}"
                           f">{rows[k].event_type}")
                    sup[pat].add(uid)
                    occ[pat] += 1
    want = sorted(
        ((len(u), occ[p], p) for p, u in sup.items()),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:15]
    got = list(
        out[["support", "occurrences", "pattern"]].itertuples(index=False)
    )
    assert [(w[2], w[0], w[1]) for w in want] == [
        (g.pattern, int(g.support), int(g.occurrences)) for g in got
    ]


# ---------------------------------------------------------------------------
# Shapley attribution
# ---------------------------------------------------------------------------


def _shapley_numpy(mask_counts: dict[int, int]) -> dict[int, int]:
    def v(S: int) -> int:
        return sum(c for m, c in mask_counts.items() if (m & S) == m)

    w = {0: 6, 1: 2, 2: 2, 3: 6}
    phi = {}
    for bit in (1, 2, 4, 8):
        tot = 0
        for S in range(16):
            if S & bit:
                continue
            k = bin(S).count("1")
            tot += w[k] * (v(S | bit) - v(S))
        phi[bit] = tot
    return phi


def test_shapley_matches_numpy_and_efficiency(spark):
    out = _collect(spark, "attribution_shapley_channels")
    ev = _events()
    fp = (
        ev[ev["event_type"] == "purchase"].groupby("user_id")["us"].min()
    )
    bits = {"view": 1, "click": 2, "signup": 4, "error": 8}
    mask_counts: dict[int, int] = {}
    for uid, t in fp.items():
        pre = ev[(ev["user_id"] == uid) & (ev["us"] < t)]
        m = 0
        for ch, b in bits.items():
            if (pre["event_type"] == ch).any():
                m |= b
        mask_counts[m] = mask_counts.get(m, 0) + 1
    phi = _shapley_numpy(mask_counts)
    got = out.set_index("channel")["phi_x24"].to_dict()
    for ch, b in bits.items():
        assert int(got[ch]) == phi[b]
    # efficiency: sum phi = v(full) - v(empty), both engines
    total = int(out.iloc[0]["attributable"])
    assert sum(phi.values()) == 24 * total
    assert int(out["phi_x24"].sum()) == 24 * total


# ---------------------------------------------------------------------------
# Apriori triples
# ---------------------------------------------------------------------------


def test_apriori_triples_match_pandas(spark):
    out = _collect(spark, "basket_apriori_triples")
    items = duckdb.sql(
        "SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b "
        f"FROM '{SF_SMOKE_DIR}/lineitem.parquet' l "
        f"JOIN '{SF_SMOKE_DIR}/part.parquet' p ON l.l_partkey = p.p_partkey"
    ).df()
    n_orders = items["o"].nunique()
    sup1 = items.groupby("b").size().to_dict()
    from collections import Counter

    sup2: Counter = Counter()
    sup3: Counter = Counter()
    for o, g in items.groupby("o"):
        bs = sorted(g["b"])
        for a, b in combinations(bs, 2):
            sup2[(a, b)] += 1
        for a, b, c in combinations(bs, 3):
            sup3[(a, b, c)] += 1
    rows = []
    for (a, b, c), s in sup3.items():
        if s < 5:
            continue
        conf = math.floor(s * 1e6 / sup2[(a, b)] + 0.5)
        lift = math.floor(s * n_orders * 1e6 / (sup2[(a, b)] * sup1[c])
                          + 0.5)
        rows.append((lift, a, b, c, s, conf))
    rows.sort(key=lambda t: (-t[0], t[1], t[2], t[3]))
    want = rows[:10]
    assert len(out) == len(want)
    for got, w in zip(out.itertuples(index=False), want):
        assert (got.b1, got.b2, got.b3) == (w[1], w[2], w[3])
        assert int(got.sup_abc) == w[4]
        assert int(got.confidence_e6) == w[5]
        assert int(got.lift_e6) == w[0]
