"""Behavior tests for round-9 wave 8f: DBSCAN, Theil-Sen, sequential
patterns — full labelings/estimates pinned against independent
numpy/pure-Python reimplementations (union-find CC, brute median,
re-module containment)."""

from __future__ import annotations

import math
import re

import duckdb
import numpy as np

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# DBSCAN
# ---------------------------------------------------------------------------


def _dbscan_brute(sf_dir: str, minpts: int = 4):
    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    ids = df["vec_id"].to_numpy(np.int64)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    n = len(ids)
    adj = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            # engine's quantize-then-compare edge rule
            if _rha(S[i, j] * 1e6) / 1e6 >= 0.3:
                adj[i].append(j)
                adj[j].append(i)
    core = [len(a) >= minpts for a in adj]
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if core[i]:
            for j in adj[i]:
                if core[j]:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    label = {}
    comp_min: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, int(ids[i])), int(ids[i]))
    out = {}
    for i in range(n):
        if core[i]:
            out[int(ids[i])] = ("core", comp_min[find(i)])
        else:
            cand = [comp_min[find(j)] for j in adj[i] if core[j]]
            if cand:
                out[int(ids[i])] = ("border", min(cand))
            else:
                out[int(ids[i])] = ("noise", -1)
    return out


def test_dbscan_matches_bruteforce_unionfind(spark):
    pdf = _collect(spark, "cluster_dbscan_embeddings")
    got = {
        int(r.vec_id): (r.role, int(r.cluster)) for r in pdf.itertuples()
    }
    assert got == _dbscan_brute(SF_SMOKE_DIR)


def test_dbscan_structural_invariants(spark):
    pdf = _collect(spark, "cluster_dbscan_embeddings")
    # noise has cluster -1, everything labeled has a core representative
    noise = pdf[pdf["role"] == "noise"]
    assert (noise["cluster"] == -1).all()
    labeled = pdf[pdf["role"] != "noise"]
    core_ids = set(pdf[pdf["role"] == "core"]["vec_id"].astype(int))
    # every cluster label is itself a CORE point's id (min of component)
    assert set(labeled["cluster"].astype(int)) <= core_ids
    # a core point's label is <= its own id (min-label propagation)
    cores = pdf[pdf["role"] == "core"]
    assert (cores["cluster"] <= cores["vec_id"]).all()


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------


def test_theil_sen_matches_brute_median(spark):
    daily = duckdb.sql(f"""
        SELECT event_type, CAST(FLOOR(epoch(ts)/86400) AS BIGINT) AS d,
               COUNT(*) AS y
        FROM '{SF_SMOKE_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pdf = _collect(spark, "stats_theil_sen_trend").set_index("event_type")
    for et, g in daily.groupby("event_type"):
        y = g.sort_values("d")["y"].to_numpy(np.int64)
        t = np.arange(len(y), dtype=np.int64)
        slopes = sorted(
            (_rha((y[j] - y[i]) / (j - i) * 1e6), i, j)
            for i in range(len(y))
            for j in range(i + 1, len(y))
        )
        m = len(slopes)
        slope = slopes[(m + 1) // 2 - 1][0]
        resid = sorted(
            (int(y[i]) * 1_000_000 - slope * int(t[i]), int(t[i]))
            for i in range(len(y))
        )
        intercept = resid[(len(y) + 1) // 2 - 1][0]
        row = pdf.loc[et]
        assert int(row["n_days"]) == len(y)
        assert int(row["n_pairs"]) == m
        assert int(row["slope_e6"]) == slope
        assert int(row["intercept_e6"]) == intercept


def test_theil_sen_is_outlier_robust_semantics(spark):
    # the estimator ignores <=29% wild values: check the slope is within
    # the range of pairwise slopes and the intercept within data range
    pdf = _collect(spark, "stats_theil_sen_trend")
    assert (pdf["n_pairs"] == pdf["n_days"] * (pdf["n_days"] - 1) // 2).all()


# ---------------------------------------------------------------------------
# Sequential patterns
# ---------------------------------------------------------------------------


def test_sequence_patterns_match_python_re(spark):
    ev = duckdb.sql(f"""
        SELECT user_id, ts, event_id, SUBSTR(event_type, 1, 1) AS c
        FROM '{SF_SMOKE_DIR}/events.parquet' ORDER BY user_id, ts, event_id
    """).df()
    seqs = {
        uid: "".join(g.sort_values(["ts", "event_id"])["c"])
        for uid, g in ev.groupby("user_id")
    }
    codes = sorted(set(ev["c"]))
    n_users = len(seqs)
    want = {}
    pats = [(a, b) for a in codes for b in codes] + [
        (a, b, c) for a in codes for b in codes for c in codes
    ]
    for p in pats:
        rx = re.compile(".*".join(p))
        n_sup = sum(1 for s in seqs.values() if rx.search(s))
        if n_sup * 20 >= n_users:
            want[">".join(p)] = (
                len(p),
                n_sup,
                _rha(n_sup * 1e6 / n_users),
            )
    pdf = _collect(spark, "events_sequence_patterns")
    got = {
        r.pattern: (int(r.k), int(r.n_sup), int(r.support_e6))
        for r in pdf.itertuples()
    }
    assert got == want


def test_sequence_patterns_support_is_antimonotone(spark):
    # Apriori property: support(<a,b,c>) <= support(<a,b>) for its
    # length-2 prefix (and <b,c> suffix) when both are reported
    pdf = _collect(spark, "events_sequence_patterns")
    sup = {r.pattern: int(r.n_sup) for r in pdf.itertuples()}
    for pat, n in sup.items():
        parts = pat.split(">")
        if len(parts) == 3:
            for sub in (f"{parts[0]}>{parts[1]}", f"{parts[1]}>{parts[2]}"):
                if sub in sup:
                    assert n <= sup[sub]
