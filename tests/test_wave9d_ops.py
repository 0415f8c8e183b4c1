"""Behavior tests for round-9 wave 8d: TextRank keywords, matrix
profile, skyline Pareto frontier.

Oracle parity is covered by test_oracle_parity's registry
parameterization; these pin the SEMANTICS against independent
plain-Python/numpy reimplementations (the differential-fuzz
discipline) plus the structural invariants the SQL can't state about
itself (dominance-freeness, nearest-neighbor optimality, trajectory
replay).
"""

from __future__ import annotations

import duckdb
import numpy as np

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# TextRank
# ---------------------------------------------------------------------------


def _rha(x: float) -> int:
    """ROUND-half-away-from-zero (SQL semantics; Python round() is
    half-to-even)."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _textrank_replay(sf_dir: str, iters: int = 5, vocab_k: int = 50):
    """Plain-Python TextRank with the engine's exact quantization."""
    rows = duckdb.sql(
        f"SELECT doc_id, string_split(text, ' ') FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    from collections import Counter, defaultdict

    freq: Counter[str] = Counter()
    for _, toks in rows:
        freq.update(t for t in toks if t)
    vocab = sorted(freq, key=lambda w: (-freq[w], w))[:vocab_k]
    vset = set(vocab)
    pair: Counter[tuple[str, str]] = Counter()
    for _, toks in rows:
        toks = [t for t in toks if t]
        for a, b in zip(toks, toks[1:]):
            if a != b and a in vset and b in vset:
                pair[(min(a, b), max(a, b))] += 1
    edges: defaultdict[str, list[tuple[str, int]]] = defaultdict(list)
    wdeg: Counter[str] = Counter()
    for (a, b), c in pair.items():
        edges[b].append((a, c))
        edges[a].append((b, c))
        wdeg[a] += c
        wdeg[b] += c
    s = {w: 10**9 for w in vocab}
    for _ in range(iters):
        nxt = {}
        for w in vocab:
            contrib = sum(
                _rha(float(s[u]) * c / wdeg[u]) for u, c in edges[w]
            )
            nxt[w] = _rha(150000000.0 + 0.85 * contrib)
        s = nxt
    return s


def test_textrank_matches_python_replay(spark):
    pdf = _collect(spark, "text_textrank_keywords")
    replay = _textrank_replay(SF_SMOKE_DIR)
    ranked = sorted(replay.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = {r.word: int(r.score_e9) for r in pdf.itertuples()}
    assert got == dict(ranked)


def test_textrank_rank_contract(spark):
    pdf = _collect(spark, "text_textrank_keywords").sort_values("rnk")
    assert list(pdf["rnk"]) == list(range(1, len(pdf) + 1))
    # scores non-increasing with rank; every score holds at least the
    # teleport floor (1-d) = 0.15
    assert (pdf["score_e9"].diff().dropna() <= 0).all()
    assert (pdf["score_e9"] >= 150_000_000).all()


# ---------------------------------------------------------------------------
# Matrix profile
# ---------------------------------------------------------------------------


def _mp_brute(sf_dir: str, m: int = 24, excl: int = 12):
    """Brute-force z-normalized nearest neighbors with the engine's
    quantization and op order (exact int moments, two separate sqrts)."""
    dense = duckdb.sql(f"""
        WITH counts AS (
            SELECT event_type, CAST(FLOOR(epoch(ts)/3600) AS BIGINT) h,
                   COUNT(*) c
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        ), b AS (SELECT MIN(h) h0, MAX(h) h1 FROM counts)
        SELECT event_type, h - (SELECT h0 FROM b) AS t, SUM(c) v
        FROM counts GROUP BY 1, 2
    """).df()
    n = int(duckdb.sql(f"""
        SELECT CAST(MAX(FLOOR(epoch(ts)/3600)) - MIN(FLOOR(epoch(ts)/3600))
               AS BIGINT) + 1
        FROM '{sf_dir}/events.parquet'
    """).fetchone()[0])
    out = {}
    for et, g in dense.groupby("event_type"):
        x = np.zeros(n, dtype=np.int64)
        x[g["t"].to_numpy(dtype=np.int64)] = g["v"].to_numpy(dtype=np.int64)
        nw = n - m + 1
        s1 = np.array([x[i : i + m].sum() for i in range(nw)], dtype=np.int64)
        s2 = np.array(
            [(x[i : i + m] ** 2).sum() for i in range(nw)], dtype=np.int64
        )
        var24 = m * s2 - s1 * s1
        for i in range(nw):
            best = None
            for j in range(nw):
                if abs(j - i) < excl or var24[i] <= 0 or var24[j] <= 0:
                    continue
                qt = int(np.dot(x[i : i + m], x[j : j + m]))
                corr = float(m * qt - s1[i] * s1[j]) / (
                    np.sqrt(float(var24[i])) * np.sqrt(float(var24[j]))
                )
                ce9 = _rha(corr * 1e9)
                key = (-ce9, j)
                if best is None or key < best:
                    best = key
            if best is not None:
                out[(et, i)] = (best[1], -best[0])
    return out


def test_matrix_profile_matches_numpy_bruteforce(spark):
    pdf = _collect(spark, "timeseries_matrix_profile")
    brute = _mp_brute(SF_SMOKE_DIR)
    got = {
        (r.event_type, int(r.win_start)): (int(r.nn_start), int(r.corr_e9))
        for r in pdf.itertuples()
    }
    assert got == brute


def test_matrix_profile_dist_derives_from_quantized_corr(spark):
    pdf = _collect(spark, "timeseries_matrix_profile")
    want = (
        np.sqrt(np.maximum(0.0, 48.0 * (1.0 - pdf["corr_e9"] / 1e9))) * 1e6
    ).round()
    assert (pdf["dist_e6"] == want.astype(np.int64)).all()
    # exclusion zone honored and corr is a valid correlation
    assert (abs(pdf["nn_start"] - pdf["win_start"]) >= 12).all()
    assert (pdf["corr_e9"].abs() <= 1_000_000_000).all()


# ---------------------------------------------------------------------------
# Skyline
# ---------------------------------------------------------------------------


def _sky_brute(sf_dir: str):
    agg = duckdb.sql(f"""
        SELECT l_suppkey,
               SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
                   AS BIGINT)) rev_c,
               COUNT(*) n_items,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) n_returns
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
    """).df()
    pts = agg[["l_suppkey", "rev_c", "n_items", "n_returns"]].to_numpy(
        dtype=np.int64
    )
    keep = []
    for s in pts:
        dominated = False
        for t in pts:
            if (
                t[1] >= s[1]
                and t[2] >= s[2]
                and t[3] <= s[3]
                and (t[1] > s[1] or t[2] > s[2] or t[3] < s[3])
            ):
                dominated = True
                break
        if not dominated:
            keep.append(int(s[0]))
    return set(keep)


def test_skyline_matches_bruteforce(spark):
    pdf = _collect(spark, "skyline_pareto_frontier")
    assert set(pdf["suppkey"].astype(int)) == _sky_brute(SF_SMOKE_DIR)


def test_skyline_is_mutually_nondominating(spark):
    pdf = _collect(spark, "skyline_pareto_frontier")
    pts = pdf[["rev_c", "n_items", "n_returns"]].to_numpy(dtype=np.int64)
    for i in range(len(pts)):
        for j in range(len(pts)):
            if i == j:
                continue
            s, t = pts[i], pts[j]
            assert not (
                t[0] >= s[0]
                and t[1] >= s[1]
                and t[2] <= s[2]
                and (t[0] > s[0] or t[1] > s[1] or t[2] < s[2])
            )
