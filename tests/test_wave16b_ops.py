"""Planted-fixture tests for wave 16b (driver round 15): closed-form
answers by hand plus cross-engine frame equality (the round-12 rule —
a replay that mirrors the engine formula is blind to shared errors, so
every statistic gets a fixture whose answer is known another way).
Degenerate-case fixtures get their OWN directories (rule 11: the dense
day grid spans the union of all metrics)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


def _collect(spark, name, sf_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, str(sf_dir)).toPandas()


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
        ma, mb = pd.isna(av), pd.isna(bv)
        assert (ma == mb).all(), (c, av, bv)
        assert (av[~ma] == bv[~mb]).all(), (c, av, bv)


def _events_daily(counts_by_type: dict, start="2024-01-01") -> pd.DataFrame:
    """One noon-stamped event row per unit of count: day i of metric m
    holds counts_by_type[m][i] events, so the dense daily COUNT(*) grid
    reproduces the planted series exactly."""
    rows = []
    eid = 0
    t0 = pd.Timestamp(start)
    for et, counts in counts_by_type.items():
        for i, c in enumerate(counts):
            for _ in range(int(c)):
                rows.append(
                    (
                        eid,
                        t0 + pd.Timedelta(days=i, hours=12),
                        eid % 7,
                        et,
                        10.0,
                        "{}",
                    )
                )
                eid += 1
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    return df


_DAY0 = 19723  # 2024-01-01 in days-since-epoch


# ---------------------------------------------------------------------------
# KPSS
# ---------------------------------------------------------------------------


def test_kpss_closed_form_small_series(spark, tmp_path):
    """y = [1,2,3]: S=6, P=[1,3,6]; terms n*P_t - t*S = -3,-3,0 so
    num = 18; den = n^2(n*sum y^2 - S^2) = 9*(42-36) = 54; eta = 1/3
    exactly -> eta_e9 = 333333333, below 0.463 -> no rejection."""
    _events_daily({"view": [1, 2, 3]}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_kpss", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_days"] == 3
    assert r["eta_e9"] == 333333333
    assert r["reject_stationarity"] == False  # noqa: E712
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(out, _duck_oracle("timeseries_kpss", tmp_path))


def test_kpss_rejects_on_linear_trend(spark, tmp_path):
    """y = 1..8 (pure trend, the canonical non-level-stationary case):
    num = 17472, den = 64*(8*204 - 1296) = 21504, eta = 0.8125 > 0.463
    -> reject. All integers derived by hand."""
    _events_daily({"view": list(range(1, 9))}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_kpss", tmp_path)
    r = out.iloc[0]
    assert r["eta_e9"] == 812500000
    assert r["reject_stationarity"] == True  # noqa: E712
    _frames_equal(out, _duck_oracle("timeseries_kpss", tmp_path))


def test_kpss_constant_series_degenerate(spark, tmp_path):
    """A constant series has zero variance: den = 0 must flag
    degenerate with NULL eta, never divide and never drop (own
    fixture dir per rule 11)."""
    _events_daily({"view": [5, 5, 5, 5]}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_kpss", tmp_path)
    r = out.iloc[0]
    assert r["degenerate"] == True  # noqa: E712
    assert pd.isna(r["eta_e9"]) and pd.isna(r["reject_stationarity"])
    _frames_equal(out, _duck_oracle("timeseries_kpss", tmp_path))


# ---------------------------------------------------------------------------
# EWMA chart
# ---------------------------------------------------------------------------


def _ewma_replay(counts, mu0_e9, sig_e9):
    """Independent integer replay of the quantized recurrence."""
    z = mu0_e9
    n_ooc, first_t = 0, -1
    for t, y in enumerate(counts, start=1):
        z = round(0.8 * z + 0.2 * y * 1e9)
        halfw = round(
            3.0 * sig_e9 * math.sqrt((1.0 / 9.0) * (1.0 - 0.64**t))
        )
        if abs(z - mu0_e9) > halfw:
            n_ooc += 1
            if first_t < 0:
                first_t = t
    return z, n_ooc, first_t


def test_ewma_sustained_run_one_late_spike(spark, tmp_path):
    """49 days at 10 then one day at 60: mu0 = 11 exactly, population
    sigma = sqrt(2500*(1/50)*(49/50)) = 7 exactly. The EWMA decays
    from 11 toward 10 (in-band: |z-mu0| < 1 << 7*3*sqrt(1/9)=7), and
    the day-50 spike lands z ~ 20 — the single OOC day. Expected
    final z / counts replayed independently in integer e9 space."""
    counts = [10] * 49 + [60]
    _events_daily({"view": counts}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "spc_ewma_chart", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_days"] == 50
    assert r["mu0_e9"] == 11_000_000_000
    assert r["sig_e9"] == 7_000_000_000
    z, n_ooc, first_t = _ewma_replay(counts, 11_000_000_000, 7_000_000_000)
    assert n_ooc == 1 and first_t == 50  # hand-derived: only day 50
    assert r["n_ooc"] == 1
    assert r["first_ooc_day"] == _DAY0 + 49
    assert r["ewma_final_e9"] == z
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(out, _duck_oracle("spc_ewma_chart", tmp_path))


def test_ewma_constant_series_degenerate_no_ooc(spark, tmp_path):
    """Constant series: sigma = 0 -> degenerate flag; z stays at mu0
    so |z - mu0| = 0 is never > 0 — zero OOC days, NULL first day
    (own fixture dir per rule 11)."""
    _events_daily({"view": [4, 4, 4, 4, 4]}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "spc_ewma_chart", tmp_path)
    r = out.iloc[0]
    assert r["sig_e9"] == 0
    assert r["degenerate"] == True  # noqa: E712
    assert r["n_ooc"] == 0
    assert pd.isna(r["first_ooc_day"])
    assert r["ewma_final_e9"] == 4_000_000_000
    _frames_equal(out, _duck_oracle("spc_ewma_chart", tmp_path))


# ---------------------------------------------------------------------------
# bottom-k Jaccard
# ---------------------------------------------------------------------------


def _docs(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["n_chars"] = df["n_chars"].astype(np.int64)
    return df


def test_bottomk_jaccard_exact_when_under_k(spark, tmp_path):
    """Vocabularies smaller than k = 16: the signature IS the set, the
    union bottom-k IS the union, so the estimate equals the exact
    Jaccard with zero error. A={a,b,c}, B={b,c,d}: J = 2/4 = 0.5;
    C={x}: J(A,C) = J(B,C) = 0."""
    _docs(
        [
            (1, "a b c", "en", "srcA", 5),
            (2, "b c d", "en", "srcB", 5),
            (3, "x", "en", "srcC", 1),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "sketch_bottomk_jaccard", tmp_path)
    got = {
        (r["src_a"], r["src_b"]): (
            r["k_used"],
            r["jaccard_est_e6"],
            r["jaccard_exact_e6"],
            r["abs_err_e6"],
        )
        for _, r in out.iterrows()
    }
    assert got == {
        ("srcA", "srcB"): (4, 500000, 500000, 0),
        ("srcA", "srcC"): (4, 0, 0, 0),
        ("srcB", "srcC"): (4, 0, 0, 0),
    }
    _frames_equal(
        out, _duck_oracle("sketch_bottomk_jaccard", tmp_path, ("documents",))
    )


def _bk_hash(term: str) -> int:
    return int(hashlib.md5(f"bk|{term}".encode()).hexdigest()[:8], 16)


def test_bottomk_jaccard_estimator_replay_over_k(spark, tmp_path):
    """40-term vocabularies overlapping in 20 terms (true J = 20/60):
    k = 16 < union, so the estimate comes from the bottom-16 of the
    union signature. Expected value replayed independently from the
    md5 hash definition; the exact column must equal 20/60 e6."""
    a_terms = [f"t{i}" for i in range(40)]
    b_terms = [f"t{i}" for i in range(20, 60)]
    _docs(
        [
            (1, " ".join(a_terms), "en", "srcA", 10),
            (2, " ".join(b_terms), "en", "srcB", 10),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "sketch_bottomk_jaccard", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    sig_a = set(sorted(( _bk_hash(t) for t in a_terms))[:16])
    sig_b = set(sorted(( _bk_hash(t) for t in b_terms))[:16])
    union_bk = sorted(sig_a | sig_b)[:16]
    k_inter = sum(1 for h in union_bk if h in sig_a and h in sig_b)
    assert r["k_used"] == 16
    assert r["jaccard_est_e6"] == round(k_inter * 1e6 / 16)
    assert r["jaccard_exact_e6"] == round(20 * 1e6 / 60)
    _frames_equal(
        out, _duck_oracle("sketch_bottomk_jaccard", tmp_path, ("documents",))
    )


# ---------------------------------------------------------------------------
# conductance
# ---------------------------------------------------------------------------


def _emb(rows) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    df["vec_id"] = df["vec_id"].astype(np.int64)
    df["label"] = df["label"].astype(np.int32)
    df["embedding"] = df["embedding"].map(
        lambda v: np.asarray(v, dtype=np.float32)
    )
    return df


def test_conductance_closed_form_partition(spark, tmp_path):
    """Three e0-aligned vectors (labels 0,0,1), two e1-aligned (label
    1), one isolated e2 (label 2). Mutual-top-16 edges: the e0
    triangle + the e1 pair (cross-cosines 0 < the 0.25 floor). Hand
    counts: m = 4, label 0 vol = 4 cut = 2 -> phi = 2/min(4,4) = 0.5;
    label 1 vol = 4 cut = 2 -> 0.5; label 2 vol = 0 -> degenerate."""
    e = lambda i: [1.0 if j == i else 0.0 for j in range(8)]  # noqa: E731
    _emb(
        [
            (0, e(0), 0),
            (1, e(0), 0),
            (2, e(0), 1),
            (3, e(1), 1),
            (4, e(1), 1),
            (5, e(2), 2),
        ]
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    out = _collect(spark, "graph_conductance_labels", tmp_path)
    got = {
        int(r["label"]): (
            r["vol"],
            r["cut"],
            r["conductance_e9"] if not pd.isna(r["conductance_e9"]) else None,
            r["degenerate"],
        )
        for _, r in out.iterrows()
    }
    assert got == {
        0: (4, 2, 500000000, False),
        1: (4, 2, 500000000, False),
        2: (0, 0, None, True),
    }
    _frames_equal(
        out,
        _duck_oracle("graph_conductance_labels", tmp_path, ("embeddings",)),
    )


def test_conductance_pure_partition_zero_phi(spark, tmp_path):
    """Two disconnected identical-vector pairs with label = component:
    no cross edges, cut = 0 everywhere -> phi = 0 for both labels."""
    e = lambda i: [1.0 if j == i else 0.0 for j in range(8)]  # noqa: E731
    _emb(
        [
            (0, e(0), 0),
            (1, e(0), 0),
            (2, e(1), 1),
            (3, e(1), 1),
        ]
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    out = _collect(spark, "graph_conductance_labels", tmp_path)
    assert (out["cut"] == 0).all()
    assert (out["conductance_e9"] == 0).all()
    assert (~out["degenerate"]).all()
    _frames_equal(
        out,
        _duck_oracle("graph_conductance_labels", tmp_path, ("embeddings",)),
    )


# ---------------------------------------------------------------------------
# Hoeffding drift
# ---------------------------------------------------------------------------


def _arm(user_id: int) -> str:
    nib = int(hashlib.md5(f"ab|{user_id}".encode()).hexdigest()[0], 16)
    return "A" if nib < 8 else "B"


def test_hoeffding_closed_form_counts(spark, tmp_path):
    """20 users, the A-arm users all convert (purchase value 200), the
    B-arm users never do: p_a = 1, p_b = 0, diff = 1. eps =
    sqrt((1/n_a + 1/n_b) * ln(40)/2) replayed from the pinned
    literal; with ~10 users per arm eps ~ 0.6 < 1 -> significant."""
    rows = []
    for uid in range(20):
        v = 200.0 if _arm(uid) == "A" else 20.0
        rows.append((uid, pd.Timestamp("2024-01-01"), uid, "purchase", v, "{}"))
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df.to_parquet(tmp_path / "events.parquet", index=False)

    n_a = sum(1 for u in range(20) if _arm(u) == "A")
    n_b = 20 - n_a
    assert n_a > 0 and n_b > 0  # fixture sanity
    out = _collect(spark, "stats_hoeffding_drift", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_a"], r["conv_a"]) == (n_a, n_a)
    assert (r["n_b"], r["conv_b"]) == (n_b, 0)
    assert (r["rate_a_e6"], r["rate_b_e6"], r["diff_e6"]) == (
        1000000,
        0,
        1000000,
    )
    eps = math.sqrt((1.0 / n_a + 1.0 / n_b) * 3.6888794541139363 / 2.0)
    assert r["eps_e6"] == round(eps * 1e6)
    assert bool(r["drift_significant"]) == (1.0 > eps)
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(out, _duck_oracle("stats_hoeffding_drift", tmp_path))


def test_hoeffding_empty_arm_degenerate(spark, tmp_path):
    """A single user (one arm empty): the row must still emit — NULL
    rates/bound, degenerate flag true, exact counts for the present
    arm (the conditional-aggregation never-drop contract)."""
    uid = next(u for u in range(50) if _arm(u) == "A")
    df = pd.DataFrame(
        [(0, pd.Timestamp("2024-01-01"), uid, "purchase", 200.0, "{}")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_hoeffding_drift", tmp_path)
    r = out.iloc[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (1, 1, 0, 0)
    assert pd.isna(r["rate_b_e6"]) and pd.isna(r["eps_e6"])
    assert pd.isna(r["drift_significant"])
    assert r["degenerate"] == True  # noqa: E712
    _frames_equal(out, _duck_oracle("stats_hoeffding_drift", tmp_path))


# ---------------------------------------------------------------------------
# Dirichlet-smoothed retrieval
# ---------------------------------------------------------------------------


def test_dirichlet_lm_closed_form_three_docs(spark, tmp_path):
    """Corpus: doc1 'a b' (the query), doc2 'a a c', doc3 'd d d d'.
    T = 9, cf_a = 3, cf_b = 1, nq = 2. Scores replayed independently
    from the decomposition with e9 per-term quantization; doc3 (no
    matched terms, longest) must still be scored and rank LAST —
    the every-document-scored contract."""
    _docs(
        [
            (1, "a b", "en", "s", 3),
            (2, "a a c", "en", "s", 5),
            (3, "d d d d", "en", "s", 7),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "retrieval_dirichlet_lm", tmp_path)

    mu, big_t = 2000.0, 9
    p_a, p_b = 3 / big_t, 1 / big_t
    k_e9 = round(math.log(mu * p_a) * 1e9) + round(math.log(mu * p_b) * 1e9)

    def _score(dl, matched):  # matched: list of (tf, p_c)
        msum = sum(
            round((math.log(tf + mu * pc) - math.log(mu * pc)) * 1e9)
            for tf, pc in matched
        )
        return k_e9 + msum - round(2 * math.log(dl + mu) * 1e9)

    want = {
        1: _score(2, [(1, p_a), (1, p_b)]),
        2: _score(3, [(2, p_a)]),
        3: _score(4, []),
    }
    got = dict(zip(out["doc_id"], out["qll_e9"]))
    assert got == want
    # doc1 holds both query terms -> top rank; doc3 unmatched -> last
    assert list(out["doc_id"]) == sorted(
        want, key=lambda d: (-want[d], d)
    )
    assert list(out["doc_id"])[0] == 1 and list(out["doc_id"])[-1] == 3
    _frames_equal(
        out, _duck_oracle("retrieval_dirichlet_lm", tmp_path, ("documents",))
    )


def test_dirichlet_lm_topk_cut_and_ties(spark, tmp_path):
    """12 identical unmatched docs + 1 matched: the top-10 cut keeps
    the matched doc first and breaks the identical-score tail by
    doc_id ascending — the deterministic-ranking contract."""
    rows = [(1, "q q", "en", "s", 3)]
    for i in range(2, 14):
        rows.append((i, "z z z", "en", "s", 5))
    _docs(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "retrieval_dirichlet_lm", tmp_path)
    assert len(out) == 10
    assert out.iloc[0]["doc_id"] == 1
    assert list(out["doc_id"][1:]) == list(range(2, 11))
    _frames_equal(
        out, _duck_oracle("retrieval_dirichlet_lm", tmp_path, ("documents",))
    )
