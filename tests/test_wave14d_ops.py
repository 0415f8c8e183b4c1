"""Planted-fixture tests for wave 14d (closed-form answers by hand +
cross-engine frame equality)."""

from __future__ import annotations

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
# Modularity
# ---------------------------------------------------------------------------


def test_modularity_two_cliques_half(spark, tmp_path):
    """Two orthogonal K3 cliques with matching labels: m = 6, each
    community has e_c = 3, d_c = 6 -> Q = 2*(3/6 - (6/12)^2) = 0.5
    exactly. Scrambled labels on the same graph score strictly
    lower."""
    rng = np.random.default_rng(3)

    def emb(labels):
        vecs = []
        for i in range(6):
            v = np.zeros(8)
            v[0 if i < 3 else 1] = 1.0
            v = v + 0.01 * rng.normal(size=8)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        return pd.DataFrame(
            {
                "vec_id": np.arange(6, dtype=np.int64),
                "embedding": vecs,
                "label": np.asarray(labels, dtype=np.int32),
            }
        )

    emb([0, 0, 0, 1, 1, 1]).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "graph_modularity", str(tmp_path))
    r = out.iloc[0]
    assert int(r["n_communities"]) == 2
    assert int(r["total_edges"]) == 6
    assert int(r["within_edges"]) == 6
    assert int(r["modularity_e9"]) == 500_000_000
    _frames_equal(
        out, _duck_oracle("graph_modularity", tmp_path, ["embeddings"])
    )
    # scrambled labels: one node of each clique swapped
    d2 = tmp_path / "scr"
    d2.mkdir()
    emb([0, 0, 1, 1, 1, 0]).to_parquet(d2 / "embeddings.parquet",
                                       index=False)
    out2 = _collect(spark, "graph_modularity", str(d2))
    assert int(out2.iloc[0]["modularity_e9"]) < 500_000_000
    _frames_equal(
        out2, _duck_oracle("graph_modularity", d2, ["embeddings"])
    )


# ---------------------------------------------------------------------------
# Lin's CCC
# ---------------------------------------------------------------------------


def test_lin_ccc_offset_closed_form(spark, tmp_path):
    """x alternates 1,3 over 10 days; y = x (CCC = 1 exactly);
    z = x + 2 (CCC = 2*10/(2*10 + 10*4) = 1/3 exactly — perfect
    correlation, charged for the location gap)."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for d in range(10):
        x = 1 if d % 2 == 0 else 3
        for m, cnt in (("x", x), ("y", x), ("z", x + 2)):
            for _ in range(cnt):
                rows.append((eid, t0 + pd.Timedelta(days=d, hours=1),
                             eid % 5, m, 1.0, "{}"))
                eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_lin_ccc", str(tmp_path))
    assert len(out) == 3
    xy = out[(out["ma"] == "x") & (out["mb"] == "y")].iloc[0]
    assert int(xy["ccc_e9"]) == 1_000_000_000
    xz = out[(out["ma"] == "x") & (out["mb"] == "z")].iloc[0]
    assert int(xz["ccc_e9"]) == round(1 / 3 * 1e9)
    assert not out["degenerate"].any()
    _frames_equal(out, _duck_oracle("stats_lin_ccc", tmp_path))


def test_lin_ccc_constant_pair_degenerate(spark, tmp_path):
    """Two identical CONSTANT series: all three variance terms are
    zero -> degenerate flag, not NaN."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for d in range(6):
        for m in ("a", "b"):
            for _ in range(4):
                rows.append((eid, t0 + pd.Timedelta(days=d, hours=2),
                             eid % 3, m, 1.0, "{}"))
                eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_lin_ccc", str(tmp_path))
    assert bool(out.iloc[0]["degenerate"])
    assert int(out.iloc[0]["ccc_e9"]) == 0
    _frames_equal(out, _duck_oracle("stats_lin_ccc", tmp_path))


# ---------------------------------------------------------------------------
# Variance ratio
# ---------------------------------------------------------------------------


def test_variance_ratio_alternating_is_zero(spark, tmp_path):
    """An hourly series alternating 2, 6 has positive 1-hour variance
    but EVERY overlapping 24-hour window sums to 96 — VR is exactly 0
    and at n = 240 the z-statistic (-1/sqrt(phi) = -2.83) clears the
    1.96 gate, so the mean-reverting flag fires. A constant series
    flags degenerate."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for h in range(240):
        for _ in range(2 if h % 2 == 0 else 6):
            rows.append((eid, t0 + pd.Timedelta(hours=h, minutes=1),
                         eid % 5, "alt", 1.0, "{}"))
            eid += 1
        for _ in range(3):
            rows.append((eid, t0 + pd.Timedelta(hours=h, minutes=2),
                         eid % 5, "flat", 1.0, "{}"))
            eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_variance_ratio", str(tmp_path))
    alt = out[out["event_type"] == "alt"].iloc[0]
    assert int(alt["vr_e9"]) == 0
    assert bool(alt["mean_reverting"]) is True
    assert bool(alt["persistent"]) is False
    assert not bool(alt["degenerate"])
    flat = out[out["event_type"] == "flat"].iloc[0]
    assert bool(flat["degenerate"]) is True
    _frames_equal(out, _duck_oracle("timeseries_variance_ratio", tmp_path))


# ---------------------------------------------------------------------------
# Burrows' Delta
# ---------------------------------------------------------------------------


def test_burrows_delta_identical_sources_zero(spark, tmp_path):
    """Sources A and B share one text verbatim -> Delta(A,B) = 0 with
    every term zero-variance... except variance is measured across
    ALL sources, so with a third differing source C the A-B z-scores
    are equal term-for-term and Delta(A,B) = 0 while Delta(A,C) =
    Delta(B,C) > 0."""
    txt = "the quick brown fox jumps over the lazy dog the end"
    other = "completely different words entirely novel tokens here"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [txt, txt, other],
            "lang": "en",
            "source": ["A", "B", "C"],
            "n_chars": np.asarray(
                [len(txt), len(txt), len(other)], dtype=np.int64
            ),
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "text_burrows_delta", str(tmp_path))
    assert len(out) == 3
    ab = out[(out["sa"] == "A") & (out["sb"] == "B")].iloc[0]
    ac = out[(out["sa"] == "A") & (out["sb"] == "C")].iloc[0]
    bc = out[(out["sa"] == "B") & (out["sb"] == "C")].iloc[0]
    assert int(ab["delta_e3"]) == 0
    assert int(ac["delta_e3"]) == int(bc["delta_e3"]) > 0
    _frames_equal(
        out, _duck_oracle("text_burrows_delta", tmp_path, ["documents"])
    )


# ---------------------------------------------------------------------------
# Wave 14e: embedding geometry
# ---------------------------------------------------------------------------


def _emb_df(vecs, labels=None):
    n = len(vecs)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.asarray(
                labels if labels is not None else [0] * n, dtype=np.int32
            ),
        }
    )


def test_intrinsic_dim_circle_reads_one(spark, tmp_path):
    """200 points at UNIFORMLY RANDOM angles on a great circle (a 1-D
    manifold inside the 8-dim ambient space): TwoNN must read an
    intrinsic dimension near 1, nowhere near the ambient 8. (The
    sampling must be random — TwoNN's Pareto likelihood assumes
    Poisson sampling; a regular lattice has mu ~ 1 everywhere and the
    estimator rightly blows up, which an earlier draft of this test
    demonstrated by accident.)"""
    import math as m

    rng = np.random.default_rng(21)
    vecs = []
    for th in rng.uniform(0, 2 * m.pi, 200):
        v = np.zeros(8)
        v[0], v[1] = m.cos(th), m.sin(th)
        vecs.append(v)
    _emb_df(vecs).to_parquet(tmp_path / "embeddings.parquet", index=False)
    out = _collect(spark, "embedding_intrinsic_dim", str(tmp_path))
    r = out.iloc[0]
    assert int(r["n_sample"]) == 200
    assert not bool(r["degenerate"])
    idim = int(r["intrinsic_dim_e6"]) / 1e6
    assert 0.5 < idim < 2.0, idim
    _frames_equal(
        out,
        _duck_oracle("embedding_intrinsic_dim", tmp_path, ["embeddings"]),
    )


def test_intrinsic_dim_all_duplicates_degenerate(spark, tmp_path):
    """Every vector identical: every sampled point's nearest neighbor
    is an exact duplicate (d1 = 0) -> all excluded, degenerate flag,
    never a division by zero."""
    v = np.zeros(8)
    v[0] = 1.0
    _emb_df([v] * 10).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "embedding_intrinsic_dim", str(tmp_path))
    r = out.iloc[0]
    assert bool(r["degenerate"])
    assert int(r["n_dup"]) == int(r["n_sample"])
    assert int(r["intrinsic_dim_e6"]) == 0
    _frames_equal(
        out,
        _duck_oracle("embedding_intrinsic_dim", tmp_path, ["embeddings"]),
    )


def test_knn_outliers_isolates_flagged(spark, tmp_path):
    """A tight 4-clique scores near zero; three mutually orthogonal
    isolates have no neighbor above the 0.25 floor and are maximal
    outliers by construction."""
    rng = np.random.default_rng(11)
    vecs = []
    for i in range(4):
        v = np.zeros(8)
        v[0] = 1.0
        v = v + 0.01 * rng.normal(size=8)
        vecs.append(v / np.linalg.norm(v))
    for i in range(3):
        v = np.zeros(8)
        v[i + 2] = 1.0
        vecs.append(v)
    _emb_df(vecs).to_parquet(tmp_path / "embeddings.parquet", index=False)
    out = _collect(spark, "embedding_knn_outliers", str(tmp_path))
    assert len(out) == 7
    clique = out[out["vec_id"] < 4]
    assert (clique["outlier_score_e6"] < 10_000).all()
    assert (clique["n_neighbors"] == 3).all()
    iso = out[out["vec_id"] >= 4]
    assert (iso["outlier_score_e6"] == 1_000_000).all()
    assert iso["no_neighbors"].all()
    _frames_equal(
        out,
        _duck_oracle("embedding_knn_outliers", tmp_path, ["embeddings"]),
    )


# ---------------------------------------------------------------------------
# Wave 14f: t-closeness
# ---------------------------------------------------------------------------


def test_t_closeness_skewed_classes_exact(spark, tmp_path):
    """Two QI classes (two days, one value band), each with the SAME
    sensitive-value SET but opposite skew (90/10 vs 10/90 over a 50/50
    corpus): the l-diversity distinct count alone cannot see the leak,
    but t = 0.5(|0.9-0.5| + |0.1-0.5|) = 0.4 exactly for both classes,
    above the pinned 0.2 — all rows at risk."""
    t0 = pd.Timestamp("2024-01-01")  # Monday; next day -> second dow
    rows = []
    eid = 0
    for day, err, view in ((0, 9, 1), (1, 1, 9)):
        for et, cnt in (("error", err), ("view", view)):
            for _ in range(cnt):
                rows.append((eid, t0 + pd.Timedelta(days=day, hours=3,
                                                    seconds=eid),
                             eid % 4, et, 5.0, "{}"))
                eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "dq_t_closeness", str(tmp_path))
    r = out.iloc[0]
    assert int(r["n_classes"]) == 2
    assert int(r["max_t_e9"]) == 400_000_000
    assert int(r["avg_t_e9"]) == 400_000_000
    assert int(r["n_classes_above_t"]) == 2
    assert int(r["n_rows_at_risk"]) == 20
    _frames_equal(out, _duck_oracle("dq_t_closeness", tmp_path))


def test_t_closeness_uniform_corpus_zero(spark, tmp_path):
    """Every class mirrors the global distribution exactly -> t = 0
    everywhere, nothing at risk."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for day in (0, 1):
        for et in ("error", "view"):
            for _ in range(5):
                rows.append((eid, t0 + pd.Timedelta(days=day, hours=3,
                                                    seconds=eid),
                             eid % 4, et, 5.0, "{}"))
                eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "dq_t_closeness", str(tmp_path))
    r = out.iloc[0]
    assert int(r["max_t_e9"]) == 0
    assert int(r["n_classes_above_t"]) == 0
    assert int(r["n_rows_at_risk"]) == 0
    _frames_equal(out, _duck_oracle("dq_t_closeness", tmp_path))
