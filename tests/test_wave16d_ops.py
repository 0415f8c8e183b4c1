"""Planted-fixture tests for wave 16d (driver round 15): closed-form
answers by hand plus cross-engine frame equality."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


def _collect(spark, name, sf_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, str(sf_dir)).toPandas()


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
        ma, mb = pd.isna(av), pd.isna(bv)
        assert (ma == mb).all(), (c, av, bv)
        assert (av[~ma] == bv[~mb]).all(), (c, av, bv)


def _docs(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["n_chars"] = df["n_chars"].astype(np.int64)
    return df


# ---------------------------------------------------------------------------
# OOV rate
# ---------------------------------------------------------------------------


def test_oov_rate_closed_form(spark, tmp_path):
    """Train vocab {a,b,c}; eval doc 'a b x x y': 5 tokens / 4 types,
    OOV tokens {x,x,y} = 3 (rate 0.6), OOV types {x,y} = 2 (rate
    0.5). A second, fully-covered eval doc reads zero."""
    _docs(
        [
            (1, "a b c", "en", "src1", 5),
            (10, "a b x x y", "en", "src0", 9),
            (11, "c a", "en", "src0", 3),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "text_oov_rate", tmp_path)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_types"],
            r["oov_tokens"],
            r["oov_types"],
            r["oov_token_rate_e6"],
            r["oov_type_rate_e6"],
        )
        for _, r in out.iterrows()
    }
    assert got == {
        10: (5, 4, 3, 2, 600000, 500000),
        11: (2, 2, 0, 0, 0, 0),
    }
    _frames_equal(out, _duck_oracle("text_oov_rate", tmp_path, ("documents",)))


def test_oov_rate_empty_train_vocab_all_oov(spark, tmp_path):
    """No training sources at all: every eval token is OOV (rate 1)."""
    _docs([(1, "p q", "en", "src0", 3)]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "text_oov_rate", tmp_path)
    r = out.iloc[0]
    assert (r["oov_tokens"], r["oov_token_rate_e6"]) == (2, 1000000)
    _frames_equal(out, _duck_oracle("text_oov_rate", tmp_path, ("documents",)))


# ---------------------------------------------------------------------------
# AMS F2
# ---------------------------------------------------------------------------


def _ams_sign(j: int, term: str) -> int:
    h = int(hashlib.md5(f"ams{j}|{term}".encode()).hexdigest()[:8], 16)
    return 1 - 2 * (h % 2)


def test_ams_f2_exact_side_and_replay(spark, tmp_path):
    """Text 'a a a b b c': f = (3,2,1) so exact F2 = 14. The median
    estimate is replayed independently from the md5 sign definition."""
    _docs([(1, "a a a b b c", "en", "s", 11)]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "sketch_ams_f2", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["k_estimators"] == 16
    assert r["n_terms"] == 3
    assert r["f2_exact"] == 14.0
    tf = {"a": 3, "b": 2, "c": 1}
    ests = sorted(
        sum(f * _ams_sign(j, t) for t, f in tf.items()) ** 2
        for j in range(1, 17)
    )
    med = float(ests[7])  # lower median: 8th of 16 ascending
    assert r["f2_est_median"] == med
    assert r["rel_err_e6"] == round(abs(med - 14.0) * 1e6 / 14.0)
    _frames_equal(out, _duck_oracle("sketch_ams_f2", tmp_path, ("documents",)))


def test_ams_f2_single_term_is_exact(spark, tmp_path):
    """One term: every Z_j = ±f so every estimate equals f^2 exactly
    — zero error by construction (s^2 = 1)."""
    _docs([(1, "w w w w", "en", "s", 7)]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "sketch_ams_f2", tmp_path)
    r = out.iloc[0]
    assert r["f2_exact"] == 16.0
    assert r["f2_est_median"] == 16.0
    assert r["rel_err_e6"] == 0
    _frames_equal(out, _duck_oracle("sketch_ams_f2", tmp_path, ("documents",)))


# ---------------------------------------------------------------------------
# Chao1
# ---------------------------------------------------------------------------


def test_chao1_closed_form(spark, tmp_path):
    """tf = a:1 b:1 c:2 d:3 -> S = 4, f1 = 2, f2 = 1: bias-corrected
    Chao1 = 4 + 2*1/(2*2) = 4.5 exactly; variance and lognormal CI
    replayed from the standard formulas."""
    _docs([(1, "a b c c d d d", "en", "s", 13)]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "text_chao1_richness", tmp_path)
    r = out.iloc[0]
    assert (r["s_obs"], r["f1"], r["f2"]) == (4, 2, 1)
    assert r["chao1_e6"] == 4500000
    f1, f2 = 2.0, 1.0
    t0 = f1 * (f1 - 1) / (2 * (f2 + 1))
    v = (
        t0
        + f1 * (2 * f1 - 1) ** 2 / (4 * (f2 + 1) ** 2)
        + f1**2 * f2 * (f1 - 1) ** 2 / (4 * (f2 + 1) ** 4)
    )
    kk = math.exp(1.96 * math.sqrt(math.log(1 + v / t0**2)))
    assert r["ci_lo_e6"] == round((4 + t0 / kk) * 1e6)
    assert r["ci_hi_e6"] == round((4 + t0 * kk) * 1e6)
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(
        out, _duck_oracle("text_chao1_richness", tmp_path, ("documents",))
    )


def test_chao1_no_singletons_point_ci(spark, tmp_path):
    """No singleton types: the unseen estimate is 0, the CI collapses
    to [S, S], and the row flags degenerate instead of dividing."""
    _docs([(1, "a a b b b", "en", "s", 9)]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "text_chao1_richness", tmp_path)
    r = out.iloc[0]
    assert (r["s_obs"], r["f1"]) == (2, 0)
    assert r["chao1_e6"] == 2000000
    assert r["ci_lo_e6"] == 2000000 and r["ci_hi_e6"] == 2000000
    assert r["degenerate"] == True  # noqa: E712
    _frames_equal(
        out, _duck_oracle("text_chao1_richness", tmp_path, ("documents",))
    )


# ---------------------------------------------------------------------------
# EB shrinkage
# ---------------------------------------------------------------------------


def _events_purchases(user_counts, tmp_path):
    """user_counts: list of (user_id, n, k) — n purchase events of
    which k are high-value (200.0), the rest 20.0."""
    rows, eid = [], 0
    for uid, n, k in user_counts:
        for i in range(n):
            v = 200.0 if i < k else 20.0
            rows.append(
                (eid, pd.Timestamp("2024-01-01"), uid, "purchase", v, "{}")
            )
            eid += 1
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df.to_parquet(tmp_path / "events.parquet", index=False)


def test_eb_shrinkage_replay_moment_fit(spark, tmp_path):
    """Users (n,k): (10,9), (10,1), (4,2), (4,2): raw rates .9/.1/.5/.5
    give m = .5 and v = 0.32/3; the fit and every shrunken rate are
    replayed independently through the e9 quantization. The extreme
    users must shrink TOWARD the pool (.9 down, .1 up)."""
    users = [(1, 10, 9), (2, 10, 1), (3, 4, 2), (4, 4, 2)]
    _events_purchases(users, tmp_path)
    out = _collect(spark, "stats_eb_shrinkage", tmp_path)
    assert len(out) == 4

    p_e9 = {u: round(k / n * 1e9) for u, n, k in users}
    sp = sum(p_e9.values())
    sp2 = sum(p * p for p in p_e9.values())
    u_fit = 4
    m = sp / u_fit / 1e9
    v = (sp2 - sp * sp / u_fit) / (u_fit - 1) / 1e18
    strength = m * (1 - m) / v - 1
    alpha, beta = m * strength, (1 - m) * strength
    want = {
        u: round((k + alpha) / (n + alpha + beta) * 1e9)
        for u, n, k in users
    }
    got = dict(zip(out["user_id"], out["p_shrunk_e9"]))
    assert got == want
    assert (out["alpha_e6"] == round(alpha * 1e6)).all()
    assert (out["beta_e6"] == round(beta * 1e6)).all()
    assert (~out["degenerate_fit"]).all()
    # direction: extremes pull toward the pool
    assert want[1] < p_e9[1] and want[2] > p_e9[2]
    _frames_equal(out, _duck_oracle("stats_eb_shrinkage", tmp_path, ("events",)))


def test_eb_shrinkage_zero_variance_falls_back_raw(spark, tmp_path):
    """All fit-eligible users at the same rate: v = 0 is a degenerate
    fit — every user keeps the RAW rate with the flag set, nothing
    drops (including the single-event user excluded from the fit)."""
    _events_purchases([(1, 4, 2), (2, 4, 2), (3, 1, 1)], tmp_path)
    out = _collect(spark, "stats_eb_shrinkage", tmp_path)
    assert len(out) == 3
    got = {r["user_id"]: r for _, r in out.iterrows()}
    assert got[1]["p_shrunk_e9"] == got[1]["p_e9"] == 500000000
    assert got[3]["p_shrunk_e9"] == got[3]["p_e9"] == 1000000000
    assert out["degenerate_fit"].all()
    assert pd.isna(got[1]["alpha_e6"])
    _frames_equal(out, _duck_oracle("stats_eb_shrinkage", tmp_path, ("events",)))
