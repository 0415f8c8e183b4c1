"""Planted-fixture tests for wave 16c (driver round 15): closed-form
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
# source concentration
# ---------------------------------------------------------------------------


def test_hhi_closed_form_two_sources(spark, tmp_path):
    """Token masses 30 and 10: T = 40, HHI = (900+100)/1600 = 0.625,
    normalized = (0.625-0.5)/0.5 = 0.25, effective = 1.6, top share
    = 0.75 — every figure exact by hand."""
    _docs(
        [
            (1, " ".join(["a"] * 30), "en", "big", 10),
            (2, " ".join(["b"] * 10), "en", "small", 10),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "corpus_source_concentration", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_sources"], r["total_tokens"]) == (2, 40)
    assert r["hhi_e9"] == 625000000
    assert r["hhi_norm_e9"] == 250000000
    assert r["effective_sources_e9"] == 1600000000
    assert r["top_share_e9"] == 750000000
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(
        out,
        _duck_oracle("corpus_source_concentration", tmp_path, ("documents",)),
    )


def test_hhi_single_source_degenerate(spark, tmp_path):
    """One source: HHI = 1 and effective = 1 are still well-defined,
    but the normalized index divides by 1 - 1/k = 0 -> NULL +
    degenerate flag (never a divide error)."""
    _docs([(1, "a a a", "en", "only", 5)]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "corpus_source_concentration", tmp_path)
    r = out.iloc[0]
    assert r["hhi_e9"] == 1000000000
    assert r["effective_sources_e9"] == 1000000000
    assert pd.isna(r["hhi_norm_e9"])
    assert r["degenerate"] == True  # noqa: E712
    _frames_equal(
        out,
        _duck_oracle("corpus_source_concentration", tmp_path, ("documents",)),
    )


# ---------------------------------------------------------------------------
# Atkinson index
# ---------------------------------------------------------------------------


def _tpch_cust_orders(spends_cents, tmp_path):
    """customer k spends spends_cents[k] via one order each (0 = no
    order at all, exercising the LEFT JOIN zero-spend path)."""
    cust = pd.DataFrame(
        {"c_custkey": np.arange(1, len(spends_cents) + 1, dtype="int64")}
    )
    orders = pd.DataFrame(
        [
            (i + 1, k + 1, c / 100.0)
            for i, (k, c) in enumerate(
                (k, c) for k, c in enumerate(spends_cents) if c > 0
            )
        ],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    orders["o_orderkey"] = orders["o_orderkey"].astype(np.int64)
    orders["o_custkey"] = orders["o_custkey"].astype(np.int64)
    cust.to_parquet(tmp_path / "customer.parquet", index=False)
    orders.to_parquet(tmp_path / "orders.parquet", index=False)


def test_atkinson_replay_two_customers(spark, tmp_path):
    """Spends 100 and 400 cents: mean 250, geomean 200, A = 0.2.
    Expected value replayed through the e9 log quantization so the
    assertion is engine-independent to the last digit."""
    _tpch_cust_orders([100, 400], tmp_path)
    out = _collect(spark, "stats_atkinson_spend", tmp_path)
    r = out.iloc[0]
    assert (r["n_customers"], r["n_zero_spend"], r["total_spend_c2"]) == (
        2,
        0,
        500,
    )
    slnx = round(math.log(100) * 1e9) + round(math.log(400) * 1e9)
    atk = 1.0 - math.exp(slnx / 2 / 1e9) / 250.0
    assert r["atkinson_e9"] == round(atk * 1e9)
    assert abs(r["atkinson_e9"] - 200000000) <= 1  # the hand value
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(
        out,
        _duck_oracle("stats_atkinson_spend", tmp_path, ("customer", "orders")),
    )


def test_atkinson_zero_spend_is_exactly_one(spark, tmp_path):
    """Any zero-spend customer collapses the geometric mean to 0 and
    A to EXACTLY 1 — the defined limit, emitted as the integer with
    no float wobble."""
    _tpch_cust_orders([0, 300, 500], tmp_path)
    out = _collect(spark, "stats_atkinson_spend", tmp_path)
    r = out.iloc[0]
    assert (r["n_customers"], r["n_zero_spend"]) == (3, 1)
    assert r["atkinson_e9"] == 1000000000
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(
        out,
        _duck_oracle("stats_atkinson_spend", tmp_path, ("customer", "orders")),
    )


def test_atkinson_all_zero_degenerate(spark, tmp_path):
    _tpch_cust_orders([0, 0], tmp_path)
    out = _collect(spark, "stats_atkinson_spend", tmp_path)
    r = out.iloc[0]
    assert pd.isna(r["atkinson_e9"])
    assert r["degenerate"] == True  # noqa: E712
    _frames_equal(
        out,
        _duck_oracle("stats_atkinson_spend", tmp_path, ("customer", "orders")),
    )


# ---------------------------------------------------------------------------
# Mood's median test
# ---------------------------------------------------------------------------


def _arm(user_id: int) -> str:
    nib = int(hashlib.md5(f"ab|{user_id}".encode()).hexdigest()[0], 16)
    return "A" if nib < 8 else "B"


def _events(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    return df


def test_mood_median_perfect_separation_chi2_equals_n(spark, tmp_path):
    """A-arm events all at value 10, B-arm all at 20 (one event per
    user): the pooled lower median is 10, so the 2x2 is
    [[0, nA], [nB, 0]] and chi2 = N(0 - nA*nB)^2/(nA*nB*nB*nA) = N
    EXACTLY — a closed form independent of the arm split."""
    rows = []
    for uid in range(12):
        v = 10.0 if _arm(uid) == "A" else 20.0
        rows.append((uid, pd.Timestamp("2024-01-01"), uid, "view", v, "{}"))
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    n_a = sum(1 for u in range(12) if _arm(u) == "A")
    n_b = 12 - n_a
    assert n_a > 0 and n_b > 0  # fixture sanity
    out = _collect(spark, "stats_mood_median", tmp_path)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["median_e3"] == 10000
    assert (r["a_gt"], r["a_le"], r["b_gt"], r["b_le"]) == (
        0,
        n_a,
        n_b,
        0,
    )
    assert r["chi2_e9"] == 12 * 1000000000
    assert r["reject_same_median"] == True  # noqa: E712
    assert r["degenerate"] == False  # noqa: E712
    _frames_equal(
        out, _duck_oracle("stats_mood_median", tmp_path, ("events",))
    )


def test_mood_median_all_equal_degenerate(spark, tmp_path):
    """Every value identical: the > column margin is zero, the
    chi-square denominator NULLs out, and the row flags degenerate
    instead of dividing or dropping."""
    rows = [
        (i, pd.Timestamp("2024-01-01"), i, "view", 7.0, "{}")
        for i in range(8)
    ]
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_mood_median", tmp_path)
    r = out.iloc[0]
    assert r["median_e3"] == 7000
    assert r["a_gt"] == 0 and r["b_gt"] == 0
    assert pd.isna(r["chi2_e9"]) and pd.isna(r["reject_same_median"])
    assert r["degenerate"] == True  # noqa: E712
    _frames_equal(
        out, _duck_oracle("stats_mood_median", tmp_path, ("events",))
    )
