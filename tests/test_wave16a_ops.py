"""Planted-fixture tests for wave 16a (driver round 15): closed-form
answers by hand plus cross-engine frame equality (the round-12 rule —
a replay that mirrors the engine formula is blind to shared errors, so
every statistic gets a fixture whose answer is known another way)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


def _collect(spark, name, sf_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, str(sf_dir)).toPandas()


def _duck_oracle(name, sf_dir, tables=("documents",)):
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
# merged Misra-Gries sketch
# ---------------------------------------------------------------------------


def test_spacesaving_closed_form_two_sources(spark, tmp_path):
    """Source A: a*20 b*9 c..h*2 i,j*1 (10 distinct > m=8): the 9th-
    largest count is 1, so delta_A = 1, kept = {a:19, b:8, c..h:1}.
    Source B: a*5 k*3 l,m*1 (4 distinct <= m): delta_B = 0, exact.
    te = 1. Merged estimates and the est<=true<=est+te bound are all
    hand-checkable."""
    text_a = " ".join(
        ["a"] * 20 + ["b"] * 9
        + [t for t in "cdefgh" for _ in range(2)]
        + ["i", "j"]
    )
    text_b = " ".join(["a"] * 5 + ["k"] * 3 + ["l", "m"])
    _docs(
        [
            (1, text_a, "en", "srcA", len(text_a)),
            (2, text_b, "en", "srcB", len(text_b)),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    out = _collect(spark, "sketch_spacesaving_topk", tmp_path)
    got = {
        r["token"]: (r["est_cnt"], r["max_cnt"], r["true_cnt"], r["within_bounds"])
        for _, r in out.iterrows()
    }
    want = {
        "a": (24, 25, 25, True),
        "b": (8, 9, 9, True),
        "k": (3, 4, 3, True),
        "l": (1, 2, 1, True),
        "m": (1, 2, 1, True),
    }
    for t in "cdefgh":
        want[t] = (1, 2, 2, True)
    # i and j decremented to zero in A and absent from B: not emitted
    assert got == want
    assert "i" not in got and "j" not in got
    _frames_equal(out, _duck_oracle("sketch_spacesaving_topk", tmp_path))


def test_spacesaving_exact_when_under_capacity(spark, tmp_path):
    """Every source holds <= m distinct terms: all deltas are 0, so the
    sketch IS the exact counter set (est == true, max == est)."""
    _docs(
        [
            (1, "x x x y y z", "en", "s1", 11),
            (2, "x y y y w", "en", "s2", 9),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "sketch_spacesaving_topk", tmp_path)
    assert (out["est_cnt"] == out["true_cnt"]).all()
    assert (out["max_cnt"] == out["est_cnt"]).all()
    assert out["within_bounds"].all()
    got = dict(zip(out["token"], out["true_cnt"]))
    assert got == {"x": 4, "y": 5, "z": 1, "w": 1}
    _frames_equal(out, _duck_oracle("sketch_spacesaving_topk", tmp_path))


def test_spacesaving_bounds_hold_on_corpus(spark):
    """sf0.001 corpus: every emitted estimate respects the MG bound
    (the audit column is the claim; this asserts it fleet-wide)."""
    out = _collect(spark, "sketch_spacesaving_topk", "/root/testdata/sf0.001")
    assert len(out) == 20
    assert out["within_bounds"].all()
    assert (out["est_cnt"] <= out["true_cnt"]).all()
    assert (out["true_cnt"] <= out["max_cnt"]).all()


# ---------------------------------------------------------------------------
# A-Res weighted reservoir
# ---------------------------------------------------------------------------


def _ares_keys(doc_id: int, w: int) -> tuple[int, int]:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return round(math.log(u) / w * 1e9), round(math.log(u) * 1e9)


def test_weighted_reservoir_hashlib_replay(spark, tmp_path):
    """50 docs, weights 48..552: the md5->u->ln(u)/w chain replayed
    with hashlib/math picks the same 10 doc_ids in the same order for
    BOTH arms, with identical e9 keys."""
    rows = []
    for i in range(1, 51):
        rows.append((i, "t", "en", f"src{i % 3}", 48 + (i * 103) % 500))
    pdf = _docs(rows)
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    out = _collect(spark, "sample_weighted_reservoir", tmp_path)
    assert len(out) == 20
    for method, keyfn in (("weighted", 0), ("uniform", 1)):
        arm = out[out["method"] == method].sort_values("rank")
        assert list(arm["rank"]) == list(range(1, 11))
        keys = {
            int(r.doc_id): _ares_keys(int(r.doc_id), int(pdf.set_index("doc_id").loc[int(r.doc_id), "n_chars"]))[keyfn]
            for r in arm.itertuples()
        }
        expect = sorted(
            (
                (_ares_keys(int(d), int(w))[keyfn], int(d))
                for d, w in zip(pdf.doc_id, pdf.n_chars)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        assert [d for _, d in expect] == list(arm["doc_id"].astype(int))
        for kk, dd in expect:
            assert keys[dd] == kk
        if method == "weighted":
            assert (
                arm.set_index("doc_id")["weight"]
                == pdf.set_index("doc_id").loc[arm["doc_id"], "n_chars"]
            ).all()
        else:
            assert (arm["weight"] == 1).all()
    _frames_equal(out, _duck_oracle("sample_weighted_reservoir", tmp_path))


def test_weighted_reservoir_weight_monotone(spark, tmp_path):
    """Same u for every doc is impossible, but a doc with an enormous
    weight has key ln(u)/w -> 0- and must outrank any small-weight doc
    sharing a similar u: give one doc weight 10^9 and the rest weight
    1 — the heavy doc is ALWAYS rank 1 in the weighted arm (its key is
    ~1e9 times closer to zero), while the uniform arm ignores weight."""
    rows = [(1, "t", "en", "s", 1_000_000_000)]
    rows += [(i, "t", "en", "s", 1) for i in range(2, 30)]
    _docs(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "sample_weighted_reservoir", tmp_path)
    w1 = out[(out["method"] == "weighted") & (out["rank"] == 1)]
    assert int(w1.iloc[0]["doc_id"]) == 1
    # uniform arm ranks purely by u: doc 1 wins only if its md5 says so
    u_rank = {
        int(r.doc_id): int(r.rank)
        for r in out[out["method"] == "uniform"].itertuples()
    }
    expect_u = sorted(
        ((_ares_keys(d, 1)[1], d) for d in range(1, 30)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [d for _, d in expect_u] == [
        d for d, _ in sorted(u_rank.items(), key=lambda kv: kv[1])
    ]
    _frames_equal(out, _duck_oracle("sample_weighted_reservoir", tmp_path))


def test_weighted_reservoir_excludes_nonpositive_weights(spark, tmp_path):
    rows = [(1, "t", "en", "s", 0), (2, "t", "en", "s", 7), (3, "t", "en", "s", 9)]
    _docs(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "sample_weighted_reservoir", tmp_path)
    assert set(out["doc_id"].astype(int)) == {2, 3}
    _frames_equal(out, _duck_oracle("sample_weighted_reservoir", tmp_path))


# ---------------------------------------------------------------------------
# eval-side leakage screen
# ---------------------------------------------------------------------------


def test_eval_leakage_closed_form(spark, tmp_path):
    """Hand-counted 5-gram leakage: E1 has 2 distinct grams, 1 leaked
    (g='w1..w5' appears in train); E2 is too short (degenerate); E3's
    rotations give 5 distinct grams, 1 leaked; E4 duplicates a train
    doc -> all 3 grams leak -> compromised."""
    e1 = "w1 w2 w3 w4 w5 w6"
    e2 = "x1 x2 x3"
    e3 = "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5"
    e4 = "y1 y2 y3 y4 y5 y6 y7"
    t1 = "z9 z8 w1 w2 w3 w4 w5"  # contributes gram w1..w5 (+2 others)
    t2 = e4  # exact train duplicate of E4
    _docs(
        [
            (1, e1, "en", "src0", len(e1)),
            (2, e2, "en", "src0", len(e2)),
            (3, e3, "en", "src0", len(e3)),
            (4, e4, "en", "src0", len(e4)),
            (10, t1, "en", "src1", len(t1)),
            (11, t2, "en", "src2", len(t2)),
        ]
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    out = _collect(spark, "dq_eval_leakage_screen", tmp_path)
    got = {
        int(r["doc_id"]): (
            int(r["n_grams"]),
            int(r["n_leaked_grams"]),
            int(r["leaked_frac_e6"]),
            bool(r["compromised"]),
            bool(r["degenerate"]),
        )
        for _, r in out.iterrows()
    }
    assert got == {
        1: (2, 1, 500000, False, False),
        2: (0, 0, 0, False, True),
        3: (5, 1, 200000, False, False),
        4: (3, 3, 1000000, True, False),
    }
    _frames_equal(out, _duck_oracle("dq_eval_leakage_screen", tmp_path))


def test_eval_leakage_complements_train_screen(spark):
    """Directional consistency on real data: the eval side sees leaked
    grams iff SOME training doc overlaps the eval set — so
    (any eval doc has n_leaked > 0) == (any train doc has overlap > 0
    in decontaminate_against_eval)."""
    ev = _collect(spark, "dq_eval_leakage_screen", "/root/testdata/sf0.001")
    tr = _collect(
        spark, "decontaminate_against_eval", "/root/testdata/sf0.001"
    )
    assert (ev["n_leaked_grams"].sum() > 0) == (
        tr["n_overlap_5grams"].sum() > 0
    )
    assert not ev["degenerate"].any()  # corpus docs are all >= 5 tokens


# ---------------------------------------------------------------------------
# relational Bloom-join prefilter
# ---------------------------------------------------------------------------


def _parts(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows,
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    for c in ("p_partkey", "p_size"):
        df[c] = df[c].astype(np.int64)
    df["p_retailprice"] = df["p_retailprice"].astype(np.float64)
    return df


def _lineitems(rows) -> pd.DataFrame:
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ]
    df = pd.DataFrame(rows, columns=cols)
    for c in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        df[c] = df[c].astype(np.int64)
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        df[c] = df[c].astype(np.float64)
    return df


def test_bloom_prefilter_closed_form(spark, tmp_path):
    """Parts 1,2 pass the size predicate (brands B1, B2); part 3 does
    not. Line items: two on part 1 (one order sharing identical
    (partkey, rev) twice — the row-identity grouping trap), one on
    part 2, one on part 3 (pruned). Revenue cents hand-computed."""
    _parts(
        [
            (1, "n", "B1", "t", 2, 1.0),
            (2, "n", "B2", "t", 5, 1.0),
            (3, "n", "B3", "t", 40, 1.0),
        ]
    ).to_parquet(tmp_path / "part.parquet", index=False)
    d = "2024-01-01"
    _lineitems(
        [
            (100, 1, 1, 1, 1.0, 10.0, 0.1, 0.0, "N", "O", d),
            (100, 1, 1, 2, 1.0, 10.0, 0.1, 0.0, "N", "O", d),  # same (pk, rev)
            (101, 2, 1, 1, 2.0, 33.335, 0.0, 0.0, "N", "O", d),
            (102, 3, 1, 1, 1.0, 99.0, 0.0, 0.0, "N", "O", d),
        ]
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)

    out = _collect(spark, "join_bloom_prefilter_dim", tmp_path).sort_values(
        "p_brand"
    )
    got = [
        (r["p_brand"], int(r["n_items"]), int(r["revenue_c2"]))
        for _, r in out.iterrows()
    ]
    # B1: 2 items at 10*0.9 = 9.00 -> 900 cents each; B2: 3333.5 -> 3334
    # (round-half-up of 3333.5)
    assert got == [("B1", 2, 1800), ("B2", 1, 3334)]
    _frames_equal(
        out,
        _duck_oracle(
            "join_bloom_prefilter_dim", tmp_path, tables=("lineitem", "part")
        ),
    )


def test_bloom_prefilter_matches_plain_join(spark):
    """Transparency on real data: the bloom-prefiltered pipeline equals
    the plain Spark join computed WITHOUT any bloom (not just the
    DuckDB oracle — an independent same-engine recompute)."""
    from pyspark.sql import functions as F

    from emr_with_custom_metrics_spark.catalog import load_table
    from emr_with_custom_metrics_spark.operators.wave16a import (
        _BLOOM_DIM_MAX_SIZE,
    )

    sf = "/root/testdata/sf0.001"
    out = _collect(spark, "join_bloom_prefilter_dim", sf)
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    plain = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .where(F.col("p_size") <= _BLOOM_DIM_MAX_SIZE)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_c2"),
        )
        .toPandas()
    )
    _frames_equal(out, plain)


def test_bloom_prefilter_empty_dim(spark, tmp_path):
    """No part passes the predicate: empty bloom, empty result — and
    the oracle agrees (0 rows, schema intact)."""
    _parts([(1, "n", "B1", "t", 40, 1.0)]).to_parquet(
        tmp_path / "part.parquet", index=False
    )
    _lineitems(
        [(100, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-01")]
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = _collect(spark, "join_bloom_prefilter_dim", tmp_path)
    assert len(out) == 0
    assert sorted(out.columns) == ["n_items", "p_brand", "revenue_c2"]
