"""Randomized differential fuzz for the wave-16a operators: hostile
documents frames (tiny corpora, single-token docs, sources with fewer
distinct tokens than the MG capacity, an empty eval split) and hostile
part/lineitem frames (empty dim predicate, duplicate (partkey, rev)
payloads, dangling foreign keys) — the REGISTRY query and its DuckDB
oracle must produce identical frames on every seed."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match

DOC_OPS = [
    "sketch_spacesaving_topk",
    "sample_weighted_reservoir",
    "dq_eval_leakage_screen",
    # wave 16b
    "sketch_bottomk_jaccard",
    "retrieval_dirichlet_lm",
    # wave 16c
    "corpus_source_concentration",
    # wave 16d
    "text_oov_rate",
    "sketch_ams_f2",
    "text_chao1_richness",
]
TPCH_OPS = [
    "join_bloom_prefilter_dim",
]
# wave 16b: hostile events (ties, near-constant, bursty, tiny user
# pools — the wave15 generator) and hostile embeddings (dups, isolated
# vectors, random labels)
EVENT_OPS = [
    "timeseries_kpss",
    "spc_ewma_chart",
    "stats_hoeffding_drift",
    # wave 16c
    "stats_mood_median",
    # wave 16d
    "stats_eb_shrinkage",
]
EMB_OPS = [
    "graph_conductance_labels",
]
# wave 16c: hostile customer/orders (zero-spend customers, dangling
# order custkeys, duplicate prices, single-customer frames)
CUST_OPS = [
    "stats_atkinson_spend",
]


def _cust_orders_frames(seed: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.default_rng(seed + 3100)
    n_cust = int(rng.integers(1, 40))
    cust = pd.DataFrame(
        {"c_custkey": np.arange(1, n_cust + 1, dtype="int64")}
    )
    n_ord = int(rng.integers(0, 80))
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n_ord + 1, dtype="int64"),
            # keys beyond n_cust dangle; many customers get NO order
            # (the zero-spend LEFT JOIN path)
            "o_custkey": rng.integers(1, n_cust + 3, n_ord).astype("int64"),
            "o_totalprice": rng.choice(
                [0.01, 1.0, 1.0, 49.99, 500.0], n_ord
            ),
        }
    )
    return cust, orders


def _docs_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1600)
    # vocab sometimes SMALLER than the MG capacity (m=8): the exact
    # per-source path (delta_s = 0); sometimes much larger: real
    # compression with nonzero decrements
    vocab = [f"w{i}" for i in range(int(rng.integers(3, 80)))]
    texts, srcs = [], []
    n_docs = int(rng.integers(3, 24))
    # sometimes NO src0 docs at all: the eval split is empty and the
    # leakage screen must emit zero rows on both engines
    sources = (
        [f"src{j}" for j in range(1, 4)]
        if rng.random() < 0.25
        else [f"src{j}" for j in range(4)]
    )
    for i in range(n_docs):
        style = rng.choice(["randy", "mono", "short", "copy"])
        if style == "short":
            # below the 5-gram threshold: degenerate-flagged, never drop
            ln = int(rng.integers(1, 5))
        else:
            ln = int(rng.integers(5, 400))
        if style == "mono":
            toks = [vocab[0]] * ln
        elif style == "copy" and texts:
            # verbatim replica of an earlier doc in ANOTHER source:
            # guaranteed leakage when the original was eval-side
            toks = texts[int(rng.integers(0, len(texts)))].split(" ")
        else:
            toks = list(rng.choice(vocab, ln))
        texts.append(" ".join(toks))
        srcs.append(sources[int(rng.integers(0, len(sources)))])
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": "en",
            "source": srcs,
            "n_chars": np.asarray([len(t) for t in texts], dtype="int64"),
        }
    )


def _tpch_frames(seed: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.default_rng(seed + 2300)
    n_parts = int(rng.integers(4, 60))
    # sometimes every p_size > 5: empty dim, empty bloom, empty answer
    size_lo = 6 if rng.random() < 0.2 else 1
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(1, n_parts + 1, dtype="int64"),
            "p_name": [f"part {i}" for i in range(n_parts)],
            "p_brand": rng.choice(["Brand#1", "Brand#2", "Brand#3"], n_parts),
            "p_type": "STANDARD",
            "p_size": rng.integers(size_lo, 20, n_parts).astype("int32"),
            "p_retailprice": rng.uniform(100, 2000, n_parts).round(2),
        }
    )
    n_li = int(rng.integers(10, 400))
    # dangling keys beyond n_parts: rows the join must drop; duplicate
    # (partkey, price, discount) payloads: the row-identity grouping test
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, 40, n_li).astype("int64"),
            "l_linenumber": np.arange(1, n_li + 1, dtype="int32"),
            "l_partkey": rng.integers(1, n_parts + 3, n_li).astype("int64"),
            "l_extendedprice": rng.choice(
                rng.uniform(100, 5000, 8).round(2), n_li
            ),
            "l_discount": rng.choice([0.0, 0.05, 0.1], n_li),
        }
    )
    return part, li


@pytest.mark.parametrize("seed", [19, 59, 101, 149])
def test_wave16_fuzz_cross_engine(spark, tmp_path_factory, seed):
    from tests.test_wave15_fuzz import _emb_frame, _events_frame

    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    d = tmp_path_factory.mktemp(f"w16fuzz{seed}")
    _docs_frame(seed).to_parquet(d / "documents.parquet", index=False)
    part, li = _tpch_frames(seed)
    part.to_parquet(d / "part.parquet", index=False)
    li.to_parquet(d / "lineitem.parquet", index=False)
    _events_frame(seed).to_parquet(d / "events.parquet", index=False)
    _emb_frame(seed).to_parquet(d / "embeddings.parquet", index=False)
    cust, orders = _cust_orders_frames(seed)
    cust.to_parquet(d / "customer.parquet", index=False)
    orders.to_parquet(d / "orders.parquet", index=False)
    con = duckdb.connect()
    for t in (
        "documents",
        "part",
        "lineitem",
        "events",
        "embeddings",
        "customer",
        "orders",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        for name in DOC_OPS + TPCH_OPS + EVENT_OPS + EMB_OPS + CUST_OPS:
            got = specs[name].fn(spark, str(d)).toPandas()
            oracle = con.sql(specs[name].oracle).df()
            assert_frames_match(got, oracle, f"fuzz{seed}:{name}")
    finally:
        con.close()
