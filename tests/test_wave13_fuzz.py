"""Randomized differential fuzz for the wave-13 operators: each seed
synthesizes a hostile events frame (heavy ties, near-constant values,
sparse hours for the spine-fed series ops, short user journeys for the
sequential decoders) plus a hostile documents frame (repetitive /
single-token / cyclic texts for MTLD and Simpson) and a sparse
lineitem frame (intermittent demand trains for Croston), and requires
the REGISTRY query and its DuckDB oracle to produce identical frames."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match

EVENT_OPS = [
    "timeseries_durbin_watson",
    "stats_ljung_box_resid",
    "stats_icc_agreement",
    "stats_storey_qvalue",
    "timeseries_kleinberg_multistate",
    "events_hmm_viterbi",
    "timeseries_holt_winters_seasonal",
    "timeseries_ar_order_fit",
    "stats_cochran_q",
    "stats_page_trend",
    "events_interevent_burstiness",
]
DOC_OPS = ["text_mtld", "text_simpson_diversity"]
LINEITEM_OPS = ["demand_croston_sbc", "basket_association_rules"]


def _events_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 2000))
    n_users = int(rng.integers(5, 50))
    dist = rng.choice(["uniform", "lattice", "nearconst", "bursty"])
    if dist == "uniform":
        vals = rng.uniform(0, 900, n)
    elif dist == "lattice":
        vals = rng.choice([0.25, 1.0, 1.0, 3.5, 3.5, 3.5, 42.0], n)
    elif dist == "nearconst":
        vals = np.full(n, 7.0) + rng.choice([0.0, 0.0, 0.0, 0.001], n)
    else:  # bursty timestamps: Kleinberg / DW hot path
        vals = rng.uniform(0, 50, n)
    if dist == "bursty":
        # concentrate 60% of events into a 2-day window
        t = np.where(
            rng.random(n) < 0.6,
            rng.integers(10 * 86400, 12 * 86400, n),
            rng.integers(0, 30 * 86400, n),
        )
    else:
        t = rng.integers(0, 30 * 86400, n)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(t, unit="s"),
            "user_id": rng.integers(0, n_users, n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n
            ),
            "value": vals,
            "props": "{}",
        }
    )


def _docs_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1000)
    vocab = [f"w{i}" for i in range(int(rng.integers(2, 40)))]
    texts, srcs = [], []
    for i in range(int(rng.integers(5, 25))):
        style = rng.choice(["randy", "cyclic", "mono", "distinct"])
        ln = int(rng.integers(1, 120))
        if style == "randy":
            toks = list(rng.choice(vocab, ln))
        elif style == "cyclic":
            cyc = list(rng.choice(vocab, min(4, len(vocab)), replace=False))
            toks = [cyc[j % len(cyc)] for j in range(ln)]
        elif style == "mono":
            toks = [vocab[0]] * ln
        else:
            toks = [f"u{i}_{j}" for j in range(ln)]
        texts.append(" ".join(toks))
        srcs.append(f"src{int(rng.integers(0, 4))}")
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": "en",
            "source": srcs,
            "n_chars": np.asarray([len(t) for t in texts], dtype="int64"),
        }
    )


def _part_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3000)
    keys = np.arange(1, 20, dtype="int64")
    return pd.DataFrame(
        {
            "p_partkey": keys,
            "p_name": "part",
            "p_brand": [f"B{int(rng.integers(0, 6))}" for _ in keys],
            "p_type": "t",
            "p_size": np.int32(1),
            "p_retailprice": 1.0,
        }
    )


def _lineitem_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 2000)
    n = int(rng.integers(50, 400))
    parts = rng.integers(1, 20, n).astype("int64")
    weeks = rng.integers(0, 200, n)
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_partkey": parts,
            "l_suppkey": np.int64(1),
            "l_linenumber": np.int32(1),
            "l_quantity": rng.integers(1, 50, n).astype("float64"),
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Series(
                pd.Timestamp("1995-01-02")
                + pd.to_timedelta(weeks * 7 + rng.integers(0, 7, n), unit="D")
            ).astype("datetime64[us]"),
        }
    )


@pytest.mark.parametrize("seed", [11, 43, 71, 103])
def test_wave13_fuzz_cross_engine(spark, tmp_path_factory, seed):
    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    d = tmp_path_factory.mktemp(f"w13fuzz{seed}")
    _events_frame(seed).to_parquet(d / "events.parquet", index=False)
    _docs_frame(seed).to_parquet(d / "documents.parquet", index=False)
    _lineitem_frame(seed).to_parquet(d / "lineitem.parquet", index=False)
    _part_frame(seed).to_parquet(d / "part.parquet", index=False)
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        for name in EVENT_OPS + DOC_OPS + LINEITEM_OPS:
            got = specs[name].fn(spark, str(d)).toPandas()
            oracle = con.sql(specs[name].oracle).df()
            assert_frames_match(got, oracle, f"fuzz{seed}:{name}")
    finally:
        con.close()
