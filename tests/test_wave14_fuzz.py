"""Randomized differential fuzz for the wave-14 operators: hostile
events frames (ties, near-constant values, bursty timestamps, short
histories) and hostile embeddings frames (duplicate vectors, isolated
vectors, degenerate near-zero vectors) — the REGISTRY query and its
DuckDB oracle must produce identical frames on every seed."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match

EVENT_OPS = [
    "survival_nelson_aalen",
    "stats_seasonal_mann_kendall",
    "stats_energy_distance",
    "timeseries_theta_method",
    "timeseries_cross_coherence",
    "timeseries_kleinberg_depth",
    "events_markov_spectral_gap",
    "stats_lin_ccc",
    "timeseries_variance_ratio",
    "dq_t_closeness",
]
EMB_OPS = ["graph_rich_club", "graph_modularity",
           "embedding_intrinsic_dim", "embedding_knn_outliers"]
DOC_OPS = ["text_burrows_delta"]


def _events_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(400, 1500))
    n_users = int(rng.integers(3, 40))
    dist = rng.choice(["uniform", "lattice", "nearconst", "bursty"])
    if dist == "uniform":
        vals = rng.uniform(0, 900, n)
    elif dist == "lattice":
        vals = rng.choice([0.25, 1.0, 1.0, 3.5, 3.5, 42.0], n)
    elif dist == "nearconst":
        vals = np.full(n, 7.0) + rng.choice([0.0, 0.0, 0.0, 0.001], n)
    else:
        vals = rng.uniform(0, 50, n)
    if dist == "bursty":
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


def _emb_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 500)
    n = int(rng.integers(12, 60))
    dim = 8
    vecs = []
    for i in range(n):
        style = rng.choice(["cluster", "dup", "iso"])
        if style == "cluster":
            c = int(rng.integers(0, 3))
            v = np.zeros(dim)
            v[c] = 1.0
            v = v + 0.05 * rng.normal(size=dim)
        elif style == "dup":
            v = np.zeros(dim)
            v[0] = 1.0
        else:
            v = rng.normal(size=dim)
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": vecs,
            # hostile labels: some aligned with clusters, some random
            "label": rng.integers(0, 4, n).astype("int32"),
        }
    )


def _docs_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1500)
    vocab = [f"w{i}" for i in range(int(rng.integers(2, 60)))]
    texts, srcs = [], []
    for i in range(int(rng.integers(4, 20))):
        style = rng.choice(["randy", "cyclic", "mono", "distinct"])
        ln = int(rng.integers(1, 150))
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


@pytest.mark.parametrize("seed", [13, 47, 89, 131])
def test_wave14_fuzz_cross_engine(spark, tmp_path_factory, seed):
    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    d = tmp_path_factory.mktemp(f"w14fuzz{seed}")
    _events_frame(seed).to_parquet(d / "events.parquet", index=False)
    _emb_frame(seed).to_parquet(d / "embeddings.parquet", index=False)
    _docs_frame(seed).to_parquet(d / "documents.parquet", index=False)
    con = duckdb.connect()
    for t in ("events", "embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    try:
        for name in EVENT_OPS + EMB_OPS + DOC_OPS:
            got = specs[name].fn(spark, str(d)).toPandas()
            oracle = con.sql(specs[name].oracle).df()
            assert_frames_match(got, oracle, f"fuzz{seed}:{name}")
    finally:
        con.close()
