"""Production-flow utilities: parquet upsert and incremental corpus dedup."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.llm import dedup
from emr_with_custom_metrics_spark.plans.scale import upsert_parquet
from tests.conftest import SF_DIR


def test_upsert_parquet_replaces_and_appends(spark):
    path = tempfile.mkdtemp(prefix="upsert_") + "/t"
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id BIGINT, name STRING, v DOUBLE"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "B2", 20.0), (9, "new", 9.0)], "id BIGINT, name STRING, v DOUBLE"
    )
    upsert_parquet(spark, path, updates, key="id")
    rows = {r["id"]: (r["name"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", 1.0), 2: ("B2", 20.0), 3: ("c", 3.0), 9: ("new", 9.0)}


def test_upsert_is_idempotent(spark):
    path = tempfile.mkdtemp(prefix="upsert2_") + "/t"
    spark.range(10).select(F.col("id"), F.lit("x").alias("name")).write.parquet(path)
    updates = spark.createDataFrame([(5, "y")], "id BIGINT, name STRING")
    upsert_parquet(spark, path, updates, key="id")
    upsert_parquet(spark, path, updates, key="id")  # second run changes nothing
    out = spark.read.parquet(path)
    assert out.count() == 10
    assert out.where(F.col("name") == "y").collect()[0]["id"] == 5


def test_dedup_corpus_keep_list(spark):
    """The one-call dedup façade: every doc classified, representatives are
    cluster minima, keep-list size == number of connected components; the
    planted bag-duplicates must NOT survive as keepers."""
    docs = load_table(spark, SF_DIR, "documents")
    result = dedup.dedup_corpus(docs).cache()
    n_docs = docs.count()
    assert result.count() == n_docs  # every doc classified exactly once
    kept = result.where(F.col("keep"))
    # each cluster has exactly one keeper, and it is the cluster minimum
    per_cluster = result.groupBy("cluster_rep").agg(
        F.sum(F.col("keep").cast("int")).alias("keepers"),
        F.min("doc_id").alias("min_id"),
    )
    bad = per_cluster.where(
        (F.col("keepers") != 1) | (F.col("min_id") != F.col("cluster_rep"))
    )
    assert bad.count() == 0
    # planted bag-duplicates: distinct bag fingerprints >= kept docs
    from pyspark.sql import functions as SF

    n_bags = docs.select(
        SF.md5(
            SF.concat_ws(" ", SF.array_sort(SF.array_distinct(SF.split("text", " "))))
        ).alias("b")
    ).distinct().count()
    assert kept.count() <= n_bags < n_docs
    result.unpersist()


def test_incremental_dedup_flags_known_documents(spark):
    """Docs already in the corpus (planted: the batch IS a corpus sample)
    must collide with their own corpus signatures; novel synthetic docs
    must not collide with anything."""
    docs = dedup._shingle_sets(load_table(spark, SF_DIR, "documents"))
    corpus = docs.where(F.col("doc_id") < 400)
    corpus_sigs = dedup.minhash_signatures(corpus)

    # incoming batch: 20 docs copied from the corpus + 3 genuinely novel ones
    resent = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "toks"
    )
    # shingle sets are 64-bit hashes now; novel docs = hash values that no
    # real shingle hash will equal (tiny positive ints)
    novel = spark.createDataFrame(
        [
            (200001, [10_000 + i for i in range(40)]),
            (200002, [20_000 + i for i in range(40)]),
            (200003, [30_000 + i for i in range(40)]),
        ],
        "doc_id BIGINT, toks ARRAY<BIGINT>",
    )
    batch = resent.unionByName(novel)
    cands = dedup.incremental_dedup(corpus_sigs, batch)
    hits = {r["new_doc_id"] for r in cands.collect()}
    # every re-sent doc collides with its original (identical signature)
    missing = {100000 + i for i in range(20)} - hits
    assert not missing, missing
    pairs = {(r["new_doc_id"], r["corpus_doc_id"]) for r in cands.collect()}
    for i in range(20):
        assert (100000 + i, i) in pairs, f"resent doc {i} missed its original"
    assert not hits & {200001, 200002, 200003}, "novel docs falsely flagged"


def test_poll_series_through_injected_transport(spark):
    """M1/M6 seam (VERDICT r01 #6): the capture loop takes an injected
    fetch + clock + sleep, so a deployment's HTTP client is configuration;
    the captured frame flows straight into the M2/M3 parse stage."""
    from datetime import datetime, timedelta, timezone

    from emr_with_custom_metrics_spark.sources.metrics_source import (
        parse_cluster_metrics,
        poll_once,
        poll_series,
        sample_payload,
    )

    calls: list[str] = []
    slept: list[float] = []
    tick = {"n": 0}

    def fake_fetch(url: str) -> str:
        calls.append(url)
        return sample_payload(available=len(calls) * 2, total=16)

    def fake_now():
        tick["n"] += 1
        return datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=30 * tick["n"])

    assert poll_once("http://rm:8088/ws/v1/cluster/metrics", fake_fetch) == sample_payload(2, 16)
    calls.clear()

    raw = poll_series(
        spark,
        "http://rm:8088/ws/v1/cluster/metrics",
        n_polls=3,
        interval_s=30.0,
        fetch=fake_fetch,
        sleep=slept.append,
        now=fake_now,
    )
    assert calls == ["http://rm:8088/ws/v1/cluster/metrics"] * 3
    assert slept == [30.0, 30.0]  # cadence honored, first poll immediate
    derived = parse_cluster_metrics(raw).orderBy("poll_ts").collect()
    assert [r["available_vcores"] for r in derived] == [2, 4, 6]
    assert derived[0]["core_available_pct"] == 12.5
