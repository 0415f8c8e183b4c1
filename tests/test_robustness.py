"""Robustness behaviors a 100 TB ingest pipeline hits daily: malformed
records, schema drift, and overwrite atomicity — exercised through the real
reader/writer surfaces."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_json_permissive_captures_corrupt_records(spark):
    """PERMISSIVE mode: bad lines land in _corrupt_record instead of
    failing the 10-hour job at hour nine."""
    d = tempfile.mkdtemp(prefix="json_corrupt_")
    with open(os.path.join(d, "data.json"), "w") as f:
        f.write('{"id": 1, "v": 10.5}\n')
        f.write("this is not json at all\n")
        f.write('{"id": 2, "v": "not-a-number"}\n')
        f.write('{"id": 3, "v": 3.25}\n')
    df = (
        spark.read.schema("id BIGINT, v DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(d)
    ).cache()  # corrupt-record column requires materialization before filtering
    df.count()
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2  # ids 1 and 3
    assert bad.count() == 2  # garbage line + type-mismatched v
    assert {r["id"] for r in good.collect()} == {1, 3}


def test_csv_dropmalformed_skips_bad_rows(spark):
    d = tempfile.mkdtemp(prefix="csv_bad_")
    with open(os.path.join(d, "data.csv"), "w") as f:
        f.write("id,v\n1,10.5\nnot_an_int,oops,extra,fields\n3,2.5\n")
    df = (
        spark.read.schema("id BIGINT, v DOUBLE")
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(d)
    )
    rows = {r["id"]: r["v"] for r in df.collect()}
    assert rows == {1: 10.5, 3: 2.5}


def test_parquet_merge_schema_handles_drift(spark):
    """Schema evolution: files written before/after a column was added read
    back as the union schema with nulls for the missing column."""
    base = tempfile.mkdtemp(prefix="drift_") + "/table"
    spark.createDataFrame([(1, "a")], "id BIGINT, name STRING").write.parquet(f"{base}/d=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id BIGINT, name STRING, score DOUBLE"
    ).write.parquet(f"{base}/d=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_overwrite_replaces_not_appends(spark):
    out = tempfile.mkdtemp(prefix="ow_") + "/t"
    spark.range(100).write.mode("overwrite").parquet(out)
    spark.range(7).write.mode("overwrite").parquet(out)
    assert spark.read.parquet(out).count() == 7  # reference S2 semantics


def test_empty_input_produces_empty_not_error(spark):
    """Every registered aggregate must tolerate an empty slice of input —
    an empty partition/filter result is routine at scale."""
    from emr_with_custom_metrics_spark.catalog import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").where(F.lit(False))
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert agg.count() == 0
    global_agg = li.agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("s")
    ).collect()[0]
    assert global_agg["n"] == 0 and global_agg["s"] is None
