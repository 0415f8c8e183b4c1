"""MergeTarget interface: upsert semantics (replace/append/idempotent),
partition-scoped rewrites that leave untouched partitions' files alone,
cross-partition-move and emptied-partition guards, Delta gating."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.plans.merge import (
    DeltaTarget,
    ParquetRewriteTarget,
    PartitionedParquetTarget,
)


def _snapshot(target):
    return {
        r["k"]: (r["p"], r["v"]) for r in target.read().select("k", "p", "v").collect()
    }


@pytest.fixture()
def seeded(spark):
    path = tempfile.mkdtemp(prefix="merge_t_") + "/t"
    df = spark.createDataFrame(
        [(k, k % 3, float(k)) for k in range(30)], "k long, p long, v double"
    )
    df.write.partitionBy("p").parquet(path)
    return path


def test_parquet_rewrite_merge_semantics(spark, seeded):
    t = ParquetRewriteTarget(spark, seeded)
    updates = spark.createDataFrame(
        [(3, 0, 999.0), (100, 1, 100.0)], "k long, p long, v double"
    )
    t.merge(updates, "k")
    snap = _snapshot(t)
    assert snap[3] == (0, 999.0) and snap[100] == (1, 100.0) and len(snap) == 31
    t.merge(updates, "k")  # idempotent
    assert _snapshot(t) == snap
    t.delete_where(F.col("k") >= 100)
    assert 100 not in _snapshot(t)


def test_partitioned_merge_touches_only_affected_partitions(spark, seeded):
    t = PartitionedParquetTarget(spark, seeded, "p")
    untouched_files = set(glob.glob(f"{seeded}/p=2/*.parquet"))
    assert untouched_files
    updates = spark.createDataFrame(
        [(3, 0, 999.0), (101, 1, 101.0)], "k long, p long, v double"
    )
    t.merge(updates, "k")
    snap = _snapshot(t)
    assert snap[3] == (0, 999.0) and snap[101] == (1, 101.0) and len(snap) == 31
    # partition p=2 was neither touched by updates nor rewritten
    assert set(glob.glob(f"{seeded}/p=2/*.parquet")) == untouched_files
    t.merge(updates, "k")
    assert _snapshot(t) == snap


def test_partitioned_merge_rejects_cross_partition_move(spark, seeded):
    t = PartitionedParquetTarget(spark, seeded, "p")
    mover = spark.createDataFrame([(3, 1, 3.0)], "k long, p long, v double")  # 3 lives in p=0
    with pytest.raises(ValueError, match="moves key"):
        t.merge(mover, "k")


def test_partitioned_delete_scoped_and_guarded(spark, seeded):
    t = PartitionedParquetTarget(spark, seeded, "p")
    untouched_files = set(glob.glob(f"{seeded}/p=2/*.parquet"))
    t.delete_where((F.col("p") == 0) & (F.col("k") >= 27))
    snap = _snapshot(t)
    assert 27 not in snap and len(snap) == 29
    assert set(glob.glob(f"{seeded}/p=2/*.parquet")) == untouched_files
    with pytest.raises(ValueError, match="empties whole partition"):
        t.delete_where(F.col("p") == 1)  # would empty the partition


def test_delta_target_gated_behind_import(spark, seeded):
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; gating not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaTarget(spark, seeded)


def test_streaming_upsert_through_merge_target(spark):
    """Composition: a stream applied to a MergeTarget inside foreachBatch —
    the continuous-ingestion upsert pipeline. Re-keyed events arriving in
    later micro-batches must overwrite earlier values (last-writer-wins by
    batch order), new keys append."""
    import tempfile as tf

    path = tf.mkdtemp(prefix="stream_merge_") + "/t"
    spark.createDataFrame(
        [(k, k % 3, 0.0) for k in range(12)], "k long, p long, v double"
    ).write.partitionBy("p").parquet(path)
    target = PartitionedParquetTarget(spark, path, "p")

    src = tf.mkdtemp(prefix="stream_merge_src_")
    # two micro-batch files: batch 2 re-updates key 5 (same partition p=2)
    spark.createDataFrame([(5, 2, 55.0), (20, 2, 20.0)], "k long, p long, v double") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame([(5, 2, 555.0), (21, 0, 21.0)], "k long, p long, v double") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("k long, p long, v double") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", tf.mkdtemp(prefix="ckpt_merge_"))
        .foreachBatch(lambda df, _id: target.merge(df, "k"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    snap = _snapshot(target)
    assert snap[20] == (2, 20.0) and snap[21] == (0, 21.0)
    assert snap[5][1] in (55.0, 555.0)  # one of the update batches won...
    assert len(snap) == 14
    # ...and since file order is deterministic here, specifically the later one
    assert snap[5] == (2, 555.0)
