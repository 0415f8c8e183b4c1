"""Runtime adaptivity and durability: AQE skew-join splitting observed in
the executed plan, and streaming checkpoint recovery processing nothing
twice."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join(spark):
    """A 95%-one-key build side must trigger AQE's skew-join handling once
    thresholds are scaled to the local data volume (at cluster scale the
    defaults — 256 MB / 5× median — do the same job)."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # pin AQE on: registry._pin_utc turns it off for small-SF registered
        # queries, and this suite shares the session with the parity tests
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        skewed = spark.range(0, 400_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("name")
        )
        # Inspect the BARE join's own QueryExecution: a downstream aggregate
        # would both (a) belong to a different QE after .count() and
        # (b) suppress skew-splitting unless forceOptimizeSkewedJoin is set.
        joined = skewed.join(dim, "k")
        joined.collect()  # run THIS plan → AQE finalizes it
        plan = _executed_plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_partitions(spark):
    """32 configured shuffle partitions over a tiny aggregate must coalesce
    at runtime (AQEShuffleRead coalesced) instead of running 32 tasks."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")  # see skew test note
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    df = spark.range(0, 10_000).groupBy((F.col("id") % 5).alias("g")).agg(
        F.count("*").alias("n")
    )
    df.collect()
    plan = _executed_plan(df)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:3000]


def test_streaming_checkpoint_restart_processes_nothing_twice(spark):
    """Restarting an availableNow query on the same checkpoint must find no
    new work: offsets are durable, the sink sees zero further batches."""
    from emr_with_custom_metrics_spark.catalog import load_table
    from emr_with_custom_metrics_spark.streaming.pipeline import (
        CooldownSink,
        start_metrics_pipeline,
    )
    from tests.conftest import SF_SMOKE_DIR

    src = tempfile.mkdtemp(prefix="events_ckpt_")
    load_table(spark, SF_SMOKE_DIR, "events").repartition(3).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="ckpt_recovery_")

    class Counting(CooldownSink):
        def __init__(self):
            super().__init__()
            self.batches = 0

        def __call__(self, batch_df, batch_id):
            self.batches += 1
            super().__call__(batch_df, batch_id)

    s1 = Counting()
    q1, _ = start_metrics_pipeline(spark, src, ckpt, sink=s1, trigger={"availableNow": True})
    assert q1.awaitTermination(420), "stream did not finish (timeout is silent)"
    assert s1.batches > 0

    s2 = Counting()
    q2, _ = start_metrics_pipeline(spark, src, ckpt, sink=s2, trigger={"availableNow": True})
    assert q2.awaitTermination(420), "stream did not finish (timeout is silent)"
    assert len(s2.actions) == 0, "restart re-emitted alarms already processed"
