"""Structured Streaming wiring for the metrics control loop.

The reference runs this dataflow as cron + bash + CloudWatch (SURVEY.md §3
EP2/EP3): scrape every 30 s (M6), derive a gauge (M3), let CloudWatch window
it 300 s (R1) and fire threshold alarms (R2-R4) with a 300 s cooldown (R5).
Here the whole loop is ONE streaming query:

    readStream(events) → withWatermark → window(300 s) avg → threshold filter
      → foreachBatch(cooldown-stateful sink)

The trigger is a single correct ``processingTime='30 seconds'`` — the
reference's crontab installs a broken first invocation (`.sh.sh` typo,
reference scripts/setup-custom-metrics.sh:24) making its effective cadence
60 s; we do not replicate the bug (SURVEY.md §4.4).

Tests drive this with ``trigger(availableNow=True)`` over the parquet
``events`` table as a file source; in production the source would be Kafka /
Kinesis — the plan is identical by Spark's batch/stream unification.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from emr_with_custom_metrics_spark.streaming.metrics import (
    COOLDOWN_SECONDS,
    SCALE_IN_THRESHOLD,
    SCALE_OUT_THRESHOLD,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet (one file per microbatch
    in tests); swap for Kafka/Kinesis in production — same downstream plan."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_metric(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """M3+R1: derived gauge → event-time 300 s tumbling average with a
    watermark bounding late-data state (absent from the reference, which
    had no event-time notion at all — SURVEY.md §2A.1 streaming row)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.round(F.avg("value"), 4).alias("avg_value"), F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("bucket_start"),
            "avg_value",
            "n_events",
        )
    )


def threshold_alarms(metric: DataFrame) -> DataFrame:
    """R2/R3 as one routed stream."""
    return metric.select(
        "bucket_start",
        "avg_value",
        F.when(F.col("avg_value") <= SCALE_OUT_THRESHOLD, F.lit("scale-out"))
        .when(F.col("avg_value") > SCALE_IN_THRESHOLD, F.lit("scale-in"))
        .alias("rule"),
        F.when(F.col("avg_value") <= SCALE_OUT_THRESHOLD, F.lit(5))
        .when(F.col("avg_value") > SCALE_IN_THRESHOLD, F.lit(-2))
        .alias("scaling_adjustment"),
    ).where(F.col("rule").isNotNull())


class CooldownSink:
    """R5: per-rule cooldown state held across microbatches (foreachBatch).

    The reference's cooldown lives inside AWS (CloudWatch alarm state); here
    it is a tiny driver-side dict keyed by rule — at production scale this
    state would live in the checkpointed state store via
    ``applyInPandasWithState``; the rule-key cardinality (2) makes the
    driver-side dict exact and cheap. Collecting is safe because the input
    is already one row per (rule, 300 s bucket).
    """

    def __init__(self, on_action: Callable[[str, int, float], None] | None = None):
        self.last_fire: dict[str, int] = {}
        self.actions: list[tuple[str, int, float]] = []
        self.on_action = on_action

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.orderBy("bucket_start").collect()
        for r in rows:
            last = self.last_fire.get(r["rule"])
            if last is None or r["bucket_start"] > last + COOLDOWN_SECONDS:
                self.last_fire[r["rule"]] = r["bucket_start"]
                self.actions.append((r["rule"], r["bucket_start"], r["avg_value"]))
                if self.on_action:
                    self.on_action(r["rule"], r["bucket_start"], r["avg_value"])


def start_metrics_pipeline(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink: CooldownSink | None = None,
    trigger: dict | None = None,
):
    """Assemble and start the full control-loop query. Returns (query, sink)."""
    sink = sink or CooldownSink()
    alarms = threshold_alarms(windowed_metric(read_event_stream(spark, events_path)))
    writer = (
        alarms.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    writer = writer.trigger(**(trigger or {"processingTime": "30 seconds"}))
    return writer.start(), sink
