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

import json
import os
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
        .agg((F.round((F.avg("value")) * 10000).cast("bigint") / 10000.0).alias("avg_value"), F.count("*").alias("n_events"))
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
    it is a tiny per-rule dict — rule-key cardinality is 2, and the input is
    already one row per (rule, 300 s bucket), so collecting is safe. At
    high key cardinality (thousands of cluster×rule keys) use
    ``start_metrics_pipeline_grouped_state`` below, which moves the
    decision into ``stateful.cooldown_fires`` (``applyInPandasWithState``)
    — state sharded across executors in the checkpointed state store;
    equivalence of the two wirings is test-asserted.

    Durability: the query checkpoints its SOURCE offsets, so the sink must
    checkpoint its own state or restarts forget in-flight cooldowns and
    foreachBatch replays (at-least-once) re-fire actions. With
    ``state_path`` set (the default wiring under the query's checkpoint
    dir), the dict + last completed batch id are written atomically after
    each batch; a replayed or restarted batch with ``batch_id`` ≤ the
    committed id is skipped outright — actions become idempotent relative
    to the durable state.
    """

    def __init__(
        self,
        on_action: Callable[[str, int, float], None] | None = None,
        state_path: str | None = None,
    ):
        self.last_fire: dict[str, int] = {}
        self.actions: list[tuple[str, int, float]] = []
        self.on_action = on_action
        self.state_path = state_path
        self.committed_batch = -1
        if state_path and os.path.exists(state_path):
            with open(state_path) as f:
                st = json.load(f)
            self.last_fire = {k: int(v) for k, v in st["last_fire"].items()}
            self.committed_batch = int(st["batch_id"])

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.committed_batch:
            return  # replay of an already-committed batch: decisions stand
        rows = batch_df.orderBy("bucket_start").collect()
        for r in rows:
            last = self.last_fire.get(r["rule"])
            if last is None or r["bucket_start"] > last + COOLDOWN_SECONDS:
                self.last_fire[r["rule"]] = r["bucket_start"]
                self.actions.append((r["rule"], r["bucket_start"], r["avg_value"]))
                if self.on_action:
                    self.on_action(r["rule"], r["bucket_start"], r["avg_value"])
        if self.state_path:
            os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
            tmp = f"{self.state_path}.tmp"
            with open(tmp, "w") as f:
                json.dump({"batch_id": batch_id, "last_fire": self.last_fire}, f)
            os.replace(tmp, self.state_path)
        self.committed_batch = batch_id


def start_metrics_pipeline(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink: CooldownSink | None = None,
    trigger: dict | None = None,
):
    """Assemble and start the full control-loop query. Returns (query, sink).

    The default sink checkpoints its cooldown state NEXT TO the query's own
    checkpoint, so a restarted pipeline resumes both source offsets and
    cooldown horizon together."""
    sink = sink or CooldownSink(
        state_path=os.path.join(checkpoint_dir, "cooldown_state.json")
    )
    alarms = threshold_alarms(windowed_metric(read_event_stream(spark, events_path)))
    writer = (
        alarms.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    writer = writer.trigger(**(trigger or {"processingTime": "30 seconds"}))
    return writer.start(), sink


class ActionDispatchSink:
    """Dispatch-only sink for the grouped-state pipeline: receives rows that
    ALREADY passed cooldown suppression (the decision lives in Spark's
    checkpointed state store, partitioned by key across executors), so its
    only job is side-effect delivery. The collect here is of FIRES — the
    post-suppression action stream a driver must see to call an external
    autoscaling API — not of decision inputs; its size is bounded by fire
    rate, not key cardinality. Batch-id skipping keeps redelivery
    idempotent across foreachBatch replays."""

    def __init__(self, on_action: Callable[[str, int, float], None] | None = None):
        self.actions: list[tuple[str, int, float]] = []
        self.on_action = on_action
        self.committed_batch = -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.committed_batch:
            return
        for r in batch_df.orderBy("bucket_start").collect():
            self.actions.append((r["rule"], r["bucket_start"], r["avg_value"]))
            if self.on_action:
                self.on_action(r["rule"], r["bucket_start"], r["avg_value"])
        self.committed_batch = batch_id


def start_metrics_pipeline_grouped_state(
    spark: SparkSession,
    events_path: str,
    checkpoint_root: str,
    alarms_path: str | None = None,
    sink: ActionDispatchSink | None = None,
    trigger: dict | None = None,
):
    """The HIGH-KEY-CARDINALITY form of ``start_metrics_pipeline`` (r5
    VERDICT item 8): cooldown decisions move from the driver-side dict in
    ``CooldownSink`` into ``stateful.cooldown_fires``
    (``applyInPandasWithState``), whose per-key state lives in the
    checkpointed state store and shards across executors — the shape that
    scales to thousands of (cluster, rule) keys where a driver dict and
    per-batch collect() would serialize.

    Spark cannot fuse a grouped-state operator after a streaming
    aggregation in one query (measured:
    "applyInPandasWithState in append mode is not supported after
    aggregation"), so this is the canonical two-stage topology:

        stage 1: events → watermark → 300 s window avg → threshold alarms
                 → parquet alarm log (its own checkpoint)
        stage 2: alarm log stream → cooldown_fires (grouped state)
                 → dispatch sink (its own checkpoint)

    The intermediate alarm log is not overhead at scale — it is the audit
    stream every alarming system wants anyway. Returns
    (stage1_query, start_stage2, sink): stage 2 is a thunk because its
    parquet file source needs the alarm-log directory to exist, i.e. at
    least one stage-1 commit (availableNow tests: run stage 1 to
    completion, then call it; production: call it after the first
    trigger). Both queries restart-resume from their own checkpoints.
    Equivalence with the driver-dict sink is asserted in
    tests/test_streaming_pipeline.py.
    """
    from emr_with_custom_metrics_spark.streaming.stateful import cooldown_fires

    sink = sink or ActionDispatchSink()
    alarms_path = alarms_path or os.path.join(checkpoint_root, "alarm_log")
    trig = trigger or {"processingTime": "30 seconds"}

    alarms = threshold_alarms(windowed_metric(read_event_stream(spark, events_path)))
    q1 = (
        alarms.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_root, "ckpt_alarms"))
        .trigger(**trig)
        .format("parquet")
        .option("path", alarms_path)
        .start()
    )

    def start_stage2():
        alarm_stream = (
            spark.readStream.schema(
                "bucket_start long, avg_value double, rule string, scaling_adjustment int"
            )
            .parquet(alarms_path)
        )
        fires = cooldown_fires(alarm_stream.select("rule", "bucket_start", "avg_value"))
        return (
            fires.writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(checkpoint_root, "ckpt_fires"))
            .trigger(**trig)
            .foreachBatch(sink)
            .start()
        )

    return q1, start_stage2, sink
