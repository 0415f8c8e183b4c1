"""Structured Streaming control loop: file-source micro-batches over the
events table through window→threshold→cooldown, checked against the batch
formulation (Spark's batch/stream unification makes them comparable)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.streaming import metrics as bm
from emr_with_custom_metrics_spark.streaming.pipeline import (
    CooldownSink,
    start_metrics_pipeline,
)
from tests.conftest import SF_SMOKE_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark):
    """Split sf0.001 events into 4 files so the file source produces
    multiple micro-batches (maxFilesPerTrigger=1)."""
    out = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, SF_SMOKE_DIR, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_stream_matches_batch_alarms(spark, events_stream_dir):
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    sink = CooldownSink()
    query, sink = start_metrics_pipeline(
        spark,
        events_stream_dir,
        ckpt,
        sink=sink,
        trigger={"availableNow": True},
    )
    assert query.awaitTermination(420), "stream did not finish (timeout is silent)"

    # Batch ground truth over the SAME files (watermark in availableNow mode
    # finalizes all windows, so totals must line up exactly).
    ev = spark.read.parquet(events_stream_dir)
    m = bm.alarm_windows(ev)
    batch_alarms = (
        m.where(
            (F.col("avg_value") <= bm.SCALE_OUT_THRESHOLD)
            | (F.col("avg_value") > bm.SCALE_IN_THRESHOLD)
        )
        .count()
    )
    # Streaming saw every alarm bucket; cooldown only suppresses repeats.
    total_seen = len(sink.actions)
    assert 0 < total_seen <= batch_alarms
    # Cooldown invariant: consecutive fires of the same rule ≥ 300 s apart.
    by_rule: dict[str, list[int]] = {}
    for rule, bucket, _ in sink.actions:
        by_rule.setdefault(rule, []).append(bucket)
    for rule, buckets in by_rule.items():
        for a, b in zip(buckets, buckets[1:]):
            assert b - a > bm.COOLDOWN_SECONDS, f"{rule}: fired {a} then {b}"


@pytest.fixture(scope="module")
def ordered_events_dir(spark):
    """Events split into 4 files by TIME QUARTILE, written in order — the
    shape a real stream arrives in. (Random splits would make every later
    batch almost entirely late wrt the watermark: correct-but-empty.)"""
    import os
    import shutil

    out = tempfile.mkdtemp(prefix="events_ordered_")
    ev = load_table(spark, SF_SMOKE_DIR, "events").orderBy("ts").cache()
    rows = ev.count()
    per = rows // 4 + 1
    from pyspark.sql import Window
    from pyspark.sql import functions as SF

    w = Window.orderBy("ts")
    sliced = ev.withColumn("_slice", ((SF.row_number().over(w) - 1) / per).cast("int"))
    for i in range(4):
        tmp = tempfile.mkdtemp(prefix=f"slice{i}_")
        sliced.where(SF.col("_slice") == i).drop("_slice").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(out, f"{i:03d}.parquet"))
    ev.unpersist()
    return out


def test_streaming_session_windows_match_batch(spark, ordered_events_dir):
    """Session windows through Structured Streaming (watermark + availableNow)
    produce exactly the batch session_window result — Spark's batch/stream
    unification, observed rather than assumed."""
    from pyspark.sql import functions as SF

    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(ordered_events_dir)
    )
    sessioned = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(SF.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(SF.count("*").alias("n_events"))
        .select(
            "user_id", SF.unix_timestamp("w.start").alias("session_start"), "n_events"
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_sess_")
    q = (
        sessioned.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    batch = (
        spark.read.parquet(ordered_events_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.unix_timestamp("w.start").alias("session_start"), "n_events")
        .collect()
    )
    expected = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch}
    # availableNow finalizes every window except those still inside the final
    # watermark horizon; with a 30-day spread and 1 h watermark the tail is
    # at most the last session per user
    missing = {k: v for k, v in expected.items() if k not in got}
    assert len(missing) <= len({u for u, _ in expected}), missing
    for k, v in got.items():
        assert expected.get(k) == v, (k, v, expected.get(k))


def test_watermark_drops_late_rows(spark):
    """Event-time correctness: with a 10 min watermark, a row arriving far
    behind the advanced watermark must be excluded from finalized windows
    (append mode only emits windows the watermark has closed)."""
    import time

    src = tempfile.mkdtemp(prefix="late_events_")
    ckpt = tempfile.mkdtemp(prefix="late_ckpt_")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write_batch(rows, name):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).coalesce(1).write.mode("append").parquet(src)

    from datetime import datetime

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0.replace(hour=minutes // 60, minute=minutes % 60)

    # batch 1: on-time rows advancing the watermark to 100min - 10min
    write_batch(
        [(i, at(m), 1, "click", 10.0, "{}") for i, m in enumerate([1, 2, 50, 100])],
        "b1",
    )
    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    from pyspark.sql import functions as SF

    windowed = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(SF.window("ts", "5 minutes").alias("w"))
        .agg(SF.count("*").alias("n"))
        .select(SF.unix_timestamp("w.start").alias("b"), "n")
    )
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        time.sleep(8)  # let batch 1 process, watermark → 90min
        # batch 2: a LATE row at minute 1 (89min behind watermark) + an
        # on-time row that closes more windows
        write_batch([(100, at(1), 2, "click", 10.0, "{}"), (101, at(120), 1, "click", 10.0, "{}")], "b2")
        time.sleep(10)
    finally:
        q.stop()
    out = {r["b"]: r["n"] for r in spark.sql("SELECT * FROM late_test").collect()}
    first_bucket = int(t0.timestamp()) + 0
    # the minute-1/2 window finalized with its ON-TIME count (2); the late
    # arrival at minute 1 must NOT have reopened it
    assert out.get(first_bucket) == 2, out


def test_durable_parquet_metric_sink(spark, ordered_events_dir):
    """M5 with a DURABLE sink: windowed metric stream appended to parquet
    via foreachBatch, partitioned-idempotent per micro-batch — the
    production CloudWatch-replacement shape (storage instead of API)."""
    import tempfile as tf

    from pyspark.sql import functions as SF

    from emr_with_custom_metrics_spark.streaming.pipeline import (
        EVENTS_SCHEMA,
        windowed_metric,
    )

    sink_dir = tf.mkdtemp(prefix="metric_sink_") + "/points"
    ckpt = tf.mkdtemp(prefix="ckpt_sink_")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )

    def append_batch(batch_df, batch_id):
        # idempotent per batch: partition dir keyed by batch_id — a replayed
        # batch overwrites its own partition instead of duplicating
        batch_df.withColumn("batch_id", SF.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{sink_dir}/batch_id={batch_id}")

    q = (
        windowed_metric(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(append_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    stored = spark.read.parquet(sink_dir)
    assert stored.count() > 0
    # every stored finalized window matches the batch ground truth
    truth = {
        r["bucket_start"]: (r["avg_value"], r["n_events"])
        for r in __import__("emr_with_custom_metrics_spark.streaming.metrics", fromlist=["alarm_windows"])
        .alarm_windows(spark.read.parquet(ordered_events_dir))
        .collect()
    }
    for r in stored.collect():
        exp = truth.get(r["bucket_start"])
        assert exp is not None and exp == (r["avg_value"], r["n_events"]), r


def test_stream_is_incremental(spark, events_stream_dir):
    """The file source must deliver multiple micro-batches — i.e. the
    pipeline is actually incremental, not a disguised batch job."""
    ckpt = tempfile.mkdtemp(prefix="ckpt2_")
    batches: list[int] = []

    class CountingSink(CooldownSink):
        def __call__(self, batch_df, batch_id):
            batches.append(batch_id)
            super().__call__(batch_df, batch_id)

    query, _ = start_metrics_pipeline(
        spark, events_stream_dir, ckpt, sink=CountingSink(), trigger={"availableNow": True}
    )
    assert query.awaitTermination(420), "stream did not finish (timeout is silent)"
    assert len(batches) >= 2


def test_cooldown_sink_state_survives_restart(spark, events_stream_dir):
    """Durable cooldown (ADVICE r01): a sink rebuilt from its state file (a
    simulated driver restart) must (a) skip replayed batches outright and
    (b) keep honoring the cooldown horizon for new buckets."""
    import json as _json
    import os as _os

    ckpt = tempfile.mkdtemp(prefix="ckpt_durable_")
    query, sink = start_metrics_pipeline(
        spark, events_stream_dir, ckpt, trigger={"availableNow": True}
    )
    assert query.awaitTermination(420), "stream did not finish (timeout is silent)"
    state_path = _os.path.join(ckpt, "cooldown_state.json")
    assert _os.path.exists(state_path)
    st = _json.load(open(state_path))
    assert st["last_fire"] == sink.last_fire and st["batch_id"] == sink.committed_batch

    # "Restart": a fresh sink loads the durable state...
    sink2 = CooldownSink(state_path=state_path)
    assert sink2.last_fire == sink.last_fire
    # ...a replayed (already-committed) batch is a no-op...
    replay = spark.createDataFrame(
        [(max(sink.last_fire.values()), 10.0, "scale-out", 5)],
        "bucket_start long, avg_value double, rule string, scaling_adjustment int",
    )
    sink2(replay, sink.committed_batch)
    assert sink2.actions == []
    # ...and a NEW batch inside the cooldown horizon stays suppressed,
    # while one beyond it fires.
    rule, last = max(sink.last_fire.items(), key=lambda kv: kv[1])
    inside = spark.createDataFrame(
        [(last + 60, 10.0, rule, 5)],
        "bucket_start long, avg_value double, rule string, scaling_adjustment int",
    )
    sink2(inside, sink.committed_batch + 1)
    assert sink2.actions == []
    beyond = spark.createDataFrame(
        [(last + bm.COOLDOWN_SECONDS + 60, 10.0, rule, 5)],
        "bucket_start long, avg_value double, rule string, scaling_adjustment int",
    )
    sink2(beyond, sink.committed_batch + 2)
    assert [a[1] for a in sink2.actions] == [last + bm.COOLDOWN_SECONDS + 60]


def test_stream_stream_join_matches_batch(spark, ordered_events_dir):
    """Stream-stream inner join with watermarks on both sides and a time-
    range condition (click→purchase within 10 min) over time-ordered
    micro-batches (random splits would make later batches late-data wrt
    the watermark — correct-but-empty): availableNow finalizes all state,
    so the result must equal the batch formulation exactly."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        return clicks, purchases

    def join(clicks, purchases):
        return clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        ).select("c_user", "c_id", "p_id")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )
    s_clicks, s_purchases = split(stream)
    out = join(
        s_clicks.withWatermark("c_ts", "30 minutes"),
        s_purchases.withWatermark("p_ts", "30 minutes"),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", tf.mkdtemp(prefix="ckpt_ssj_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    got = {
        (r["c_user"], r["c_id"], r["p_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    b_clicks, b_purchases = split(spark.read.parquet(ordered_events_dir))
    want = {
        (r["c_user"], r["c_id"], r["p_id"]) for r in join(b_clicks, b_purchases).collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_enrichment_matches_batch(spark, events_stream_dir):
    """Stream-static join: the event stream enriches against two static
    dims (broadcast, no watermark needed) and aggregates; with
    availableNow + complete mode the final result must equal the batch
    formulation of the same plan."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.catalog import load_table
    from emr_with_custom_metrics_spark.streaming.metrics import enrich_with_dims
    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA

    customer = load_table(spark, SF_SMOKE_DIR, "customer")
    nation = load_table(spark, SF_SMOKE_DIR, "nation")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    q = (
        enrich_with_dims(stream, customer, nation)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", tf.mkdtemp(prefix="ckpt_enrich_"))
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout WITHOUT raising —
    # under a loaded machine a silent timeout reads a half-finished sink
    # and fails the equality check confusingly (observed once in a full
    # contended suite run). Fail loudly instead.
    assert q.awaitTermination(420), "stream-static enrichment did not finish"
    got = {
        (r["n_name"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_stream_dir)
    want = {
        (r["n_name"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in enrich_with_dims(batch, customer, nation).collect()
    }
    # Counts must be exact; the averages cross DIFFERENT fp summation
    # orders (incremental per-file state vs one whole-input sum), so the
    # shared plan's ROUND(avg, 4) can legitimately flip a half-ULP
    # boundary case — compare within one ulp of the rounding grain
    # instead of set-equality (observed: 38.7262 vs 38.7263).
    assert set(got) == set(want) and len(want) > 0
    for key, (n, avg) in got.items():
        wn, wavg = want[key]
        assert n == wn, (key, n, wn)
        assert abs(avg - wavg) <= 1.01e-4, (key, avg, wavg)


def test_streaming_windowed_topk(spark, events_stream_dir):
    """Per-window top-k in streaming: append-mode windows cannot rank, so
    the streaming form emits watermarked (window, type) counts and ranks
    inside foreachBatch after availableNow finalizes every window — the
    result must equal the batch windowed_topk."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.metrics import windowed_topk
    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA
    from pyspark.sql import Window as W

    collected = []

    def rank_batch(bdf, batch_id):
        ranked = bdf.select(
            "bucket_start",
            "event_type",
            "n",
            F.row_number()
            .over(W.partitionBy("bucket_start").orderBy(F.col("n").desc(), "event_type"))
            .alias("rnk"),
        ).where(F.col("rnk") <= 3)
        collected.extend(
            (r["bucket_start"], r["event_type"], r["n"], r["rnk"])
            for r in ranked.collect()
        )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    counts = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("bucket_start"), "event_type", "n")
    )
    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(rank_batch)
        .option("checkpointLocation", tf.mkdtemp(prefix="ckpt_topk_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"

    # keep only the final batch's rows: complete mode re-emits everything,
    # so the last invocation holds the finalized ranking
    batch = spark.read.schema(EVENTS_SCHEMA).parquet(events_stream_dir)
    want = {
        (r["bucket_start"], r["event_type"], r["n"], r["rnk"])
        for r in windowed_topk(batch).collect()
    }
    got = set(collected)
    assert want <= got and len(want) > 0


def test_grouped_state_pipeline_matches_driver_sink(spark, events_stream_dir):
    """The two-stage grouped-state wiring (cooldown in the checkpointed
    state store, r5 VERDICT item 8) must fire exactly the same
    (rule, bucket) set as the driver-dict CooldownSink on the same files."""
    from emr_with_custom_metrics_spark.streaming.pipeline import (
        ActionDispatchSink,
        start_metrics_pipeline_grouped_state,
    )

    # Ground truth: the driver-dict sink.
    ckpt_ref = tempfile.mkdtemp(prefix="ckpt_ref_")
    q_ref, sink_ref = start_metrics_pipeline(
        spark, events_stream_dir, ckpt_ref, trigger={"availableNow": True}
    )
    assert q_ref.awaitTermination(420), "reference stream did not finish"

    root = tempfile.mkdtemp(prefix="ckpt_grouped_")
    q1, start_stage2, sink = start_metrics_pipeline_grouped_state(
        spark, events_stream_dir, root, trigger={"availableNow": True}
    )
    assert q1.awaitTermination(420), "alarm stage did not finish"
    q2 = start_stage2()
    assert q2.awaitTermination(420), "cooldown stage did not finish"

    got = {(r, b) for r, b, _ in sink.actions}
    want = {(r, b) for r, b, _ in sink_ref.actions}
    assert got == want and len(got) > 0
    # replayed foreachBatch delivery is idempotent
    import pandas as pd  # noqa: F401

    before = list(sink.actions)
    replay = spark.createDataFrame(
        [("scale-out", 0, 10.0)], "rule string, bucket_start long, avg_value double"
    )
    sink(replay, sink.committed_batch)
    assert sink.actions == before


def test_statestore_reader_inspects_checkpoint(spark, events_stream_dir):
    """Spark 4's state data source: streaming state is INSPECTABLE offline
    (spark.read.format('statestore') over the checkpoint) — the ops
    tool for debugging a stuck 100 TB stateful job without replaying it.
    The per-key counts recovered from the state store must equal the
    batch ground truth over the same files."""
    ckpt = tempfile.mkdtemp(prefix="ckpt_ssread_")
    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir)
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("ssread_totals")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish"

    meta = spark.read.format("state-metadata").load(ckpt)
    ops = {r["operatorName"] for r in meta.collect()}
    assert "stateStoreSave" in ops, ops

    state = spark.read.format("statestore").load(ckpt)
    # value struct's single field is the count aggregate; address it
    # positionally — its name is plan-generated ("count(1)") and not a
    # stable contract
    got = {r["key"]["event_type"]: r["value"][0] for r in state.collect()}
    truth = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(events_stream_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == truth


def test_chained_stateful_aggregations_match_batch(spark, ordered_events_dir):
    """Multiple stateful operators in ONE streaming query (Spark 3.5+):
    10-min counts re-aggregated into 30-min maxima. Watermark propagation
    only works by passing the WINDOW STRUCT into the next window() call —
    re-asserting withWatermark on a derived timestamp silently resets
    tracking and emits nothing (measured while building this). Emitted
    rows must equal the batch two-level aggregation restricted to windows
    the final watermark closed."""
    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )
    s1 = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "10 minutes").alias("w1"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    s2 = s1.groupBy(F.window(F.col("w1"), "30 minutes").alias("w2"), "event_type").agg(
        F.max("n").alias("max_n")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_chain_")
    q = (
        s2.writeStream.outputMode("append")
        .format("memory")
        .queryName("chained_aggs")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish"
    got = {
        (r["w2"]["start"], r["event_type"]): r["max_n"]
        for r in spark.sql("SELECT * FROM chained_aggs").collect()
    }

    ev = spark.read.parquet(ordered_events_dir)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w1"), "event_type")
        .agg(F.count("*").alias("n"))
        .groupBy(F.window(F.col("w1"), "30 minutes").alias("w2"), "event_type")
        .agg(F.max("n").alias("max_n"))
        .where(F.col("w2.end") <= F.lit(max_ts))
    )
    want = {
        (r["w2"]["start"], r["event_type"]): r["max_n"] for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_streaming_foreachbatch_cdc_merge_matches_batch(spark, tmp_path):
    """Streaming CDC: change batches (upserts + tombstone deletes) arrive
    as a file stream one file per micro-batch; foreachBatch applies each
    through the ParquetRewriteTarget MERGE. The final state table must
    equal applying the union of all changes at once with last-writer-wins
    per key — i.e. incremental maintenance converges to the batch answer
    (order matters: a later batch re-inserts a key an earlier batch
    deleted, and a later update overwrites an earlier one)."""
    import time

    from pyspark.sql import functions as F

    from emr_with_custom_metrics_spark.plans.merge import ParquetRewriteTarget

    state_dir = str(tmp_path / "state")
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    base = spark.createDataFrame(
        [(k, f"name{k}", float(k)) for k in range(10)], "k long, name string, bal double"
    )
    base.write.mode("overwrite").parquet(state_dir)

    schema = "k long, op string, bal double"
    batches = [
        [(1, "U", 100.0), (2, "D", None), (11, "I", 11.0)],
        [(2, "I", 222.0), (1, "U", 111.0), (3, "D", None)],
        [(11, "U", 999.0), (4, "D", None), (12, "I", 12.0)],
    ]
    # Write ordered files; zero-pad so the file stream picks them up in
    # lexicographic (= batch) order with maxFilesPerTrigger=1.
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(changes_dir / f"b{i:03d}"))

    target = ParquetRewriteTarget(spark, state_dir)

    def apply_batch(df, _bid):
        changes = df.cache()
        dels = changes.where(F.col("op") == "D").select("k")
        ups = changes.where(F.col("op") != "D").select(
            "k", F.concat(F.lit("name"), F.col("k")).alias("name"), "bal"
        )
        keys = changes.select("k").distinct()
        kept = target.read().join(keys, "k", "left_anti")
        merged = kept.unionByName(ups.join(dels, "k", "left_anti"))
        merged.persist().count()
        merged.write.mode("overwrite").parquet(state_dir)
        merged.unpersist()
        changes.unpersist()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(changes_dir))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.2)

    got = {
        r["k"]: (r["name"], r["bal"])
        for r in spark.read.parquet(state_dir).collect()
    }
    # batch ground truth: fold the batches in order
    want = {k: (f"name{k}", float(k)) for k in range(10)}
    for rows in batches:
        for k, op, bal in rows:
            if op == "D":
                want.pop(k, None)
            else:
                want[k] = (f"name{k}", bal)
    assert got == want, (sorted(got.items()), sorted(want.items()))


def test_stream_stream_interval_join_matches_batch(spark, ordered_events_dir):
    """The view_purchase_pairs builder runs as a REAL two-stream join
    (both sides readStream, watermarked, time-range state bound) and its
    availableNow output equals the batch inner join exactly — inner
    stream-stream joins emit rows as matches arrive, so nothing is
    withheld at end-of-input."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.metrics import view_purchase_pairs

    schema = spark.read.parquet(ordered_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )
    out_dir = tf.mkdtemp(prefix="ssj_out_")
    ckpt = tf.mkdtemp(prefix="ssj_ckpt_")
    q = (
        view_purchase_pairs(stream, "inner")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream-stream join did not finish"

    got = {
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("user_id", "view_id", "purchase_id", "delay_s")
        .collect()
    }
    batch = {
        tuple(r)
        for r in view_purchase_pairs(spark.read.parquet(ordered_events_dir), "inner")
        .collect()
    }
    assert got == batch
    assert len(got) > 0


def test_stream_stream_outer_join_finalized_subset(spark, ordered_events_dir):
    """LEFT OUTER stream-stream join semantics: matched rows equal the
    batch join's matched rows; null-padded rows appear only for views
    whose join window closed under the final watermark — a SUBSET of the
    batch unmatched set, never an extra or a contradiction."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.metrics import view_purchase_pairs

    schema = spark.read.parquet(ordered_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )
    out_dir = tf.mkdtemp(prefix="ssjo_out_")
    ckpt = tf.mkdtemp(prefix="ssjo_ckpt_")
    q = (
        view_purchase_pairs(stream, "leftOuter")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "outer stream-stream join did not finish"

    got = spark.read.parquet(out_dir)
    batch = view_purchase_pairs(spark.read.parquet(ordered_events_dir), "leftOuter")
    got_matched = {
        tuple(r) for r in got.where(F.col("purchase_id").isNotNull()).collect()
    }
    batch_matched = {
        tuple(r) for r in batch.where(F.col("purchase_id").isNotNull()).collect()
    }
    assert got_matched == batch_matched
    got_null_views = {
        r["view_id"] for r in got.where(F.col("purchase_id").isNull()).collect()
    }
    batch_null_views = {
        r["view_id"] for r in batch.where(F.col("purchase_id").isNull()).collect()
    }
    assert got_null_views <= batch_null_views
