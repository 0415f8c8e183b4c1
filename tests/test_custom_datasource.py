"""The yarn_metrics Python DataSource: batch read (partitioned), streaming
tail with exact offsets, and composition with the M2/M3 parse stage."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def payload_file():
    from emr_with_custom_metrics_spark.sources.metrics_source import sample_payload

    d = tempfile.mkdtemp(prefix="poll_")
    path = os.path.join(d, "points.jsonl")
    with open(path, "w") as f:
        for i in range(250):
            rec = {
                "ts": f"2024-01-01T00:{i // 60:02d}:{i % 60:02d}",
                "payload": sample_payload(available=i % 17, total=16),
            }
            f.write(json.dumps(rec) + "\n")
    return path


def _register(spark):
    from emr_with_custom_metrics_spark.sources.custom_datasource import (
        MetricsPollDataSource,
    )

    spark.dataSource.register(MetricsPollDataSource)


def test_batch_read_partitioned(spark, payload_file):
    _register(spark)
    raw = (
        spark.read.format("yarn_metrics")
        .option("payload_file", payload_file)
        .option("lines_per_partition", "100")
        .load()
    )
    assert raw.count() == 250
    assert raw.rdd.getNumPartitions() == 3  # 250 lines / 100 per partition
    assert dict(raw.dtypes) == {"poll_ts": "timestamp", "payload": "string"}


def test_composes_with_parse_stage(spark, payload_file):
    """source → M2/M3 parse → derived pct, including bc truncation parity."""
    from emr_with_custom_metrics_spark.sources.metrics_source import (
        parse_cluster_metrics,
    )

    _register(spark)
    raw = spark.read.format("yarn_metrics").option("payload_file", payload_file).load()
    derived = parse_cluster_metrics(raw)
    row = derived.where(F.col("available_vcores") == 13).first()
    assert row["core_available_pct"] == 81.25
    assert derived.count() == 250


def test_metric_points_sink_roundtrip(spark, payload_file):
    """End-to-end M1→M2/M3→M5 through custom formats: read with
    yarn_metrics, derive, write with metric_points, read back and compare."""
    import glob

    from emr_with_custom_metrics_spark.sources.custom_datasource import (
        MetricPointsDataSource,
    )
    from emr_with_custom_metrics_spark.sources.metrics_source import (
        parse_cluster_metrics,
        to_metric_points,
    )

    _register(spark)
    spark.dataSource.register(MetricPointsDataSource)
    raw = spark.read.format("yarn_metrics").option("payload_file", payload_file).load()
    points = to_metric_points(
        parse_cluster_metrics(raw),
        "YARNCoreAvailablePercentage",
        "Percent",
        {"JobFlowId": "j-TEST"},
    )
    out = tempfile.mkdtemp(prefix="points_out_")
    points.write.format("metric_points").mode("append").option("path", out).save()
    files = glob.glob(f"{out}/part-*.jsonl")
    assert files and not glob.glob(f"{out}/_tmp-*"), "uncommitted temp files left"
    recs = [json.loads(l) for p in files for l in open(p)]
    assert len(recs) == 250
    assert all(r["metric_name"] == "YARNCoreAvailablePercentage" for r in recs[:5])
    assert recs[0]["dimensions"] == {"JobFlowId": "j-TEST"}
    assert recs[0]["unit"] == "Percent"


def test_stream_tails_appends_with_exact_offsets(spark, payload_file):
    """Streaming: process the file, append more lines, process again — the
    second batch sees ONLY the appended records."""
    import time

    from emr_with_custom_metrics_spark.sources.metrics_source import sample_payload

    _register(spark)
    ckpt = tempfile.mkdtemp(prefix="ckpt_poll_")
    stream = (
        spark.readStream.format("yarn_metrics").option("payload_file", payload_file).load()
    )
    # memory sink can't recover from a checkpoint; foreachBatch can
    seen: list[int] = []

    def run_once():
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _id: seen.append(df.count()))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(420), "stream did not finish (timeout is silent)"

    run_once()
    assert sum(seen) == 250

    with open(payload_file, "a") as f:
        for i in range(5):
            f.write(
                json.dumps(
                    {"ts": f"2024-01-02T00:00:{i:02d}", "payload": sample_payload(1, 16)}
                )
                + "\n"
            )
    seen.clear()
    run_once()  # same checkpoint → resumes at the stored byte offset
    assert sum(seen) == 5


def test_stream_offsets_exact_with_blanks_nonascii_and_partial_tail(payload_file):
    """Offset bookkeeping at the reader level (no Spark needed): blank lines
    advance the offset, payloads are byte-addressed (non-ASCII safe), and a
    trailing line without its newline is deferred to the next batch."""
    import json as _json

    from emr_with_custom_metrics_spark.sources.custom_datasource import (
        MetricsPollStreamReader,
    )

    with open(payload_file, "a", encoding="utf-8") as f:
        f.write("\n")  # blank line mid-stream
        f.write(_json.dumps({"ts": "2024-01-02T00:00:00", "payload": "düsseldorf-η"}) + "\n")
        f.write('{"ts": "2024-01-02T00:00:01", "payload": "partial')  # no newline

    r = MetricsPollStreamReader({"payload_file": payload_file})
    rows, off = r.read(r.initialOffset())
    rows = list(rows)
    # 250 originals + the non-ASCII record; the partial tail is NOT consumed
    assert len(rows) == 251
    assert rows[-1][1] == "düsseldorf-η"
    size_minus_partial = os.path.getsize(payload_file) - len('{"ts": "2024-01-02T00:00:01", "payload": "partial')
    assert off["pos"] == size_minus_partial, "offset must include blanks, exclude partial tail"

    # finish the partial line: next batch sees exactly one record
    with open(payload_file, "a", encoding="utf-8") as f:
        f.write('"}\n')
    rows2, off2 = r.read(off)
    assert [p for _, p in rows2] == ["partial"]
    assert off2["pos"] == os.path.getsize(payload_file)

    # deterministic replay between committed offsets hits the same bytes
    replay = list(r.readBetweenOffsets({"pos": 0}, off))
    assert len(replay) == 251 and replay[-1][1] == "düsseldorf-η"


def test_metric_points_overwrite_and_append_modes(spark, payload_file):
    """overwrite clears prior part files (even when the new commit has
    fewer partitions); append never collides with earlier commits."""
    import glob

    from emr_with_custom_metrics_spark.sources.custom_datasource import (
        MetricPointsDataSource,
    )
    from emr_with_custom_metrics_spark.sources.metrics_source import (
        parse_cluster_metrics,
        to_metric_points,
    )

    _register(spark)
    spark.dataSource.register(MetricPointsDataSource)
    raw = spark.read.format("yarn_metrics").option("payload_file", payload_file).load()
    points = to_metric_points(
        parse_cluster_metrics(raw), "M", "Percent", {"JobFlowId": "j-TEST"}
    )
    out = tempfile.mkdtemp(prefix="points_modes_")

    points.repartition(4).write.format("metric_points").mode("append").option("path", out).save()
    points.repartition(4).write.format("metric_points").mode("append").option("path", out).save()
    recs = [json.loads(l) for p in glob.glob(f"{out}/part-*.jsonl") for l in open(p)]
    assert len(recs) == 500, "append must accumulate, not clobber earlier commits"

    points.limit(10).repartition(1).write.format("metric_points").mode("overwrite").option("path", out).save()
    files = glob.glob(f"{out}/part-*.jsonl")
    recs = [json.loads(l) for p in files for l in open(p)]
    assert len(recs) == 10, f"overwrite left stale parts: {len(recs)} rows in {len(files)} files"
