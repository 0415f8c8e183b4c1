"""A first-class Spark data source for the metrics-poll shape (op M1).

The reference's metrics "source" is `curl` in a cron loop (reference
scripts/custom-metrics.sh:7). Spark 4's Python DataSource API lets the
engine expose that shape as a real ``spark.read.format(...)`` source
instead of a shell pipeline:

    spark.dataSource.register(MetricsPollDataSource)
    raw = (spark.read.format("yarn_metrics")
                .option("payload_file", "/path/points.jsonl").load())
    parse_cluster_metrics(raw)          # → typed metric frame (M2/M3)

Two transports, selected by option:
* ``payload_file`` — JSONL of ``{"ts": ..., "payload": ...}`` records
  (tests, replay, backfill). Partitioned by line ranges so a large capture
  file fans out across the cluster.
* ``endpoint``     — live HTTP polling; the transport callable is the same
  deployment-injected stub as ``metrics_source.poll_once`` (no network in
  this container, so exercised only through ``payload_file`` here).

Also provides the STREAMING side (``readStream``) via a simple stream
reader that tails the payload file — offsets are byte positions, so
restarts resume exactly (checkpoint-compatible).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = "poll_ts timestamp, payload string"


def _parse_line(line: str):
    rec = json.loads(line)
    ts = datetime.fromisoformat(rec["ts"])
    return (ts, rec["payload"] if isinstance(rec["payload"], str) else json.dumps(rec["payload"]))


class _RangePartition(InputPartition):
    def __init__(self, path: str, start_line: int, end_line: int):
        self.path = path
        self.start_line = start_line
        self.end_line = end_line


class MetricsPollReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("payload_file")
        if not self.path:
            raise NotImplementedError(
                "live 'endpoint' transport is deployment-specific; "
                "use option('payload_file', ...) for captured/replayed payloads"
            )
        self.lines_per_partition = int(options.get("lines_per_partition", "1000"))

    def partitions(self):
        with open(self.path) as f:
            n = sum(1 for _ in f)
        step = self.lines_per_partition
        return [
            _RangePartition(self.path, i, min(i + step, n)) for i in range(0, max(n, 1), step)
        ]

    def read(self, partition: _RangePartition):
        with open(partition.path) as f:
            for i, line in enumerate(f):
                if partition.start_line <= i < partition.end_line and line.strip():
                    yield _parse_line(line)


class MetricsPollStreamReader(SimpleDataSourceStreamReader):
    """Tail the payload file: each micro-batch reads lines appended since
    the last byte offset — the in-engine analogue of the 30 s cron poll
    (op M6), with exact-resume offsets."""

    def __init__(self, options: dict):
        self.path = options["payload_file"]

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        # Binary mode throughout: offsets are BYTES, and every consumed
        # line — including blanks — advances pos, so the committed offset
        # always equals the true file position. A trailing line without
        # its newline is a partial in-flight append: stop before it and
        # let the next micro-batch pick it up whole. (Text-mode len() vs
        # seek() mixes characters with bytes and misaligns on non-ASCII.)
        pos = start["pos"]
        rows = []
        size = os.path.getsize(self.path)
        if size > pos:
            with open(self.path, "rb") as f:
                f.seek(pos)
                for raw in f:
                    if not raw.endswith(b"\n"):
                        break
                    pos += len(raw)
                    if raw.strip():
                        rows.append(_parse_line(raw.decode("utf-8")))
        return iter(rows), {"pos": pos}

    def readBetweenOffsets(self, start: dict, end: dict):
        with open(self.path, "rb") as f:
            f.seek(start["pos"])
            chunk = f.read(end["pos"] - start["pos"])
        return iter(
            _parse_line(ln.decode("utf-8")) for ln in chunk.splitlines() if ln.strip()
        )


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class MetricPointsWriter(DataSourceWriter):
    """M5 as a real write format: each task writes its partition to a
    private temp JSONL; commit() atomically renames the complete set into
    place (two-phase: failed/speculative tasks leave only uncommitted temp
    files — the standard job-commit protocol in miniature).

    Commit semantics: commits are named ``part-<commit_id>-<i>.jsonl`` so
    successive appends never collide; ``mode("overwrite")`` clears prior
    part files inside commit() — readers either see the old complete set
    or the new one plus-or-minus the brief rename window. NOTE: rename-
    based commit assumes driver and executors share a filesystem (true in
    local mode and on NFS-style mounts; on a real cluster this format
    would commit via the driver collecting part payloads or an object-
    store multipart protocol)."""

    def __init__(self, options: dict, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import uuid

        part = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                rec = row.asDict()
                rec["ts"] = rec["ts"].isoformat() if rec.get("ts") is not None else None
                if "dimensions" in rec and rec["dimensions"] is not None:
                    rec["dimensions"] = dict(rec["dimensions"])
                f.write(json.dumps(rec) + "\n")
                n += 1
        return _PartFile(part, n)

    def commit(self, messages):
        import glob
        import uuid

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
        commit_id = uuid.uuid4().hex[:8]
        for i, m in enumerate(messages):
            os.replace(
                m.path, os.path.join(self.path, f"part-{commit_id}-{i:05d}.jsonl")
            )

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class MetricPointsDataSource(DataSource):
    """``df.write.format("metric_points").option("path", dir).save()`` —
    the gauge-point sink (op M5) as a first-class format with a two-phase
    commit, replacing the reference's one-shot AWS CLI call."""

    @classmethod
    def name(cls) -> str:
        return "metric_points"

    def writer(self, schema, overwrite: bool) -> MetricPointsWriter:
        return MetricPointsWriter(self.options, overwrite)


class MetricsPollDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "yarn_metrics"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> MetricsPollReader:
        return MetricsPollReader(self.options)

    def simpleStreamReader(self, schema) -> MetricsPollStreamReader:
        return MetricsPollStreamReader(self.options)
