"""The reference's metrics source & sink (ops M1/M2/M5), in-engine.

Reference shape (SURVEY.md §3 EP2): every 30 s, curl the YARN RM REST
endpoint (M1, reference scripts/custom-metrics.sh:7), jq two counters out of
``clusterMetrics`` (M2, :10-11), compute the percentage (M3, :12), and push
one gauge point to CloudWatch (M5, :14).

In-engine decomposition:

* TRANSPORT (HTTP poll / metric publish) is environment-specific and
  network-bound — isolated behind tiny injectable seams (`poll_once(fetch=)`,
  `poll_series`, `MetricPointSink.publish`). The default fetch is a plain
  stdlib HTTP GET (all the YARN RM REST API needs); deployments swap in a
  client with auth/retries, and tests inject JSON fixtures (the container
  has no network).
* DATAFLOW (parse → project → derive → window → alarm) is the engine's job
  and is pure DataFrame logic, shared verbatim between a batch DataFrame
  and a Structured Streaming source.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# YARN /ws/v1/cluster/metrics — the subset the reference reads (M2) plus
# neighbors, typed. Public YARN REST schema.
CLUSTER_METRICS_SCHEMA = StructType(
    [
        StructField(
            "clusterMetrics",
            StructType(
                [
                    StructField("availableVirtualCores", LongType()),
                    StructField("totalVirtualCores", LongType()),
                    StructField("appsRunning", LongType()),
                    StructField("activeNodes", LongType()),
                ]
            ),
        )
    ]
)

RAW_SCHEMA = StructType(
    [StructField("poll_ts", TimestampType()), StructField("payload", StringType())]
)


FetchFn = Callable[[str], str]


def http_fetch(endpoint: str, timeout: float = 5.0) -> str:
    """Default M1 transport: one stdlib HTTP GET of the RM metrics JSON
    (the YARN RM REST API is unauthenticated plain-HTTP JSON — reference
    custom-metrics.sh:7 does the same with curl). Deployments needing
    auth/retry/TLS inject their own ``fetch`` instead; this sandbox has no
    network, so tests exercise the seam with fixture fetchers."""
    import urllib.request

    with urllib.request.urlopen(endpoint, timeout=timeout) as resp:
        return resp.read().decode("utf-8")


def poll_once(endpoint: str, fetch: FetchFn | None = None) -> str:
    """M1: one poll through the pluggable transport seam (VERDICT r01 #6 —
    a real deployment is configuration, not code)."""
    return (fetch or http_fetch)(endpoint)


def poll_series(
    spark: SparkSession,
    endpoint: str,
    n_polls: int = 1,
    interval_s: float = 30.0,
    fetch: FetchFn | None = None,
    sleep: Callable[[float], None] | None = None,
    now: Callable[[], "datetime"] | None = None,
) -> DataFrame:
    """M1+M6 capture loop in-engine: n polls, ``interval_s`` apart (the
    reference's 30 s cron cadence), returned as a RAW_SCHEMA frame ready
    for ``parse_cluster_metrics``. ``sleep``/``now`` are injectable so
    tests run instantly and deterministically."""
    import time as _time
    from datetime import datetime, timezone

    sleep = sleep or _time.sleep
    now = now or (lambda: datetime.now(timezone.utc))
    payloads: list[tuple[str, str]] = []
    for i in range(n_polls):
        if i:
            sleep(interval_s)
        payloads.append((now().isoformat(), poll_once(endpoint, fetch)))
    return payloads_to_df(spark, payloads)


def parse_cluster_metrics(raw: DataFrame) -> DataFrame:
    """M2+M3: dotted-path projection out of the JSON payload and the derived
    percentage with the reference's exact bc semantics (scale=2 TRUNCATION,
    custom-metrics.sh:12) — all JVM-side expressions."""
    parsed = raw.select(
        "poll_ts", F.from_json("payload", CLUSTER_METRICS_SCHEMA).alias("m")
    )
    avail = F.col("m.clusterMetrics.availableVirtualCores")
    total = F.col("m.clusterMetrics.totalVirtualCores")
    pct = avail.cast("double") * 100.0 / total
    return parsed.select(
        "poll_ts",
        avail.alias("available_vcores"),
        total.alias("total_vcores"),
        (F.floor(pct * 100) / 100).alias("core_available_pct"),
    )


def to_metric_points(
    derived: DataFrame, metric_name: str, unit: str, dimensions: dict[str, str]
) -> DataFrame:
    """M5 shape: (name, namespace, unit, value, dimensions map, ts) gauge
    points — the reference's put-metric-data record (custom-metrics.sh:14)
    as a typed row with a MapType dimension set (SURVEY.md §1.4)."""
    dims = F.create_map(
        *[x for k, v in dimensions.items() for x in (F.lit(k), F.lit(v))]
    )
    return derived.select(
        F.lit(metric_name).alias("metric_name"),
        F.lit("engine/metrics").alias("namespace"),
        F.lit(unit).alias("unit"),
        F.col("core_available_pct").alias("value"),
        dims.alias("dimensions"),
        F.col("poll_ts").alias("ts"),
    )


class MetricPointSink:
    """M5 sink: append-only gauge-point store with a pluggable publisher.

    Default publisher collects in-memory (tests); production overrides
    ``publish`` with a CloudWatch/StatsD client inside foreachBatch.
    """

    def __init__(self) -> None:
        self.points: list[dict] = []

    def publish(self, rows: Iterable[dict]) -> None:
        self.points.extend(rows)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.publish([r.asDict() for r in batch_df.collect()])


def payloads_to_df(
    spark: SparkSession, payloads: list[tuple[str, str]]
) -> DataFrame:
    """Test/batch entry: (iso_ts, json_payload) pairs → RAW_SCHEMA frame."""
    rows = [(p[0], p[1]) for p in payloads]
    df = spark.createDataFrame(rows, "poll_ts string, payload string")
    return df.select(F.col("poll_ts").cast("timestamp").alias("poll_ts"), "payload")


def sample_payload(available: int, total: int) -> str:
    """A YARN-shaped fixture payload (same dotted paths the reference reads)."""
    return json.dumps(
        {
            "clusterMetrics": {
                "availableVirtualCores": available,
                "totalVirtualCores": total,
                "appsRunning": 1,
                "activeNodes": 3,
            }
        }
    )
