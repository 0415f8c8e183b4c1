"""SparkSession factory with 100 TB-posture defaults.

The reference hands physical execution entirely to Spark (SURVEY.md §4.1:
"There is no parser, planner, optimizer, or custom execution code in the
repo"); we do the same but turn on every runtime re-planning feature Spark
offers so the identical declarative plans survive a 1000-executor cluster:

* AQE (coalesce post-shuffle partitions, skew-join splitting, dynamic join
  selection) — replaces hand-tuned ``repartition(n)`` calls like the
  reference's ``repartition(10)`` (reference scripts/spark_converter.py:31).
* Arrow execution for every pandas-UDF boundary (the only Python hot paths
  we allow — SURVEY.md §7).
* UTC session timezone so event-time bucketing hash-matches the DuckDB
  oracle regardless of host tz.

Local test shape (driver contract): ``local[$SPARK_GRAFT_CPUS]`` with 32
shuffle partitions; on a real cluster AQE coalesces from the configured
initial partition count, so the same code runs unmodified.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a cluster these are
# overridden by spark-submit conf. AQE makes the shuffle-partition number a
# ceiling, not a fixed cost: small stages coalesce down automatically.
_SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast anything under 64 MB: region/nation/supplier/part-style dims
    # stay broadcast even at 100 TB fact scale.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: vectorized reader + pushdown are Spark defaults; pin
    # them explicitly so a misconfigured cluster can't silently regress.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # 128 MB input splits — the right granularity for 100 TB of parquet.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects; read the raw int64 and convert (catalog.load_table) — DuckDB
    # likewise truncates ns → µs, keeping the oracle comparable.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "emr-with-custom-metrics-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``; pass an explicit master / leave unset under spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_SCALE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable scale conf to a session we didn't build.

    The driver passes us its own SparkSession for ``entry``/``queries``;
    static conf (memory, master) can't change post-start, but the SQL conf
    that controls planning still can.
    """
    for k, v in _SCALE_CONF.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # immutable in this deployment; keep going
    return spark
