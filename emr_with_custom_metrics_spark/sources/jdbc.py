"""JDBC connector surface (SURVEY.md §2A.1 "other connectors", optional).

Spark's built-in JDBC source does the heavy lifting; these helpers encode
the SCALE discipline around it — a naive ``spark.read.jdbc(url, table)``
is a single-connection full-table pull through one executor, which is the
#1 way to turn a 1000-executor cluster into one busy JDBC socket:

* PARALLEL reads require an explicit partitioning scheme: a numeric/date
  ``partitionColumn`` with bounds (``read_partitioned``) or hand-written
  mutually-exclusive ``predicates`` (``read_by_predicates``) — one DB
  query per partition, all executors pulling concurrently.
* ``fetchsize`` defaults low on most drivers (10 for Oracle!); thousands
  of row round-trips dominate otherwise.
* Filter/column pushdown works through the source (Catalyst pushes
  predicates into the generated WHERE clause) — project/filter BEFORE
  any action, as with parquet.
* Writes batch via ``batchsize`` and must bound ``numPartitions``: every
  write partition is a live connection; 2000 tasks = 2000 connections =
  a down database.

No JDBC driver jar ships in this container, so tests exercise the wiring
up to the driver-class boundary and skip past it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    fetchsize: int = 10_000,
    driver: str | None = None,
    **properties: str,
) -> DataFrame:
    """Range-partitioned parallel JDBC scan: Spark issues one query per
    stride of ``partition_column`` ∈ [lower_bound, upper_bound). Bounds
    only steer the split points — rows outside still arrive (in the edge
    partitions), so correctness never depends on them being tight."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetchsize))
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def read_by_predicates(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str],
    fetchsize: int = 10_000,
    driver: str | None = None,
    **properties: str,
) -> DataFrame:
    """Predicate-partitioned parallel scan for non-numeric split keys:
    each WHERE-clause string becomes one partition's query. The caller
    owns mutual exclusivity and completeness — overlapping predicates
    DUPLICATE rows, gaps DROP them."""
    props = {"fetchsize": str(fetchsize), **properties}
    if driver:
        props["driver"] = driver
    return spark.read.jdbc(url, table, predicates=predicates, properties=props)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    max_connections: int = 16,
    driver: str | None = None,
    **properties: str,
) -> None:
    """Batched JDBC write with a connection ceiling: the frame is coalesced
    to ``max_connections`` partitions first — write parallelism IS the
    connection count, and databases fall over long before Spark does."""
    writer = (
        df.coalesce(max_connections)
        .write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
