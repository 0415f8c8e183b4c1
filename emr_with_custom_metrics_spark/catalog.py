"""Table catalog over the driver-generated parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an ``sf_dir``.

At 100 TB these would be partitioned/bucketed parquet or Iceberg tables; the
loaders keep the access path declarative (``spark.read.parquet``) so Catalyst
retains predicate pushdown, column pruning, and partition pruning on every
downstream query regardless of the physical layout behind the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor. At 100 TB
# the facts (lineitem/orders/events/documents) grow; these stay tiny.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Plain parquet scan → full pushdown/pruning.

    ``events.ts`` is TIMESTAMP(NANOS) on disk (FIXTURES.md §8), which
    Spark's reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    it arrives as int64 nanos and is truncated to a µs timestamp here —
    the same ns→µs truncation DuckDB applies, so event-time results stay
    oracle-comparable.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — float division drifts a µs at int64-nanos scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_fanned(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + round-robin repartition to cluster parallelism.

    For operators whose per-row work dwarfs the scan (shingling, vector
    math, Arrow/pandas decode), a single parquet row-group would otherwise
    pin the whole stage on one core locally. At 100 TB the input arrives in
    thousands of splits and this repartition degenerates to a cheap
    rebalance, so the query shape is scale-correct either way.
    """
    return load_table(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so ``spark.sql`` queries see the same catalog the
    DuckDB oracle does (driver pre-registers identical view names)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
