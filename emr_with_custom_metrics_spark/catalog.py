"""Table catalog over the driver-generated parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an ``sf_dir``.

At 100 TB these would be partitioned/bucketed parquet or Iceberg tables; the
loaders keep the access path declarative (``spark.read.parquet``) so Catalyst
retains predicate pushdown, column pruning, and partition pruning on every
downstream query regardless of the physical layout behind the path.
"""

from __future__ import annotations

import os

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

    The resolved scan RELATION is memoized per (session, sf_dir, name) —
    metadata/plan caching only, the same role a table catalog plays at
    100 TB (guide §6: repeated file listing/footer reads are pure
    overhead; Iceberg/Delta solve it with manifests, a catalog with a
    relation cache). Measured locally each fresh ``spark.read.parquet``
    costs ~0.12 s of listing + footer + py4j before any computation; at
    ~350 call sites × best-of-2 this was ~15% of the whole bench. No DATA
    is cached: every action still scans parquet; DataFrames are immutable
    so sharing the relation is safe. The memo dies with the session
    object; ``SPARK_GRAFT_NO_PLAN_MEMO=1`` disables it for debugging.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if os.environ.get("SPARK_GRAFT_NO_PLAN_MEMO") == "1":
        return _read_table(spark, sf_dir, name)
    memo: dict[tuple[str, str], DataFrame] | None = getattr(
        spark, "_graft_table_plan_memo", None
    )
    if memo is None:
        memo = {}
        try:
            spark._graft_table_plan_memo = memo  # type: ignore[attr-defined]
        except AttributeError:  # exotic session proxy: skip memoization
            return _read_table(spark, sf_dir, name)
    key = (sf_dir, name)
    df = memo.get(key)
    if df is None:
        df = _read_table(spark, sf_dir, name)
        memo[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
    DuckDB oracle does (driver pre-registers identical view names).

    Always re-registers: with the relation memoized above, a
    ``createOrReplaceTempView`` is a cheap catalog update (no file
    listing, no footer read), and an earlier skip-if-registered memo
    proved unsound — the session catalog is caller-mutable (tests and
    interactive users drop temp views), so the engine must not assume a
    view it registered once is still there."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
