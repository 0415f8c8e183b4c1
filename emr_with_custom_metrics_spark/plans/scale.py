"""Scale-hardening utilities (SURVEY.md §7 M4): bucketing, salting,
range-partitioned writes.

These are the knobs a 100 TB deployment turns when the default planner
shapes aren't enough: co-locating repeated join keys via bucketed layout
(shuffle paid once at write time, never again), breaking skewed keys with
salt (when AQE's skew splitting can't help, e.g. skewed BUILD side of a
broadcast-ineligible join), and range-partitioned sorted writes for
clustered scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], num_buckets: int = 16
) -> None:
    """Persist as a bucketed, per-bucket-sorted parquet table. Joins and
    aggregations on ``bucket_cols`` between tables bucketed the same way
    run WITHOUT a shuffle (plan shows no Exchange)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def salt_column(salt: int, *seed_cols: str | Column) -> Column:
    """Deterministic salt in [0, salt): hash of the row's own columns —
    reproducible across runs, unlike rand()."""
    return F.pmod(F.xxhash64(*seed_cols), F.lit(salt)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    skewed_seed_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: the skewed side gets a deterministic salt from
    its own non-key columns; the other side replicates each row to all
    ``salt`` partitions. The hot key's rows spread over ``salt`` tasks
    instead of one straggler.

    Prefer AQE's skew-join splitting when it applies (sort-merge joins);
    this helper covers the cases it doesn't — e.g. HAVING to shuffle-hash,
    or pre-aggregating a skewed key.
    """
    seed = skewed_seed_cols or [c for c in skewed.columns if c != key]
    left = skewed.withColumn("_salt", salt_column(salt, *seed))
    # generators can't nest inside other expressions — explode bare
    right = other.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = left.join(right, [key, "_salt"], how)
    return out.drop("_salt")


def upsert_parquet(
    spark, path: str, updates: "DataFrame", key: str
) -> None:
    """MERGE-by-rewrite for plain parquet: existing rows whose key appears
    in ``updates`` are replaced; new keys append. (Format-level engines —
    Delta/Iceberg — do this transactionally; on bare parquet the rewrite is
    the portable fallback. Read fully materializes before the overwrite so
    the source is never read-while-truncated.)"""
    from pyspark.sql import functions as SF

    current = spark.read.parquet(path)
    keep = current.join(updates.select(key).distinct(), key, "left_anti")
    merged = keep.unionByName(updates).persist()
    merged.count()  # materialize BEFORE overwriting the input path
    merged.write.mode("overwrite").parquet(path)
    merged.unpersist()


def write_range_partitioned(
    df: DataFrame, path: str, range_cols: list[str], num_partitions: int
) -> None:
    """Range-repartition + in-partition sort before writing: produces
    value-clustered parquet files so range predicates prune whole files via
    min/max statistics — the sorted-layout complement to partitionBy."""
    (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in range_cols])
        .sortWithinPartitions(*range_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(x: str, y: str, bits: int = 21) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns —
    pure JVM expression (SQL aggregate over a bit sequence; the SQL form
    of shiftleft accepts expression shift amounts, unlike the Python API).

    Sorting by this value clusters BOTH dimensions at once, so parquet
    min/max footer stats prune files for predicates on EITHER column —
    the multi-column complement to a single-column sort. 21 bits per
    dimension fills a 42-bit z-value (safe in a BIGINT)."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" + shiftleft(cast(shiftright(cast({x} as bigint), i) % 2 as bigint), 2 * i)"
        f" + shiftleft(cast(shiftright(cast({y} as bigint), i) % 2 as bigint), 2 * i + 1))"
    )


def zorder_write(
    df: DataFrame, path: str, col_x: str, col_y: str, num_partitions: int,
    norm_bits: int = 12,
) -> None:
    """Range-partition + sort by the Morton value of (col_x, col_y), then
    write: every file covers a compact rectangle in (x, y) space, so
    min/max file skipping works for selective predicates on either
    column. The layout pattern behind Delta/Iceberg OPTIMIZE ZORDER,
    expressed with stock Spark operators.

    Both columns are min/max-normalized to ``norm_bits``-wide integers
    first — raw interleaving of unequal-width domains degenerates to a
    single-column sort (the wide column owns every high z-bit; measured:
    zero clustering on the narrow column). The 1-row min/max aggregate
    re-attaches via broadcast cross join, not a driver collect. At scale,
    swap the exact min/max for approx quantile bounds to resist
    outliers; the layout contract is identical."""
    bounds = df.agg(
        F.min(col_x).cast("double").alias("__xmin"),
        F.max(col_x).cast("double").alias("__xmax"),
        F.min(col_y).cast("double").alias("__ymin"),
        F.max(col_y).cast("double").alias("__ymax"),
    )
    width = float((1 << norm_bits) - 1)

    def norm(c: str, lo: str, hi: str) -> Column:
        rng = F.greatest(F.col(hi) - F.col(lo), F.lit(1.0))
        return F.floor((F.col(c) - F.col(lo)) / rng * width).cast("bigint")

    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__xn", norm(col_x, "__xmin", "__xmax"))
        .withColumn("__yn", norm(col_y, "__ymin", "__ymax"))
        .withColumn("__z", zorder_value("__xn", "__yn", bits=norm_bits))
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", "__xn", "__yn", "__xmin", "__xmax", "__ymin", "__ymax")
        .write.mode("overwrite")
        .parquet(path)
    )
