"""Transactional-upsert interface: MERGE as a first-class engine surface.

The reference has no upsert at all; a 100 TB corpus pipeline needs one
(dedup keep-lists, incremental signature tables, metric rollups). Formats
with a transaction log (Delta/Iceberg) give MERGE natively; bare parquet
can only approximate it by rewrite. This module makes that a pluggable
INTERFACE so pipeline code writes ``target.merge(updates, key)`` once and
the deployment picks the implementation:

* :class:`ParquetRewriteTarget` — portable fallback, full rewrite
  (materialize-before-overwrite guard). Correct anywhere; O(table) per
  merge — fine for small dimension tables, wrong for fact tables.
* :class:`PartitionedParquetTarget` — the bare-parquet scale path:
  hive-partitioned layout + Spark's dynamic partition overwrite, so a
  merge rewrites ONLY the partitions containing updated keys. Work is
  O(touched partitions), not O(table) — the right shape when updates
  cluster by date/tenant (the common case).
* :class:`DeltaTarget` — format-level transactional MERGE via the
  delta-spark package, gated behind an import-try: this container doesn't
  ship it, so construction raises with instructions; the class documents
  the intended production path (SURVEY.md §2A.1 "transactional upsert").

All implementations share MERGE semantics: rows whose ``key`` appears in
``updates`` are replaced, unseen keys are appended, and a merge of the
same batch twice is idempotent.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MergeTarget(ABC):
    """A mutable table that supports keyed upsert (MERGE) semantics."""

    @abstractmethod
    def read(self) -> DataFrame:
        """Current table contents."""

    @abstractmethod
    def merge(self, updates: DataFrame, key: str) -> None:
        """Upsert: replace rows matching ``key`` in ``updates``, append the
        rest. Idempotent for a fixed ``updates`` batch."""

    @abstractmethod
    def delete_where(self, condition) -> None:
        """Remove rows satisfying ``condition`` (a Column predicate)."""


class ParquetRewriteTarget(MergeTarget):
    """MERGE-by-rewrite on a plain parquet directory (the portable
    fallback; see plans/scale.upsert_parquet for the free-function form).
    The merged frame is fully materialized BEFORE the overwrite so the
    source is never read-while-truncated."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def merge(self, updates: DataFrame, key: str) -> None:
        keep = self.read().join(updates.select(key).distinct(), key, "left_anti")
        merged = keep.unionByName(updates).persist()
        try:
            merged.count()  # materialize before overwriting the input path
            merged.write.mode("overwrite").parquet(self.path)
        finally:
            merged.unpersist()

    def delete_where(self, condition) -> None:
        remaining = self.read().where(~condition).persist()
        try:
            remaining.count()
            remaining.write.mode("overwrite").parquet(self.path)
        finally:
            remaining.unpersist()


class PartitionedParquetTarget(MergeTarget):
    """Partition-scoped MERGE on hive-partitioned parquet: dynamic
    partition overwrite rewrites only partitions present in the merged
    output, and the merged output is restricted to partitions the updates
    actually touch — so untouched partitions are neither read nor written
    (partition pruning on the read side, dynamic overwrite on the write
    side). At 100 TB with date-partitioned facts this is the difference
    between rewriting a day and rewriting a decade.

    Constraint (asserted by default): an update must not MOVE a row
    between partitions — ``partition_col`` must be stable under update,
    else the old copy in the unread partition survives. The guard scans
    the table's (key, partition) columns only — column pruning keeps that
    far cheaper than the rewrite it protects — and can be disabled
    (``validate_moves=False``) when the caller guarantees stability (e.g.
    the partition column is derived from the key). Format-level logs
    (Delta/Iceberg) lift the constraint; see :class:`DeltaTarget`.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_col: str,
        validate_moves: bool = True,
    ):
        self.spark = spark
        self.path = path
        self.partition_col = partition_col
        self.validate_moves = validate_moves

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def merge(self, updates: DataFrame, key: str) -> None:
        pcol = self.partition_col
        # Broadcast semi-join on the partition column: dynamic partition
        # pruning restricts the scan to touched partitions without ever
        # materializing the partition list on the driver.
        touched = updates.select(pcol).distinct()
        current = self.read().join(F.broadcast(touched), pcol, "left_semi")
        if self.validate_moves:
            # Table-wide lookup of update keys (NOT partition-scoped: a key
            # moving in from an UNTOUCHED partition is exactly the bug this
            # catches), pruned to two columns.
            upd_keys = updates.select(key, F.col(pcol).alias("_u_p"))
            moved = (
                self.read()
                .select(key, pcol)
                .join(F.broadcast(upd_keys), key)
                .where(F.col(pcol) != F.col("_u_p"))
                .limit(1)
                .count()
            )
            if moved:
                raise ValueError(
                    f"update moves key(s) across {pcol!r} partitions; "
                    "partition-scoped merge would leave stale copies — use a "
                    "log-backed target (DeltaTarget) or ParquetRewriteTarget"
                )
        keep = current.join(updates.select(key).distinct(), key, "left_anti")
        merged = keep.unionByName(updates).persist()
        try:
            merged.count()  # materialize before any overwrite
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(pcol)
                .parquet(self.path)
            )
        finally:
            merged.unpersist()

    def delete_where(self, condition) -> None:
        pcol = self.partition_col
        affected = self.read().where(condition).select(pcol).distinct()
        remaining = (
            self.read()
            .join(F.broadcast(affected), pcol, "left_semi")
            .where(~condition)
            .persist()
        )
        try:
            remaining.count()
            # Dynamic overwrite only replaces partitions PRESENT in the
            # output: a partition whose rows are ALL deleted would silently
            # keep its old files. Detect and refuse — full-partition drops
            # need a log-backed format or an explicit whole-table rewrite.
            emptied = (
                affected.join(remaining.select(pcol).distinct(), pcol, "left_anti")
                .limit(1)
                .count()
            )
            if emptied:
                raise ValueError(
                    "delete empties whole partition(s); dynamic overwrite "
                    "cannot express that — use ParquetRewriteTarget or a "
                    "log-backed target (DeltaTarget)"
                )
            (
                remaining.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(pcol)
                .parquet(self.path)
            )
        finally:
            remaining.unpersist()


class DeltaTarget(MergeTarget):
    """Format-level transactional MERGE (delta-spark). The production
    implementation of this interface: snapshot isolation, cross-partition
    key moves, concurrent writers. Not installed in this container —
    construction raises with setup instructions; the merge body is the
    standard public DeltaTable API so a deployment only flips the target
    class."""

    def __init__(self, spark: SparkSession, path: str):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as e:  # pragma: no cover - absent in container
            raise ImportError(
                "DeltaTarget requires the delta-spark package "
                "(pip install delta-spark; spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension)"
            ) from e
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:  # pragma: no cover - needs delta-spark
        return self.spark.read.format("delta").load(self.path)

    def merge(self, updates: DataFrame, key: str) -> None:  # pragma: no cover
        from delta.tables import DeltaTable

        (
            DeltaTable.forPath(self.spark, self.path)
            .alias("t")
            .merge(updates.alias("u"), f"t.{key} = u.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def delete_where(self, condition) -> None:  # pragma: no cover
        from delta.tables import DeltaTable

        DeltaTable.forPath(self.spark, self.path).delete(condition)
