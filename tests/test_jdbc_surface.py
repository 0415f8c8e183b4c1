"""JDBC helper wiring: no driver jar ships in this container, so these
tests assert the options plumb through to Spark's JDBC layer — the
failure must be the JDBC driver-class lookup, not our argument handling —
and skip the rest."""

from __future__ import annotations

import pytest

from emr_with_custom_metrics_spark.sources.jdbc import (
    read_by_predicates,
    read_partitioned,
    write_jdbc,
)

URL = "jdbc:sqlite:/tmp/nonexistent.db"


def _expect_driver_boundary(fn):
    """The call must traverse our wrapper and die INSIDE Spark's JDBC
    connection provider (no suitable driver / class not found) — anything
    else (TypeError, AnalysisException on options) is a wiring bug."""
    with pytest.raises(Exception) as e:
        fn()
    msg = str(e.value)
    assert (
        "driver" in msg.lower() or "ClassNotFound" in msg or "No suitable" in msg
    ), f"failed before the driver boundary: {msg[:300]}"


def test_read_partitioned_reaches_driver_boundary(spark):
    _expect_driver_boundary(
        lambda: read_partitioned(
            spark, URL, "t", "id", 0, 100, 4, driver="org.sqlite.JDBC"
        ).count()
    )


def test_read_by_predicates_reaches_driver_boundary(spark):
    _expect_driver_boundary(
        lambda: read_by_predicates(
            spark, URL, "t", ["id < 50", "id >= 50"], driver="org.sqlite.JDBC"
        ).count()
    )


def test_write_jdbc_reaches_driver_boundary(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    _expect_driver_boundary(
        lambda: write_jdbc(df, URL, "t", driver="org.sqlite.JDBC")
    )
    # connection ceiling: the coalesce is part of the plan before the save
    assert df.coalesce(4).rdd.getNumPartitions() <= 4
