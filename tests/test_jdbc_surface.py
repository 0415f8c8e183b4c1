"""JDBC surface tests. Round 10 upgrade: pyspark ships embedded Derby
on its default classpath, so the helpers are now exercised END TO END
against a real in-process database (write with connection ceiling,
range-partitioned and predicate-split parallel reads). The sqlite
driver-boundary tests remain for engines whose jars are genuinely
absent: those must die INSIDE Spark's driver-class lookup, proving the
options plumb through."""

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


# ---------------------------------------------------------------------------
# End-to-end through embedded Derby (round 10)
# ---------------------------------------------------------------------------

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path, name="db"):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def test_derby_write_then_partitioned_read_roundtrip(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id * 3 AS v")
    url = _derby_url(tmp_path)
    write_jdbc(df, url, "t", mode="overwrite", max_connections=2,
               driver=DERBY_DRIVER)
    back = read_partitioned(
        spark, url, "t", "id", 0, 100, 4, driver=DERBY_DRIVER
    )
    # parallel read: 4 strides -> 4 partitions, no row lost or duplicated
    assert back.rdd.getNumPartitions() == 4
    got = sorted((r["id"], r["v"]) for r in back.collect())
    assert got == [(i, 3 * i) for i in range(100)]


def test_derby_predicate_read_partitions_are_exclusive(spark, tmp_path):
    df = spark.range(50).selectExpr("id", "CAST(id % 2 AS INT) AS par")
    url = _derby_url(tmp_path)
    write_jdbc(df, url, "t", mode="overwrite", max_connections=1,
               driver=DERBY_DRIVER)
    back = read_by_predicates(
        # Derby upper-cases unquoted identifiers while Spark's writer
        # CREATEs quoted lower-case columns — predicates must quote
        spark, url, "t", ['"par" = 0', '"par" = 1'], driver=DERBY_DRIVER
    )
    assert back.rdd.getNumPartitions() == 2
    assert back.count() == 50 and back.select("id").distinct().count() == 50


def test_derby_filter_pushdown_reaches_jdbc_source(spark, tmp_path):
    """Catalyst must push the filter INTO the generated JDBC query —
    the scan's metadata carries the pushed predicate."""
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    url = _derby_url(tmp_path)
    write_jdbc(df, url, "t", mode="overwrite", max_connections=1,
               driver=DERBY_DRIVER)
    back = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", "t").option("driver", DERBY_DRIVER).load() \
        .where("id >= 90")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan, plan[:500]
    assert back.count() == 10


# ---------------------------------------------------------------------------
# Second engine: DuckDB over JDBC (round 13 — the env gate closed)
# ---------------------------------------------------------------------------


def test_duckdb_jdbc_jar_discoverable():
    from emr_with_custom_metrics_spark.sources.jdbc import (
        _find_duckdb_jdbc_jar,
    )

    jar = _find_duckdb_jdbc_jar()
    assert jar is not None and jar.endswith(".jar")


def test_duckdb_roundtrip_values_and_pushdown(spark):
    """The registered second-engine roundtrip must agree with the same
    aggregate computed straight off parquet, and a filter over the
    read-back relation must push into the JDBC source."""
    from emr_with_custom_metrics_spark.registry import all_specs

    sf_dir = "/root/testdata/sf0.001"
    out = all_specs()["jdbc_roundtrip_duckdb"].fn(spark, sf_dir)
    got = {r["status"]: (r["n_orders"], r["revenue_cents"])
           for r in out.collect()}
    from pyspark.sql import functions as F

    from emr_with_custom_metrics_spark.catalog import load_table

    exp = {
        r["status"]: (r["n_orders"], r["revenue_cents"])
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("revenue_cents"),
        )
        .collect()
    }
    assert got == exp and len(got) >= 2
    plan = out.where("n_orders >= 1")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters" in plan
