"""Set operations: union / intersect / except / distinct-union.

Absent from the reference (SURVEY.md §2A.1 "Set ops"). INTERSECT/EXCEPT
plan as left-semi / left-anti joins over distinct inputs — one shuffle each;
UNION ALL is a zero-shuffle concatenation of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    doc="UNION ALL + aggregate: concatenation is free; one shuffle for the agg.",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics) → left-semi join under the hood.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (distinct semantics) → left-anti join under the hood.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract() is EXCEPT DISTINCT; exceptAll() would be multiset
    # difference (bag semantics), which is NOT what SQL EXCEPT means.
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT ALL (bag semantics): min(multiplicity) per value.",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))


@register(
    "setop_except_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    EXCEPT ALL
    SELECT c_nationkey AS nationkey FROM customer
    """,
    doc="EXCEPT ALL (bag semantics): multiplicity subtraction.",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _supp_nations(spark, sf_dir).exceptAll(_cust_nations(spark, sf_dir))


@register(
    "setop_union_missing_columns",
    oracle="""
    SELECT nationkey, acctbal, side, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'cust' AS side FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, NULL AS acctbal, 'supp' AS side FROM supplier
    ) GROUP BY nationkey, acctbal, side
    """,
    doc="unionByName(allowMissingColumns=True): schema-evolving append — "
    "absent columns null-padded by NAME, never by position.",
)
def setop_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("cust").alias("side"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supp").alias("side")
    )
    return (
        c.unionByName(s, allowMissingColumns=True)
        .groupBy("nationkey", "acctbal", "side")
        .agg(F.count("*").alias("n"))
    )


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct): concat + hash-distinct.",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir)).distinct()
