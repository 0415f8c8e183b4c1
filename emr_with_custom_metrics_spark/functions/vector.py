"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Multimodal/vector columns are plain Spark SQL arrays (SURVEY.md §1.4 [EXT]
row): all arithmetic uses higher-order functions (``zip_with``,
``aggregate``, ``transform``) which run inside codegen — no Python, no UDF,
no serialization. These helpers back the similarity/dedup operators in
``llm/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_fanned
from emr_with_custom_metrics_spark.registry import register


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns. Cast to double first: accumulation
    happens in float64 in index order, bit-matching the DuckDB oracle."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def scale(a: Column, s: Column | float) -> Column:
    return F.transform(a.cast("array<double>"), lambda x: x * s)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x + y)


@register(
    "vector_norms",
    oracle="""
    SELECT vec_id, label,
           CAST(LEN(embedding) AS INTEGER) AS dim,
           (CAST(ROUND((SQRT(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE))
             AS l2_norm,
           (CAST(ROUND((list_aggregate(embedding::DOUBLE[], 'sum')) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS comp_sum,
           (CAST(ROUND((list_aggregate(embedding::DOUBLE[], 'max')) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS comp_max
    FROM embeddings
    """,
    doc="Per-vector L2 norm / component stats via higher-order functions.",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_fanned(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        (F.round((norm(emb)) * 1000000).cast("bigint") / 1000000.0).alias("l2_norm"),
        (F.round((F.aggregate(emb.cast("array<double>"), F.lit(0.0), lambda acc, v: acc + v)) * 1000000).cast("bigint") / 1000000.0).alias("comp_sum"),
        (F.round((F.array_max(emb.cast("array<double>"))) * 1000000).cast("bigint") / 1000000.0).alias("comp_max"),
    )


@register(
    "vector_centroids",
    oracle="""
    SELECT label, COUNT(*) AS n,
           (CAST(ROUND((AVG(embedding[1]::DOUBLE)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS c0,
           (CAST(ROUND((AVG(embedding[2]::DOUBLE)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS c1,
           (CAST(ROUND((AVG(embedding[3]::DOUBLE)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS c2
    FROM embeddings GROUP BY label
    """,
    doc="Per-label centroid (first 3 components shown): element access + "
    "grouped avg — the building block of the IVF index in llm/similarity.",
)
def vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_fanned(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        (F.round((F.avg(emb.getItem(0))) * 1000000).cast("bigint") / 1000000.0).alias("c0"),
        (F.round((F.avg(emb.getItem(1))) * 1000000).cast("bigint") / 1000000.0).alias("c1"),
        (F.round((F.avg(emb.getItem(2))) * 1000000).cast("bigint") / 1000000.0).alias("c2"),
    )
