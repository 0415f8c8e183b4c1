"""Spatial operators: grid-bucketed nearest-neighbor join.

The reference has no geo surface (its 30-line core is an ETL job,
reference scripts/spark_converter.py:25-31), but a large-scale analytics
engine meets point data constantly (store/sensor/user locations). The
scale-critical pattern is the same one this repo uses for every other
similarity domain (LSH bands, IVF cells, length blocks): turn a radius
predicate into an EQUI-join on a bucket key — here a fixed-degree grid
cell, with the dimension side replicated to its 3x3 cell neighborhood so
every true within-radius pair shares at least one cell key. Candidate
generation is a hash join; only candidates pay the distance arithmetic.

Coordinates are derived deterministically from table keys with the same
shared-template md5-nibble scheme the count-min sketch uses
(llm/corpus_ops._cm_col_expr): the expression text is valid in both Spark
SQL and DuckDB, so the oracle reconstructs identical coordinates and the
result hash-verifies exactly. Distance is squared degree-space euclidean —
pure +,-,* on doubles, bit-identical across engines, which transcendental
haversine would not guarantee (libm vs StrictMath last-ulp drift could
flip argmin ties); at city scale the monotone ordering is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register

_HEX = "0123456789abcdef"

# One grid cell per CELL_DEG degrees; search radius = one cell, so the 3x3
# neighborhood provably covers every within-radius candidate.
CELL_DEG = 5.0


def _h16(seed: str, key: str) -> str:
    """Deterministic 0..65535 from md5 nibbles — valid in Spark AND DuckDB."""
    # STRING (not VARCHAR) — Spark rejects length-less VARCHAR and DuckDB
    # accepts STRING as a VARCHAR alias, so the one template parses in both
    k = f"md5(concat('{seed}|', CAST({key} AS STRING)))"
    return (
        f"((instr('{_HEX}', substring({k}, 1, 1)) - 1) * 4096"
        f" + (instr('{_HEX}', substring({k}, 2, 1)) - 1) * 256"
        f" + (instr('{_HEX}', substring({k}, 3, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substring({k}, 4, 1)) - 1))"
    )


def _lat(seed_key: str) -> str:
    # 0..1199 -> [-60.0, +59.9] in 0.1-degree steps: exact decimal-literal
    # doubles, no division drift
    return f"(({_h16('lat', seed_key)} % 1200) * 0.1 - 60.0)"


def _lon(seed_key: str) -> str:
    return f"(({_h16('lon', seed_key)} % 2400) * 0.1 - 120.0)"


_GEO_ORACLE = f"""
    WITH cust AS (
        SELECT c_custkey, {_lat('c_custkey')} AS lat, {_lon('c_custkey')} AS lon
        FROM customer WHERE c_custkey < 400
    ), stat AS (
        SELECT s_suppkey, {_lat('s_suppkey')} AS lat, {_lon('s_suppkey')} AS lon
        FROM supplier
    ), stat9 AS (
        SELECT s_suppkey, lat, lon,
               CAST(FLOOR(lat / {CELL_DEG}) + dx AS BIGINT) AS cx,
               CAST(FLOOR(lon / {CELL_DEG}) + dy AS BIGINT) AS cy
        FROM stat,
             (SELECT UNNEST([-1, 0, 1]) AS dx),
             (SELECT UNNEST([-1, 0, 1]) AS dy)
    ), cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.lat - s.lat) * (c.lat - s.lat)
             + (c.lon - s.lon) * (c.lon - s.lon) AS d2
        FROM cust c JOIN stat9 s
          ON CAST(FLOOR(c.lat / {CELL_DEG}) AS BIGINT) = s.cx
         AND CAST(FLOOR(c.lon / {CELL_DEG}) AS BIGINT) = s.cy
        WHERE (c.lat - s.lat) * (c.lat - s.lat)
            + (c.lon - s.lon) * (c.lon - s.lon) <= {CELL_DEG} * {CELL_DEG}
    )
    SELECT c_custkey, s_suppkey, ROUND(d2, 6) AS d2
    FROM (SELECT c_custkey, s_suppkey, d2,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey
                                    ORDER BY d2, s_suppkey) AS rn
          FROM cand)
    WHERE rn = 1
"""


@register(
    "geo_grid_nearest",
    oracle=_GEO_ORACLE,
    doc="Nearest station within 5 degrees for each customer point, via "
    "grid bucketing: stations replicate to their 3x3 cell neighborhood "
    "(9 rows each — dim side, broadcastable), customers join on their "
    "single cell, so the radius predicate becomes a broadcast hash join "
    "instead of an all-pairs cross. At 100 TB of points the fact side "
    "never shuffles at all. Argmin tie-break is (d2, s_suppkey), "
    "deterministic on both engines.",
)
def geo_grid_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 400)
        .selectExpr(
            "c_custkey",
            f"{_lat('c_custkey')} AS lat",
            f"{_lon('c_custkey')} AS lon",
        )
        .withColumn("cx", F.floor(F.col("lat") / CELL_DEG))
        .withColumn("cy", F.floor(F.col("lon") / CELL_DEG))
    )
    stat9 = (
        load_table(spark, sf_dir, "supplier")
        .selectExpr(
            "s_suppkey",
            f"{_lat('s_suppkey')} AS s_lat",
            f"{_lon('s_suppkey')} AS s_lon",
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.floor(F.col("s_lat") / CELL_DEG) + F.col("dx")).alias("cx"),
            (F.floor(F.col("s_lon") / CELL_DEG) + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    cand = (
        cust.join(F.broadcast(stat9), ["cx", "cy"])
        .withColumn("d2", d2)
        .where(F.col("d2") <= CELL_DEG * CELL_DEG)
    )
    best = cand.groupBy("c_custkey").agg(
        F.min(F.struct(F.col("d2"), F.col("s_suppkey"))).alias("b")
    )
    return best.select(
        "c_custkey",
        F.col("b.s_suppkey").alias("s_suppkey"),
        F.round(F.col("b.d2"), 6).alias("d2"),
    )
