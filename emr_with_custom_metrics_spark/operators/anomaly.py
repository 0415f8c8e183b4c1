"""Outlier / anomaly detection over the ``events`` stream table — the
data-quality screens a 100 TB ingestion pipeline runs before training data
ever reaches dedup (drop corrupt meters, clamp fat-finger values).

No reference analogue; §2A.1 "beyond count" aggregation coverage. Both
screens are two-pass but single-shuffle: pass 1 reduces to per-group
statistics (bytes per group, not rows), pass 2 re-attaches them via
broadcast join and filters map-side. At scale the stats side is KB-sized
regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


@register(
    "events_zscore_outliers",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               AVG(value) AS mu,
               STDDEV_SAMP(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST(ROUND((e.value - s.mu) / s.sigma, 4) AS DOUBLE) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.sigma > 0 AND ABS((e.value - s.mu) / s.sigma) > 2.5
    """,
    doc="Per-type z-score outliers: one aggregation to (mu, sigma) per "
    "event type, broadcast back onto the stream, |z| > 2.5 filtered "
    "map-side. The stats table is O(types) — broadcast at any scale. "
    "z is rounded to 4 dp on both sides (mean/stddev merge-order jitter "
    "is ~1e-15 relative; the 2.5 cut itself is knife-edge-safe because "
    "values have coarse granularity relative to fp error).",
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where((F.col("sigma") > 0) & (F.abs(z) > 2.5))
        .select("event_id", "event_type", "value", F.round(z, 4).cast("double").alias("z"))
    )


@register(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, QUANTILE_CONT(value, 0.5) AS m
        FROM events GROUP BY event_type
    ), mad AS (
        SELECT e.event_type, m, QUANTILE_CONT(ABS(e.value - m), 0.5) AS d
        FROM events e JOIN med USING (event_type)
        GROUP BY e.event_type, m
    )
    SELECT event_type, CAST(ROUND(m, 4) AS DOUBLE) AS median_value,
           CAST(ROUND(d, 4) AS DOUBLE) AS mad,
           COUNT(*) FILTER (WHERE ABS(value - m) > 3 * d) AS n_outliers
    FROM events JOIN mad USING (event_type)
    GROUP BY event_type, m, d
    """,
    doc="Median-absolute-deviation outlier counts — the robust screen "
    "(a single fat-finger value drags a mean, not a median). Two exact "
    "percentile aggregations (Spark `percentile`/DuckDB QUANTILE_CONT, "
    "both linear-interpolation on the sorted sample) chained by "
    "broadcast joins. Exact percentiles hold to ~10 TB groups; beyond "
    "that swap in approx_percentile with documented error — the "
    "agg_approx_quantile pattern.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(F.expr("percentile(abs(value - m), 0.5)").alias("d"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "m", "d")
        .agg(
            F.count(F.when(F.abs(F.col("value") - F.col("m")) > 3 * F.col("d"), 1)).alias(
                "n_outliers"
            )
        )
        .select(
            "event_type",
            F.round("m", 4).cast("double").alias("median_value"),
            F.round("d", 4).cast("double").alias("mad"),
            "n_outliers",
        )
    )
