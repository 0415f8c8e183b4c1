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
           CAST((CAST(ROUND(((e.value - s.mu) / s.sigma) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS DOUBLE) AS z
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
        .select("event_id", "event_type", "value", (F.round((z) * 10000).cast("bigint") / 10000.0).cast("double").alias("z"))
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
    SELECT event_type, CAST((CAST(ROUND((m) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS DOUBLE) AS median_value,
           CAST((CAST(ROUND((d) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS DOUBLE) AS mad,
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
            (F.round((F.col("m")) * 10000).cast("bigint") / 10000.0).cast("double").alias("median_value"),
            (F.round((F.col("d")) * 10000).cast("bigint") / 10000.0).cast("double").alias("mad"),
            "n_outliers",
        )
    )


@register(
    "events_cusum_drift",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               (CAST(ROUND((AVG(value)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS m,
               (CAST(ROUND((STDDEV_POP(value)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS sd
        FROM events GROUP BY event_type
    ), s AS (
        SELECT e.event_type,
               CAST(FLOOR(epoch(e.ts) / 86400) AS BIGINT) AS day,
               list((e.value - st.m) / st.sd ORDER BY e.ts, e.event_id) AS zs
        FROM events e JOIN stats st USING (event_type)
        GROUP BY 1, 2
    ), folded AS (
        SELECT event_type, day, len(zs) AS n,
               list_reduce(
                 list_transform(zs, z -> [
                   CAST(z AS DOUBLE),
                   GREATEST(z - 0.5, 0.0),
                   GREATEST(z - 0.5, 0.0),
                   CASE WHEN GREATEST(z - 0.5, 0.0) > 3.0
                        THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END]),
                 (acc, x) -> [
                   x[1],
                   GREATEST(acc[2] + x[1] - 0.5, 0.0),
                   GREATEST(acc[3], GREATEST(acc[2] + x[1] - 0.5, 0.0)),
                   acc[4] + CASE WHEN GREATEST(acc[2] + x[1] - 0.5, 0.0) > 3.0
                                 THEN 1.0 ELSE 0.0 END]) AS st
        FROM s
    )
    SELECT event_type, day,
           CAST(n AS BIGINT) AS n_points,
           (CAST(ROUND((st[2]) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS cusum_final,
           (CAST(ROUND((st[3]) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS cusum_max,
           CAST(st[4] AS BIGINT) AS n_exceed
    FROM folded
    """,
    doc="One-sided CUSUM drift detection per (metric, day) — the change-"
    "point screen that catches slow upward drifts the z-score outlier "
    "battery misses: s_t = max(0, s_{t-1} + z_t - 0.5) with alarms at "
    "s > 3 (Page 1954). The third sequential state machine in the "
    "ordered-fold family (EWMA: 1 state; Holt: 2; here: running sum + "
    "running max + alarm count). Cross-engine parity recipe, composed "
    "from this repo's earlier findings: standardization inputs (mean, "
    "stddev_pop) are ROUNDED AT 6 DP before the fold so both engines "
    "fold identical doubles despite hash-agg summation-order drift; the "
    "DuckDB accumulator is a DOUBLE[4] LIST, never a struct (the r6 "
    "struct-mutation gotcha from timeseries_holt_winters); each element "
    "carries its raw z because the clipped init state loses it. Group "
    "state stays day-bounded.",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        (F.round((F.avg("value")) * 1000000).cast("bigint") / 1000000.0).alias("m"),
        (F.round((F.stddev_pop("value")) * 1000000).cast("bigint") / 1000000.0).alias("sd"),
    )
    s = (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
            F.struct("ts", "event_id", ((F.col("value") - F.col("m")) / F.col("sd")).alias("z")).alias("pt"),
        )
        .groupBy("event_type", "day")
        .agg(F.array_sort(F.collect_list("pt")).alias("pts"))
    )
    st = F.expr(
        """
        aggregate(
          transform(pts, p -> named_struct(
            'z', p.z,
            's', greatest(p.z - 0.5, CAST(0.0 AS DOUBLE)),
            'mx', greatest(p.z - 0.5, CAST(0.0 AS DOUBLE)),
            'nx', CASE WHEN greatest(p.z - 0.5, CAST(0.0 AS DOUBLE)) > 3.0
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)),
          CAST(NULL AS struct<z: double, s: double, mx: double, nx: double>),
          (acc, x) -> CASE WHEN acc IS NULL THEN x
            ELSE named_struct(
              'z', x.z,
              's', greatest(acc.s + x.z - 0.5, CAST(0.0 AS DOUBLE)),
              'mx', greatest(acc.mx,
                             greatest(acc.s + x.z - 0.5, CAST(0.0 AS DOUBLE))),
              'nx', acc.nx + CASE WHEN greatest(acc.s + x.z - 0.5,
                                               CAST(0.0 AS DOUBLE)) > 3.0
                                  THEN 1.0 ELSE 0.0 END) END)
        """
    )
    return s.select(
        "event_type",
        "day",
        F.size("pts").cast("bigint").alias("n_points"),
        (F.round((st.getField("s")) * 1000000).cast("bigint") / 1000000.0).alias("cusum_final"),
        (F.round((st.getField("mx")) * 1000000).cast("bigint") / 1000000.0).alias("cusum_max"),
        st.getField("nx").cast("bigint").alias("n_exceed"),
    )
