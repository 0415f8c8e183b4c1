"""Window functions: ranking, offsets, running aggregates, top-k per group.

Absent from the reference (SURVEY.md §2A.1 "Window functions"). Each window
is one hash-partition shuffle on the partition key + per-partition sort;
different functions over the SAME (partitionBy, orderBy) spec share a single
exchange, so batteries of functions are declared over one spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


@register(
    "window_rank_battery",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="row_number/rank/dense_rank/ntile over one shared window spec "
    "(single exchange + sort).",
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "window_offsets",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           (CAST(ROUND((value - COALESCE(LAG(value) OVER w, 0)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS delta_value
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead offsets along per-user event-time order.",
)
def window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.round((F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))) * 100).cast("bigint") / 100.0).alias(
            "delta_value"
        ),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (CAST(ROUND((SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS running_spend,
           (CAST(ROUND((AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS avg_3
    FROM orders
    WHERE o_custkey <= 100
    """,
    doc="Running cumulative sum + 3-row moving average (rowsBetween frames).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.round((F.sum("o_totalprice").over(cum)) * 100).cast("bigint") / 100.0).alias("running_spend"),
        (F.round((F.avg("o_totalprice").over(mov)) * 10000).cast("bigint") / 10000.0).alias("avg_3"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
    doc="Top-k per group = row_number window + filter; Spark pushes the "
    "rank limit into the sort (WindowGroupLimit) so partitions never "
    "materialize beyond k rows.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last value per key with full-frame window + distinct collapse.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_events"),
    ).distinct()


@register(
    "window_ignore_nulls",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value < 20 THEN NULL ELSE (CAST(ROUND((value) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) END AS v
        FROM events WHERE user_id < 30
    )
    SELECT user_id, event_id,
           LAG(v IGNORE NULLS) OVER w AS prev_valid,
           LEAD(v IGNORE NULLS) OVER w AS next_valid,
           FIRST(v IGNORE NULLS) OVER w AS first_valid,
           LAST(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_valid
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="IGNORE NULLS across the offset/navigation window family — the "
    "sensor-data idiom (last known good reading, next valid reading) "
    "that timeseries_gapfill_ffill builds on. lag/lead skip null gaps "
    "instead of landing on them; first/last take the frame's first/last "
    "NON-NULL. Same one-shuffle window envelope as the other batteries; "
    "DuckDB runs the identical IGNORE NULLS syntax.",
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    # Spark's IGNORE NULLS sits AFTER the call parens (LAG(v) IGNORE NULLS);
    # DuckDB's sits inside them (LAG(v IGNORE NULLS)) — same semantics, two
    # placements, hence two texts.
    return spark.sql(
        """
        WITH base AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN value < 20 THEN NULL
                        ELSE (CAST(ROUND((value) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) END AS v
            FROM events WHERE user_id < 30
        )
        SELECT user_id, event_id,
               LAG(v) IGNORE NULLS OVER w AS prev_valid,
               LEAD(v) IGNORE NULLS OVER w AS next_valid,
               FIRST(v) IGNORE NULLS OVER w AS first_valid,
               LAST(v) IGNORE NULLS OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS last_valid
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    )


@register(
    "window_rolling_median",
    oracle="""
    SELECT event_id, event_type,
           (CAST(ROUND((MEDIAN(value) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS rolling_median
    FROM events
    """,
    doc="Exact rolling median over an 11-row sliding frame per metric — "
    "the robust smoother (median filters shrug off the spikes an EWMA "
    "chases). Spark has no MEDIAN window function, so the frame is "
    "materialized as collect_list over the ROWS window, sorted, and the "
    "exact middle element(s) picked — odd frames take the center, the "
    "10 warm-up rows average the two middles, matching the SQL MEDIAN "
    "definition DuckDB applies. Frame state is 11 doubles per row — "
    "constant — so the window shuffles once by metric and streams; at "
    "100 TB the partition-by key (event_type, or (type, day) if one "
    "metric dominates) is the only skew dial. Averaging two identical-"
    "provenance doubles is exact, so ROUND(...,2) hashes stably.",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    return ev.select(
        "event_id",
        "event_type",
        (F.round(((mid_lo + mid_hi) / 2.0) * 100).cast("bigint") / 100.0).alias("rolling_median"),
    )


@register(
    "window_running_distinct",
    oracle="""
    WITH marked AS (
        SELECT event_type, ts, event_id, user_id,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events),
    daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
               SUM(first_seen) AS new_users,
               COUNT(*) AS n_events
        FROM marked GROUP BY 1, 2)
    SELECT event_type, day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS running_distinct_users
    FROM daily
    """,
    doc="RUNNING DISTINCT count — the window aggregate SQL engines "
    "refuse (COUNT(DISTINCT) OVER a running frame): decomposed into "
    "first-occurrence marking (rank 1 per (group, user) in event-time "
    "order, tie-broken by event_id) + a daily rollup + a cumulative sum "
    "of new-user marks. Two shuffles total — (group, user) then "
    "(group, day) — each carrying marks, never re-scanning history; the "
    "naive per-frame DISTINCT is quadratic in the window length. The "
    "daily new/cumulative split is the growth-accounting shape every "
    "activation dashboard needs.",
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400_000_000))
        .cast("bigint")
        .alias("day"),
        F.when(F.row_number().over(first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    daily = marked.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("first_seen").cast("bigint").alias("new_users"),
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type", "day", "n_events", "new_users",
        F.sum("new_users").over(cum).cast("bigint").alias("running_distinct_users"),
    )
