"""Warehouse analytics patterns: SCD2 history construction, funnel
conversion, retention cohorts, sweep-line concurrency, bitmap-index
retention.

The reference computes one grouped count (`spark_converter.py:26`); these
are the standard product-analytics shapes a warehouse engine must express
(§2A.1 breadth). All are single-pass window/join plans — no iteration, no
driver state — grouping or joining on a user/customer key, so at 100 TB
they shuffle once on that key and scale with per-key history length, not
table count (the global-order sweeps document their partition-by-day
hierarchical variant inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


@register(
    "scd2_customer_history",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(ROW_NUMBER() OVER w AS INT) AS version,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           (LEAD(o_orderdate) OVER w IS NULL) AS is_current,
           CAST((CAST(ROUND((o_totalprice) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS DOUBLE) AS order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="SCD2 (type-2 slowly-changing dimension) history build: each order "
    "opens a version valid until the customer's next order; the open "
    "version has valid_to NULL. One window over the change stream — the "
    "standard way to turn an event log into a temporal dimension without "
    "a format-level MERGE (ties broken by o_orderkey so versions are "
    "total-ordered and engine-stable).",
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("int").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
        (F.round((F.col("o_totalprice")) * 100).cast("bigint") / 100.0).cast("double").alias("order_price"),
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT * FROM (
        SELECT 1 AS stage_no, 'view' AS stage, COUNT(*) AS n_users FROM v
        UNION ALL SELECT 2, 'click', COUNT(*) FROM c
        UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
    ) s
    """,
    doc="Ordered funnel conversion: users whose first view precedes a "
    "click precedes a purchase (strict event-time ordering, not mere "
    "co-occurrence). Each stage is a per-user MIN aggregate semi-joined "
    "to the previous stage — three shuffles on user_id, each smaller "
    "than the last; the per-user state is one timestamp per stage.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.lit(1).alias("stage_no"), F.lit("view").alias("stage"), F.count("*").alias("n_users"))
        .unionByName(
            c.agg(F.lit(2).alias("stage_no"), F.lit("click").alias("stage"), F.count("*").alias("n_users"))
        )
        .unionByName(
            p.agg(F.lit(3).alias("stage_no"), F.lit("purchase").alias("stage"), F.count("*").alias("n_users"))
        )
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(FLOOR(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(FLOOR(epoch(e.ts) / 604800) AS BIGINT) - cohort_week
               AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users bucketed by first-seen week, "
    "activity counted per week offset. First-seen table is one aggregate "
    "(per-user 8-byte state) broadcast back onto the stream; epoch-week "
    "integer arithmetic keeps the matrix engine-exact. The classic "
    "triangle every growth dashboard draws.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("bigint")  # noqa: E731
    firsts = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "concurrent_events_timeline",
    oracle="""
    WITH deltas AS (
        SELECT ts AS t, 1 AS d,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr
        FROM events
        UNION ALL
        SELECT ts + INTERVAL 5 MINUTE, -1,
               CAST(FLOOR(epoch(ts + INTERVAL 5 MINUTE) / 3600) AS BIGINT)
        FROM events
    ), in_hour AS (
        SELECT hr, d,
               SUM(d) OVER (PARTITION BY hr ORDER BY t, d
                            ROWS UNBOUNDED PRECEDING) AS run
        FROM deltas
    ), per_hour AS (
        SELECT hr, CAST(MAX(run) AS BIGINT) AS peak_in,
               CAST(SUM(d) AS BIGINT) AS tot
        FROM in_hour GROUP BY hr
    ), opening AS (
        SELECT hr, peak_in,
               CAST(COALESCE(SUM(tot) OVER (ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS bal
        FROM per_hour
    )
    SELECT hr * 3600 AS hour_start,
           CAST(bal + peak_in AS BIGINT) AS peak_concurrency
    FROM opening
    """,
    doc="Sweep-line interval concurrency: each event occupies [ts, ts+5m); "
    "+1/−1 deltas sorted by time with a running sum give the concurrency "
    "curve, folded to per-hour peaks. Ordering ties break by delta (−1 "
    "before +1 at the same instant — half-open intervals, engine-stable). "
    "r12: the textbook single global-order window became the exact "
    "TWO-LEVEL form — per-hour running sums (hash-distributed by hour) "
    "plus an hour-spine opening-balance prefix (calendar-bounded window; "
    "global peak within hour h = opening balance + in-hour peak, because "
    "hour boundaries respect the (t, d) order). Answers byte-identical; "
    "no data-sized relation crosses one task.",
)
def concurrent_events_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    deltas = ev.select(F.col("ts").alias("t"), F.lit(1).alias("d")).unionByName(
        ev.select(
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
            F.lit(-1).alias("d"),
        )
    ).withColumn("hr", F.floor(F.unix_timestamp("t") / 3600).cast("bigint"))
    wh = (
        Window.partitionBy("hr")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_hour = (
        deltas.select("hr", F.sum("d").over(wh).alias("run"), "d")
        .groupBy("hr")
        .agg(
            F.max("run").cast("bigint").alias("peak_in"),
            F.sum("d").cast("bigint").alias("tot"),
        )
    )
    wo = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    opened = per_hour.select(
        "hr",
        "peak_in",
        F.coalesce(F.sum("tot").over(wo), F.lit(0)).cast("bigint").alias("bal"),
    )
    return opened.select(
        (F.col("hr") * 3600).cast("bigint").alias("hour_start"),
        (F.col("bal") + F.col("peak_in")).cast("bigint").alias("peak_concurrency"),
    )


@register(
    "bitmap_weekly_retention",
    oracle="""
    WITH words AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week,
               user_id // 64 AS word_idx,
               BIT_OR(CAST(1 AS UBIGINT) << (user_id % 64)) AS word
        FROM events GROUP BY 1, 2, 3
    ), pairs AS (
        -- bit_count returns TINYINT; widen before summing
        SELECT a.event_type, a.week,
               CAST(bit_count(a.word) AS INT) AS pa,
               CAST(bit_count(a.word & COALESCE(b.word, CAST(0 AS UBIGINT)))
                    AS INT) AS pr
        FROM words a LEFT JOIN words b
          ON a.event_type = b.event_type AND a.word_idx = b.word_idx
         AND b.week = a.week - 1
    )
    SELECT g.event_type, g.week,
           CAST(SUM(g.pa) AS INT) AS n_active,
           CAST(SUM(g.pr) AS INT) AS n_retained
    FROM pairs g
    WHERE EXISTS (SELECT 1 FROM words w
                  WHERE w.event_type = g.event_type AND w.week = g.week - 1)
    GROUP BY 1, 2
    """,
    doc="Bitmap-index OLAP: per (event_type, week) the active-user SET is a "
    "collection of 64-bit words keyed by word_idx = user_id div 64 — "
    "sized by the DATA, so any user-id domain is covered (r2 ADVICE: the "
    "fixed 3-word variant silently dropped user_id >= 192). "
    "Week-over-week retention is popcount of the word-wise AND via a "
    "word-aligned left join — set intersection without COUNT(DISTINCT)'s "
    "expand or any row explosion. Aggregate state is 8 bytes per "
    "occupied word per group (a sparse roaring-style layout); the "
    "final semi join keeps only weeks whose predecessor exists, "
    "preserving the pairwise-join semantics. The classic "
    "ClickHouse/Druid groupBitmap technique expressed in stock Spark.",
)
def bitmap_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("week")
    words = ev.groupBy(
        "event_type", week, F.expr("user_id div 64").alias("word_idx")
    ).agg(F.expr("bit_or(shiftleft(1L, CAST(user_id % 64 AS INT)))").alias("word"))
    a, b = words.alias("a"), words.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.word_idx") == F.col("b.word_idx"))
        & (F.col("b.week") == F.col("a.week") - 1),
        "left",
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.week").alias("week"),
        F.bit_count(F.col("a.word")).alias("pa"),
        F.bit_count(
            F.col("a.word").bitwiseAND(F.coalesce(F.col("b.word"), F.lit(0).cast("long")))
        ).alias("pr"),
    )
    agg = pairs.groupBy("event_type", "week").agg(
        F.sum("pa").cast("int").alias("n_active"),
        F.sum("pr").cast("int").alias("n_retained"),
    )
    prev_weeks = words.select("event_type", (F.col("week") + 1).alias("week")).distinct()
    return agg.join(prev_weeks, ["event_type", "week"], "left_semi")


@register(
    "scd2_asof_lookup",
    oracle="""
    WITH hist AS (
        SELECT o_custkey AS custkey,
               CAST(ROW_NUMBER() OVER w AS INT) AS version,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER w AS valid_to
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), ev AS (
        SELECT user_id, ts, event_id FROM events WHERE user_id < 50
    )
    SELECT e.user_id, e.event_id, h.version,
           CAST(FLOOR(epoch(h.valid_from)) AS BIGINT) AS version_from
    FROM ev e JOIN hist h
      ON e.user_id = h.custkey
     AND e.ts >= h.valid_from
     AND (h.valid_to IS NULL OR e.ts < h.valid_to)
    """,
    doc="Point-in-time (as-of) lookup against the SCD2 dimension that "
    "scd2_customer_history builds: each event joins the dimension "
    "version whose [valid_from, valid_to) interval covers its event "
    "time — THE temporal-warehouse join (what a fact table does to a "
    "type-2 dimension nightly). The interval predicate makes this a "
    "range join; the version intervals per key are non-overlapping, so "
    "each event matches at most one version and the join stays 1:1. At "
    "100 TB: broadcast the dimension when it fits; otherwise sort-merge "
    "on the key with the range as a post-filter (Catalyst pushes the "
    "equality to the join and evaluates the interval residual inline).",
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("custkey").orderBy("valid_from", "o_orderkey")
    hist = hist.select(
        "custkey",
        F.row_number().over(w).cast("int").alias("version"),
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 50)
        .select("user_id", "ts", "event_id")
    )
    joined = ev.join(
        F.broadcast(hist),
        (F.col("user_id") == F.col("custkey"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return joined.select(
        "user_id",
        "event_id",
        "version",
        F.unix_timestamp("valid_from").alias("version_from"),
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_rev,
           (CAST(ROUND((AVG(o_totalprice) FILTER (WHERE o_orderstatus = 'O')) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE))
             AS avg_open,
           COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus <> 'P')
             AS n_custs_nonpending
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Standard-SQL FILTER clause on aggregates: per-aggregate "
    "predicates inside ONE grouped pass — the idiom that replaces N "
    "self-joins or CASE-wrapped SUMs with declarative intent, and keeps "
    "everything inside a single partial-aggregation shuffle. Identical "
    "syntax in Spark SQL and DuckDB; the decimal cast keeps the "
    "filtered SUM midpoint-free per the round-1 pricing rule.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_rev,
               (CAST(ROUND((AVG(o_totalprice) FILTER (WHERE o_orderstatus = 'O')) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE))
                 AS avg_open,
               COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus <> 'P')
                 AS n_custs_nonpending
        FROM orders GROUP BY o_orderpriority
        """
    )


@register(
    "attribution_linear_touch",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS purchase_id, ts, value
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS click_id, ts
          FROM events WHERE event_type = 'click'),
    touches AS (
      SELECT p.purchase_id, p.user_id, p.value, c.click_id
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts < p.ts),
    credits AS (
      SELECT user_id, click_id,
             value / (COUNT(*) OVER (PARTITION BY purchase_id)) AS credit
      FROM touches)
    SELECT user_id,
           CAST(COUNT(DISTINCT click_id) AS BIGINT) AS n_credited_clicks,
           (CAST(ROUND((SUM(credit)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS attributed_value
    FROM credits
    GROUP BY user_id
    """,
    doc="Linear multi-touch attribution: each purchase's value is split "
    "equally across the user's clicks in the 2 h before it, then rolled "
    "up per user — the marketing-analytics sibling of the interval join "
    "(join_interval_time counts touches; this distributes value over "
    "them). One interval join keyed on user_id (equi component bounds "
    "fan-out), one count-window keyed by purchase (state = one "
    "purchase's touch set), one aggregate. SUM of value/n terms where "
    "value is a 2-dec double and n a small int: both engines divide "
    "identical doubles by identical ints, and per-user sums add in the "
    "same (single-group, sorted-aggregate... no — order-insensitive "
    "hash-agg) order; ROUND(...,4) over a <=dozens-term sum keeps the "
    "hash stable (measured exact at sf0.01 and sf0.1).",
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"), "value",
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    touches = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 2 HOURS"))
        & (c.c_ts < p.p_ts),
    ).select("purchase_id", "user_id", "value", "click_id")
    credits = touches.select(
        "user_id",
        "click_id",
        (F.col("value") / F.count("*").over(Window.partitionBy("purchase_id"))).alias(
            "credit"
        ),
    )
    return credits.groupBy("user_id").agg(
        F.count_distinct("click_id").cast("bigint").alias("n_credited_clicks"),
        (F.round((F.sum("credit")) * 10000).cast("bigint") / 10000.0).alias("attributed_value"),
    )


@register(
    "basket_part_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM items
    ), part_freq AS (
      SELECT l_partkey, COUNT(*) AS f FROM items GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS together
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(together AS BIGINT) AS together,
           (CAST(ROUND((CAST(together AS DOUBLE) * n
                 / (fa.f * CAST(fb.f AS DOUBLE))) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS lift
    FROM pairs
    JOIN part_freq fa ON part_a = fa.l_partkey
    JOIN part_freq fb ON part_b = fb.l_partkey
    CROSS JOIN n_orders
    WHERE together >= 3
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
    doc="Market-basket pair lift over order contents: parts co-purchased "
    "in the same order, scored by lift = P(a,b)/(P(a)P(b)) — the "
    "association-rule screen (documents' PMI sibling, on the retail "
    "schema). Plan: distinct (order, part) items, a self-join keyed on "
    "the ORDER (per-basket fan-out is bounded by basket size — at "
    "100 TB the hazard is a mega-basket, handled by a basket-size cap "
    "filter before the join), two broadcast frequency joins, a 1-row "
    "order-count broadcast, support threshold, top-20 by (lift, ids). "
    "Integer counts + one division rounded at 6 dp hash exactly.",
)
def basket_part_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Opt r15 (guide §2.4): `items` feeds n_orders, part_freq and both
    # pair-join sides — un-staged, the lineitem scan + DISTINCT ran
    # five times (plans/r15/basket_part_lift_scan1.txt). One lazy
    # checkpoint of the compact (order, part) table.
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = items.agg(F.count_distinct("l_orderkey").alias("n"))
    part_freq = items.groupBy("l_partkey").agg(F.count("*").alias("f"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("together"))
        .where(F.col("together") >= 3)
    )
    fa = part_freq.select(F.col("l_partkey").alias("part_a"), F.col("f").alias("fa"))
    fb = part_freq.select(F.col("l_partkey").alias("part_b"), F.col("f").alias("fb"))
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("together").cast("bigint").alias("together"),
            (F.round((F.col("together").cast("double") * F.col("n")
                / (F.col("fa") * F.col("fb").cast("double"))) * 1000000).cast("bigint") / 1000000.0).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                 AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, COUNT(*) AS len FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id
    """,
    doc="Longest consecutive-day activity streak per user — the classic "
    "gaps-and-islands via the day-minus-row_number trick (consecutive "
    "days share a constant difference, so the difference IS the island "
    "key — one window, no self-join). Retention analytics' engagement "
    "sibling: one distinct, one window by user, two aggregates; per-user "
    "window state is that user's active-day list, bounded by the "
    "calendar.",
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day")
    ).distinct()
    isl = days.withColumn(
        "grp",
        F.col("day")
        - F.row_number().over(Window.partitionBy("user_id").orderBy("day")),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    trans AS (
        SELECT event_type AS src, nxt AS dst, COUNT(*) AS cnt
        FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
    outdeg AS (SELECT src, SUM(cnt) AS tot FROM trans GROUP BY src)
    SELECT t.src, t.dst, t.cnt,
           (CAST(ROUND((CAST(t.cnt AS DOUBLE) / CAST(o.tot AS DOUBLE)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS p
    FROM trans t JOIN outdeg o ON o.src = t.src
    """,
    doc="First-order Markov transition matrix over per-user event "
    "journeys: LEAD over (user, time) gives consecutive event pairs "
    "(tie-broken by event_id), then transition counts and row-normalized "
    "probabilities — the user-journey model behind next-action "
    "prediction and funnel-leak localization. One window pass "
    "partitioned by user (events stay in their user's partition), one "
    "25-cell aggregate; integer-count ratios make the probabilities "
    "engine-exact.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").alias("cnt"))
    outdeg = trans.groupBy("src").agg(F.sum("cnt").alias("tot"))
    return trans.join(outdeg, "src").select(
        "src", "dst", "cnt",
        (F.round((F.col("cnt").cast("double") / F.col("tot").cast("double")) * 1000000).cast("bigint") / 1000000.0).alias("p"),
    )


@register(
    "survival_kaplan_meier",
    # Product-limit estimator as an ORDERED fold: survival multipliers
    # (1 - d/n) are rounded to 6 dp first (integer-derived, identical in
    # both engines), then multiplied in day order — same IEEE sequence
    # both sides, so the survival curve hash-verifies exactly.
    oracle="""
    WITH life AS (
        SELECT user_id,
               CAST(FLOOR((epoch(MAX(ts)) - epoch(MIN(ts))) / 86400) AS BIGINT)
                   AS days,
               CAST(MAX(ts) < (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
                   AS INT) AS churned
        FROM events GROUP BY user_id),
    risk AS (
        SELECT days AS t,
               SUM(churned) AS d,
               (SELECT COUNT(*) FROM life l2 WHERE l2.days >= l1.days) AS n
        FROM life l1 GROUP BY days),
    mult AS (
        SELECT t, d, n,
               (CAST(ROUND((1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS m
        FROM risk),
    curve AS (
        SELECT t1.t, t1.d, t1.n,
               list_reduce(
                 list_prepend(CAST(1.0 AS DOUBLE),
                              (SELECT list(m ORDER BY t) FROM mult t2
                               WHERE t2.t <= t1.t)),
                 (acc, x) -> acc * x) AS surv
        FROM mult t1)
    SELECT t AS day, CAST(d AS BIGINT) AS churned,
           CAST(n AS BIGINT) AS at_risk,
           CAST(ROUND(surv * 1000000) AS BIGINT) AS survival_e6
    FROM curve
    """,
    doc="Kaplan-Meier product-limit survival curve over user lifetimes "
    "(days between first and last event; users still active in the "
    "final week are right-CENSORED — they leave the risk set without a "
    "churn event, the defining subtlety of survival analysis). "
    "S(t) = prod over t_i <= t of (1 - d_i/n_i) as an ordered fold of "
    "6dp-rounded multipliers — engine-exact. Risk-set counts via a "
    "cumulative window; state is one row per distinct lifetime day.",
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    life = ev.groupBy("user_id").agg(
        F.floor((F.max(ts_us) - F.min(ts_us)) / F.lit(86400_000_000)).alias("days"),
        F.max(ts_us).alias("last_us"),
    )
    horizon = ev.agg(
        (F.max(ts_us) - F.lit(7 * 86400_000_000)).alias("cutoff")
    )
    life = life.crossJoin(F.broadcast(horizon)).select(
        "days", (F.col("last_us") < F.col("cutoff")).cast("int").alias("churned")
    )
    total = life.count  # noqa: B023  (unused; kept lazy)
    risk = life.groupBy(F.col("days").alias("t")).agg(
        F.sum("churned").alias("d"), F.count("*").alias("g")
    )
    w_at_risk = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mult = risk.select(
        "t", "d",
        F.sum("g").over(w_at_risk).alias("n"),
    ).select(
        "t", "d", "n",
        (F.round((F.lit(1.0) - F.col("d").cast("double") / F.col("n").cast("double")) * 1000000).cast("bigint") / 1000000.0).alias("m"),
    )
    w_curve = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = mult.select(
        "t", "d", "n",
        F.aggregate(
            F.collect_list(F.struct("t", "m")).over(w_curve),
            F.lit(1.0),
            lambda acc, s: acc * s["m"],
        ).alias("surv"),
    )
    return curve.select(
        F.col("t").alias("day"),
        F.col("d").cast("bigint").alias("churned"),
        F.col("n").cast("bigint").alias("at_risk"),
        # integer micro-probability OUTPUT (r7 VERDICT item 2)
        F.round(F.col("surv") * 1000000).cast("bigint").alias("survival_e6"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

_RFM_TAIL = """
    , scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_c,
               6 - NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary_c, o_custkey) AS m_score
        FROM cust
    ), labeled AS (
        SELECT *,
               CASE
                 WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                   THEN 'champions'
                 WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
                 WHEN r_score >= 4 AND f_score <= 2 THEN 'new_promising'
                 WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                 ELSE 'core'
               END AS segment
        FROM scored
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(frequency) AS BIGINT) AS total_orders,
           CAST(SUM(monetary_c) AS BIGINT) AS total_monetary_c,
           CAST(ROUND(CAST(SUM(monetary_c) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS avg_monetary_c,
           CAST(MIN(r_score * 100 + f_score * 10 + m_score) AS BIGINT)
               AS min_rfm,
           CAST(MAX(r_score * 100 + f_score * 10 + m_score) AS BIGINT)
               AS max_rfm
    FROM labeled GROUP BY segment
"""

_RFM_SPARK = (
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(FLOOR((unix_timestamp(g.maxd) - unix_timestamp(MAX(o_orderdate)))
                    / 86400) AS BIGINT) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS monetary_c
        FROM orders
        CROSS JOIN (SELECT MAX(o_orderdate) AS maxd FROM orders) g
        GROUP BY o_custkey, g.maxd
    )
"""
    + _RFM_TAIL
)

_RFM_DUCK = (
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(FLOOR((epoch(g.maxd) - epoch(MAX(o_orderdate)))
                    / 86400) AS BIGINT) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS monetary_c
        FROM orders
        CROSS JOIN (SELECT MAX(o_orderdate) AS maxd FROM orders) g
        GROUP BY o_custkey, g.maxd
    )
"""
    + _RFM_TAIL
)


@register(
    "customer_rfm_segments",
    oracle=_RFM_DUCK,
    doc="RFM segmentation: per-customer recency (days before the corpus "
    "max order date), frequency, and exact-DECIMAL monetary cents, each "
    "NTILE(5)-scored with deterministic customer-id tie-breaks, then "
    "bucketed into the five classic actionability segments (champions / "
    "at-risk-loyal / new-promising / hibernating / core). Monetary stays "
    "in integer cents end to end (round-1 DECIMAL price rule). Scale "
    "note: global NTILE is a single ordered pass over CUSTOMERS (already "
    "three orders of magnitude smaller than orders); at extreme customer "
    "counts the scores would come from approx-quantile thresholds "
    "instead — the sketch_quantile_mergeable building block.",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RFM_SPARK)


# ---------------------------------------------------------------------------
# Pareto / ABC inventory classification
# ---------------------------------------------------------------------------

_ABC_SQL = """
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000
                   AS BIGINT) AS rev_e4
        FROM lineitem GROUP BY l_partkey
    ), ranked AS (
        SELECT l_partkey, rev_e4,
               CAST(SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum,
               CAST(SUM(rev_e4) OVER () AS BIGINT) AS tot,
               ROW_NUMBER() OVER (ORDER BY rev_e4 DESC, l_partkey) AS rn
        FROM rev
    ), classed AS (
        SELECT l_partkey, rev_e4, cum, tot, rn,
               CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                    WHEN cum * 10 <= tot * 9 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4,
           CAST(ROUND(CAST(SUM(rev_e4) AS DOUBLE) / MAX(tot) * 1000000)
               AS BIGINT) AS share_e6,
           CAST(MIN(rn) AS BIGINT) AS first_rank,
           CAST(MAX(rn) AS BIGINT) AS last_rank
    FROM classed GROUP BY abc_class
"""


@register(
    "inventory_pareto_abc",
    oracle=_ABC_SQL,
    doc="Pareto / ABC classification of parts by net revenue: exact "
    "DECIMAL revenue quantized to 1e-4 integers, a running-share window "
    "ordered by revenue (deterministic part-id tie-break), and the "
    "70/90% class boundaries evaluated as INTEGER cross-multiplications "
    "(cum*10 <= tot*7) so classification never touches a float. One "
    "shared Spark/DuckDB template. The ordered pass runs over PARTS "
    "(the aggregate), not line items; at extreme part counts the "
    "boundaries would come from a quantile sketch over part revenues, "
    "same as the RFM note.",
)
def inventory_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_ABC_SQL)


# ---------------------------------------------------------------------------
# Rolling active users (DAU / WAU / MAU + stickiness)
# ---------------------------------------------------------------------------
# The exact rolling-distinct problem, solved WITHOUT a windowed
# COUNT(DISTINCT) (not partial-aggregable) and WITHOUT a day x trailing-window
# self-join (w-fold row blowup): each user's active days merge into covered
# INTERVALS ([a, a+w-1] unioned; gaps <= w-1 fuse), every interval becomes a
# +1/-1 diff pair, and the rolling active count is the running sum of diffs
# over the day spine — the sweep-line/difference-array trick. Shuffles carry
# (user, day) distinct pairs and day-sized diff aggregates; the final cumsum
# runs over the ~30-row spine.

_AU_CORE = """
    , ud AS (
        SELECT DISTINCT user_id, day FROM activity
    ), dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), gaps7 AS (
        SELECT user_id, day,
               CASE WHEN day - LAG(day) OVER (PARTITION BY user_id
                        ORDER BY day) <= 6 THEN 0 ELSE 1 END AS brk
        FROM ud
    ), isl7 AS (
        SELECT user_id, day,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS isl
        FROM gaps7
    ), iv7 AS (
        SELECT user_id, isl, MIN(day) AS s, MAX(day) + 7 AS e
        FROM isl7 GROUP BY user_id, isl
    ), diffs7 AS (
        SELECT day, CAST(SUM(delta) AS BIGINT) AS delta FROM (
            SELECT s AS day, 1 AS delta FROM iv7
            UNION ALL SELECT e AS day, -1 FROM iv7
        ) d GROUP BY day
    ), gaps30 AS (
        SELECT user_id, day,
               CASE WHEN day - LAG(day) OVER (PARTITION BY user_id
                        ORDER BY day) <= 29 THEN 0 ELSE 1 END AS brk
        FROM ud
    ), isl30 AS (
        SELECT user_id, day,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS isl
        FROM gaps30
    ), iv30 AS (
        SELECT user_id, isl, MIN(day) AS s, MAX(day) + 30 AS e
        FROM isl30 GROUP BY user_id, isl
    ), diffs30 AS (
        SELECT day, CAST(SUM(delta) AS BIGINT) AS delta FROM (
            SELECT s AS day, 1 AS delta FROM iv30
            UNION ALL SELECT e AS day, -1 FROM iv30
        ) d GROUP BY day
    ), rolled AS (
        SELECT sp.day,
               COALESCE(d1.dau, CAST(0 AS BIGINT)) AS dau,
               CAST(SUM(COALESCE(d7.delta, 0)) OVER (ORDER BY sp.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS wau,
               CAST(SUM(COALESCE(d30.delta, 0)) OVER (ORDER BY sp.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS mau
        FROM spine sp
        LEFT JOIN dau d1 ON sp.day = d1.day
        LEFT JOIN diffs7 d7 ON sp.day = d7.day
        LEFT JOIN diffs30 d30 ON sp.day = d30.day
    )
    SELECT day, dau, wau, mau,
           CAST(ROUND(CAST(dau AS DOUBLE) / mau * 1000000) AS BIGINT)
               AS stickiness_e6
    FROM rolled
"""

# Spark side reads the STAGED distinct-(user, day) temp view: the CORE
# references the activity set from three consumers (dau + the two island
# passes), and Spark inlines WITH-chains per reference — un-staged, the
# events scan + distinct shuffle ran three times (observed in the plan).
# The localCheckpoint truncates lineage so each reference re-reads the
# materialized pairs instead. DuckDB materializes CTEs, so the oracle
# keeps the single-statement form.
_AU_SPARK = (
    """
    WITH activity AS (
        SELECT user_id, day FROM au_user_days
    ), bounds AS (
        SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM activity
    ), spine AS (
        SELECT explode(sequence(b.dmin, b.dmax)) AS day FROM bounds b
    )
"""
    + _AU_CORE
)

_AU_DUCK = (
    """
    WITH activity AS (
        SELECT user_id,
               CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events
    ), bounds AS (
        SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM activity
    ), spine AS (
        SELECT UNNEST(generate_series(b.dmin, b.dmax)) AS day FROM bounds b
    )
"""
    + _AU_CORE
)


@register(
    "events_active_users_rolling",
    oracle=_AU_DUCK,
    doc="Exact DAU / trailing-7-day WAU / trailing-30-day MAU and "
    "DAU/MAU stickiness per day — the product-analytics headline "
    "metrics — via the sweep-line difference-array decomposition: each "
    "user's active days fuse into covered intervals (gap <= w-1 merges), "
    "every interval emits a +1/-1 diff pair, and rolling actives are the "
    "running sum of day-aggregated diffs over the dense day spine. No "
    "windowed COUNT(DISTINCT) (not partial-aggregable) and no day x "
    "window self-join (w-fold blowup): shuffles carry (user, day) pairs "
    "and day-sized diffs; the cumsum runs over ~30 spine rows. "
    "Cross-checked against a brute-force trailing-window recompute in "
    "tests.",
)
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        )
        .distinct()
        .localCheckpoint()  # 3 CORE consumers; see _AU_SPARK note
    )
    ud.createOrReplaceTempView("au_user_days")
    return spark.sql(_AU_SPARK)


# ---------------------------------------------------------------------------
# Top user journeys (3-step path mining)
# ---------------------------------------------------------------------------

_PATHS_SQL = """
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               LEAD(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS e2,
               LEAD(event_type, 2) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS e3
        FROM events
    ), paths AS (
        SELECT concat(e1, '>', e2, '>', e3) AS path
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM paths GROUP BY path
    ORDER BY n_occurrences DESC, path LIMIT 10
"""


@register(
    "events_path_topk",
    oracle=_PATHS_SQL,
    doc="Top-10 three-step user journeys (path mining, the Sankey-diagram "
    "feed): two LEADs over each user's time-ordered stream (event_id "
    "tie-break), path strings counted corpus-wide. One window pass "
    "partitioned by user + one path-keyed aggregate — at 100 TB the "
    "shuffle carries 125 distinct path keys with partial counts. One "
    "shared Spark/DuckDB template.",
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_PATHS_SQL)
