"""Relational core: projections, filters, aggregations, sort/limit.

The reference's only relational operator is a group-by count
(reference scripts/spark_converter.py:28, op A1 in SURVEY.md §2A); every
other category here is an explicit absence filled per SURVEY.md §2A.1.
All ops are declarative DataFrame calls → Catalyst provides pushdown,
pruning, partial aggregation, and whole-stage codegen (SURVEY.md §4.3).

Scale notes per operator are inline. The common theme: aggregations are
hash-aggregates with map-side partial combine (shuffle carries only group
keys × partial states, not rows), and every filter/projection lands in the
parquet scan via pushdown — verified in tests by inspecting the formatted
plan for PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


# ---------------------------------------------------------------------------
# Flagship: the reference job's semantics transplanted to the star schema.
# Reference op A1: df.groupBy('product_category').count()
# (reference scripts/spark_converter.py:28).
# ---------------------------------------------------------------------------
@register(
    "a1_group_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Reference A1 group-by count on a categorical key.",
)
def a1_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partial+final HashAggregate; the shuffle carries 5 groups, not 15k rows.
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Projection + filter (SURVEY.md §2A.1 rows 1-2: absent in the reference).
# ---------------------------------------------------------------------------
@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS net_price,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))
                      * (1 + CAST(l_tax AS DECIMAL(12,2))), 2) AS DOUBLE) AS charged
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
    doc="Filter + pruned projection + computed columns; predicates push to "
    "the scan. Price math in exact DECIMAL: double-rounding a 6-decimal "
    "product at scale 2 lands on .xx5 midpoints where engines disagree.",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    net_decimal = ep * (
        F.lit(1).cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)")
    )
    charged_decimal = net_decimal * (
        F.lit(1).cast("decimal(12,2)") + F.col("l_tax").cast("decimal(12,2)")
    )
    return (
        li.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            # DECIMAL-exact rounding stays two-arg: ROUND on DECIMAL is
            # digit-exact on both engines (round-1 note 1), unlike doubles
            F.round(net_decimal, 2).cast("double").alias("net_price"),
            F.round(charged_decimal, 2).cast("double").alias("charged"),
        )
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus LIKE 'F%'
      AND o_custkey IS NOT NULL
    """,
    doc="isin / between / like / null predicates (SURVEY.md §2A.1 filters row).",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .where(F.col("o_totalprice").between(1000, 50000))
        .where(F.col("o_orderstatus").like("F%"))
        .where(F.col("o_custkey").isNotNull())
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Aggregations beyond count (SURVEY.md §2A.1 "Aggregations beyond count").
# TPC-H Q1 shape: the canonical scan-heavy partial-aggregate query.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           (CAST(ROUND((SUM(l_quantity)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_qty,
           (CAST(ROUND((SUM(l_extendedprice)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           (CAST(ROUND((AVG(l_quantity)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS avg_qty,
           (CAST(ROUND((AVG(l_extendedprice)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS avg_price,
           (CAST(ROUND((AVG(l_discount)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: wide aggregate over the largest fact table.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One scan, 8 aggregates, ≤6 groups: shuffle traffic is a handful of rows
    # no matter the scale factor. Column pruning drops the unused 4 columns.
    li = load_table(spark, sf_dir, "lineitem")
    # Exact decimal for the product sums: a double-accumulated sum of
    # 6-decimal products rounds unpredictably at .005 midpoints.
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = ep * (one - F.col("l_discount").cast("decimal(12,2)"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.round((F.sum("l_quantity")) * 100).cast("bigint") / 100.0).alias("sum_qty"),
            (F.round((F.sum("l_extendedprice")) * 100).cast("bigint") / 100.0).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (one + F.col("l_tax").cast("decimal(12,2)"))).cast("double").alias("sum_charge"),
            (F.round((F.avg("l_quantity")) * 10000).cast("bigint") / 10000.0).alias("avg_qty"),
            (F.round((F.avg("l_extendedprice")) * 10000).cast("bigint") / 10000.0).alias("avg_price"),
            (F.round((F.avg("l_discount")) * 10000).cast("bigint") / 10000.0).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           (CAST(ROUND((SUM(value)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_value,
           (CAST(ROUND((AVG(value)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS avg_value,
           (CAST(ROUND((MIN(value)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS min_value,
           (CAST(ROUND((MAX(value)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS max_value,
           (CAST(ROUND((STDDEV_SAMP(value)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS sd_value,
           (CAST(ROUND((quantile_cont(value, 0.5)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS median_value
    FROM events GROUP BY event_type
    """,
    doc="Statistical aggregate battery incl. exact distinct + interpolated median.",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # count_distinct expands to a two-phase aggregate; percentile is exact
    # (interpolated), matching DuckDB quantile_cont. At 100 TB swap for
    # approx_count_distinct / percentile_approx — kept exact here because the
    # oracle contract demands hash equality.
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        (F.round((F.sum("value")) * 100).cast("bigint") / 100.0).alias("sum_value"),
        (F.round((F.avg("value")) * 10000).cast("bigint") / 10000.0).alias("avg_value"),
        (F.round((F.min("value")) * 100).cast("bigint") / 100.0).alias("min_value"),
        (F.round((F.max("value")) * 100).cast("bigint") / 100.0).alias("max_value"),
        (F.round((F.stddev_samp("value")) * 10000).cast("bigint") / 10000.0).alias("sd_value"),
        (F.round((F.percentile("value", 0.5)) * 10000).cast("bigint") / 10000.0).alias("median_value"),
    )


@register(
    "agg_approx_distinct",
    # HLL++ estimates aren't SQL-reproducible across engines, so the oracle
    # asserts the estimate is WITHIN the algorithm's error bound of DuckDB's
    # exact COUNT(DISTINCT): both sides emit (event_type, exact_users,
    # within_bounds=true) and hash-match iff every group's estimate lands
    # inside 5×rsd (rsd=0.02 ⇒ ±10%; HLL++ at that rsd is ~±3σ=6% — 5×
    # gives deterministic headroom without masking a broken sketch).
    # rsd=0.02, not 0.01: register arrays grow ~(1/rsd)², and measured cost
    # at rsd=0.01 was 3.5× for one extra accuracy bit nothing here needs.
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bounds
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HLL++): the 100 TB-scale path for cardinality, "
    "oracled via an error-bound check against exact COUNT(DISTINCT).",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(1), F.col("exact_users") * 0.10)
        ).alias("within_bounds"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, (CAST(ROUND((SUM(l_quantity)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (SURVEY.md §2A.1 aggregations row).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), (F.round((F.sum("l_quantity")) * 100).cast("bigint") / 100.0).alias("sum_qty")
    )


@register(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, (CAST(ROUND((SUM(o_totalprice)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two categorical dimensions.",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), (F.round((F.sum("o_totalprice")) * 100).cast("bigint") / 100.0).alias("sum_price")
    )


@register(
    "distinct_values",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="DISTINCT = hash-aggregate on the full row.",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY.md §2A.1 "Sort / limit / top-k").
# ---------------------------------------------------------------------------
@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject — per-partition heap "
    "+ driver merge, no global sort. Deterministic via o_orderkey tiebreak.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@register(
    "ordered_projection",
    oracle="""
    SELECT r_regionkey, r_name FROM region ORDER BY r_name
    """,
    doc="Full sort on a tiny dim (range-partitioned sort at scale).",
)
def ordered_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    return r.select("r_regionkey", "r_name").orderBy("r_name")


@register(
    "agg_approx_top_k",
    # Sketch contents aren't SQL-reproducible; the oracle pattern follows
    # agg_approx_distinct: both sides emit the EXACT top-10 tokens (ties
    # broken by token so rank is total) and a within_bounds flag that is
    # TRUE iff the sketch's estimate for that token is exact — with
    # maxItemsTracked (10000) far above this vocabulary, approx_top_k
    # degenerates to exact counting, so any FALSE means a broken sketch
    # integration, not sketch noise. At a 100 TB vocabulary the tracked
    # set saturates and the flag's tolerance would widen to the sketch's
    # documented error — the pattern stays the same.
    oracle="""
    WITH tok AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ), exact AS (
        SELECT token, COUNT(*) AS exact_cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rnk
        FROM tok GROUP BY token
    )
    SELECT CAST(rnk AS INT) AS rnk, token, exact_cnt, TRUE AS within_bounds
    FROM exact WHERE rnk <= 10
    """,
    doc="approx_top_k sketch (Spark 4) for heavy hitters — the streaming-"
    "friendly counterpart of text_heavy_hitters' exact aggregation, "
    "oracled via an exactness check against the true top-10.",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    # ask the sketch for 50 so boundary ties at exact-rank 10 are always
    # inside the returned list (the comparison set stays the exact top-10)
    sketch = (
        tok.agg(F.expr("approx_top_k(token, 50, 10000)").alias("top"))
        .select(F.explode("top").alias("e"))
        .select(F.col("e.item").alias("token"), F.col("e.count").alias("est_cnt"))
    )
    w = Window.orderBy(F.col("exact_cnt").desc(), "token")
    exact = (
        tok.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 10)
    )
    return exact.join(sketch, "token", "left").select(
        "rnk",
        "token",
        "exact_cnt",
        (F.coalesce("est_cnt", F.lit(-1)) == F.col("exact_cnt")).alias("within_bounds"),
    )
