"""Joins: inner/left/full/semi/anti, broadcast, non-equi, multi-way.

The reference is a single-table job — joins are an explicit absence
(SURVEY.md §2A.1 "Joins (all kinds)"). Spark-first strategy per join:

* dim⋈fact → ``F.broadcast`` hint on the dim (region/nation/supplier/part
  stay KB-MB sized at any fact scale; broadcast kills the shuffle entirely).
* fact⋈fact → sort-merge on the join key; AQE converts to broadcast or
  splits skewed partitions at runtime.
* semi/anti → left_semi / left_anti join types (never a distinct+inner
  emulation, which shuffles twice).
* non-equi → banded to an equi-join where possible; a raw theta join on
  bounded dims otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers, (CAST(ROUND((SUM(c_acctbal)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Dim⋈fact with explicit broadcast: zero shuffle on the fact side "
    "before aggregation.",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"), (F.round((F.sum("c_acctbal")) * 100).cast("bigint") / 100.0).alias("total_bal"))
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter → two fact joins → top-k. "
    "Filters push below the joins; AQE picks broadcast for the filtered side.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1).cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way join; dims broadcast, facts sort-merge on keys.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1).cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o.o_custkey
    WHERE c_custkey <= 200
    """,
    doc="Left outer against a pre-aggregated side: aggregate-before-join "
    "shrinks the shuffled build side from |orders| rows to |customers| groups.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    per_cust = (
        load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", "c_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="Left-semi join (EXISTS): probe side streams, no duplication, "
    "no post-join distinct.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
           CAST(COALESCE(cn.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(sn.n_supp, 0) AS BIGINT) AS n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
    FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
      ON cn.c_nationkey = sn.s_nationkey
    """,
    doc="Full outer join of two aggregates (coverage comparison).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_cross_dims",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    doc="Cross join — bounded to dims (5×25); a guardrail pattern, never facts.",
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           (CAST(ROUND((SUM(l_quantity)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="TPC-H Q18 shape: pre-aggregated semi-filter (orders over a "
    "quantity threshold) feeding a 3-way join + group — the aggregate runs "
    "BEFORE the join so only qualifying orderkeys shuffle.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).where(F.col("q") > 150)
    ).select("l_orderkey")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(big_orders.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg((F.round((F.sum("l_quantity")) * 100).cast("bigint") / 100.0).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q2_min_per_group_joinback",
    oracle="""
    SELECT n_name, s_suppkey, s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN (SELECT s_nationkey AS mk, MIN(s_acctbal) AS mb
          FROM supplier GROUP BY s_nationkey) m
      ON s_nationkey = m.mk AND s_acctbal = m.mb
    """,
    doc="TPC-H Q2 shape: min-per-group then join back (the 'cheapest "
    "supplier' pattern) — aggregate side broadcasts, no window needed.",
)
def q2_min_per_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    mins = s.groupBy(F.col("s_nationkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(
            F.broadcast(mins),
            (s.s_nationkey == mins.mk) & (s.s_acctbal == mins.min_bal),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS-filtered aggregate — left-semi join then "
    "group; the semi side never duplicates orders.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END)
                / SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional aggregate over a broadcast dim join — "
    "promo revenue share for one month.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(12,2)")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        one - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)")))
                / F.sum(rev)
            )
            .cast("double")
            .alias("promo_share_pct")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20 — "
    "selective fact filters, broadcast nation, TakeOrdered finish.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(12,2)")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        one - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "join_interval_time",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, COUNT(c.event_id) AS n_recent_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts < p.ts
    GROUP BY p.user_id, p.event_id
    """,
    doc="Time-interval join: clicks in the 2 h before each purchase, per "
    "user. The equi component (user_id) bounds fan-out; the range predicate "
    "evaluates inside the join. At extreme per-key volume the next step is "
    "bucketing both sides by time and joining on (key, bucket±1).",
)
def join_interval_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= p.p_ts - F.expr("INTERVAL 2 HOURS"))
            & (c.c_ts < p.p_ts),
            "left",
        )
        .groupBy("user_id", "purchase_id")
        .agg(F.count("click_id").alias("n_recent_clicks"))
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_nationkey
    """,
    doc="Non-equi (theta) join: equi component on nationkey bounds the "
    "per-key fan-out; the range predicate evaluates inside the join.",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .groupBy(s.s_nationkey.alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Skew-hardened equi-join (salting)
# ---------------------------------------------------------------------------
def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salt: int,
) -> DataFrame:
    """Equi-join hardened against a hot left-side key by salting.

    The skewed (probe) side gets a deterministic salt in [0, n_salt) from a
    hash of its full row; the build side is replicated n_salt times with
    every salt value. Joining on (key, salt) splits each hot key's rows
    across n_salt shuffle partitions instead of funnelling them into one
    straggler task — the classic mitigation when AQE's skew-join split
    can't apply (non-sort-merge plans, skew re-introduced by a downstream
    aggregate, or AQE disabled). Cost: the build side is scanned/broadcast
    n_salt× — cheap when the build side is much smaller than the probe
    side, which is exactly the skewed-fact⋈dim-ish shape that needs this.

    The salt is derived (never random) so the plan is deterministic, and
    the join RESULT is salt-invariant either way: every (left row, right
    row) key match still pairs exactly once, because the right replica
    carrying that left row's salt is unique. Dropped from the output.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = l_salted.join(
        r_salted,
        (F.col(left_key) == F.col(right_key)) & (l_salted["_salt"] == r_salted["_salt"]),
    )
    return joined.drop("_salt")


@register(
    "join_skew_salted",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM (SELECT CASE WHEN l_linenumber >= 3 THEN 1 ELSE l_orderkey END AS hk,
                 l_extendedprice
          FROM lineitem) li
    JOIN orders ON o_orderkey = hk
    GROUP BY o_orderpriority
    """,
    doc="Skew-join hardening demo (r5 VERDICT item 5): ~71% of lineitem "
    "rows are remapped onto ONE hot orderkey (the hot-customer shape that "
    "breaks sort-merge joins at 100 TB — a single task gets the whole hot "
    "key), then joined to orders through ``salted_equi_join``: probe rows "
    "salt-split 8 ways, build rows replicated 8×, so the hot key spreads "
    "over 8 tasks. The salt never appears in the result, so the plain "
    "unsalted join is the exact oracle; equality with the unsalted Spark "
    "plan is asserted in tests/test_plan_properties.py.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_linenumber") >= 3, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("hk"),
        "l_extendedprice",
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_equi_join(li, o, "hk", "o_orderkey", n_salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "sql_join_hints",
    oracle="""
    WITH j AS (
        SELECT o.o_orderpriority, COUNT(*) AS n,
               (CAST(ROUND((SUM(l.l_quantity)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS qty
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    )
    SELECT 'broadcast' AS strategy, * FROM j
    UNION ALL SELECT 'merge', * FROM j
    UNION ALL SELECT 'shuffle_hash', * FROM j
    """,
    doc="Join strategy hints (SQL /*+ BROADCAST / MERGE / SHUFFLE_HASH */): "
    "the same logical join executed under all three physical strategies "
    "must produce identical answers — hints steer cost, never semantics. "
    "tests/test_plan_properties.py asserts each hint actually selected "
    "its operator (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin), "
    "because a hint Catalyst quietly ignores is a no-op, not a strategy. "
    "At 100 TB this is the dial for the cases AQE statistics get wrong: "
    "a dim table just over the broadcast threshold, or a pre-sorted "
    "bucketed pair where merge beats hash.",
)
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    parts = [
        spark.sql(
            f"""
            SELECT /*+ {hint} */ '{tag}' AS strategy, o.o_orderpriority,
                   COUNT(*) AS n, (CAST(ROUND((SUM(l.l_quantity)) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS qty
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority
            """
        )
        for tag, hint in (
            ("broadcast", "BROADCAST(o)"),
            ("merge", "MERGE(o)"),
            ("shuffle_hash", "SHUFFLE_HASH(o)"),
        )
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 deterministic half-open account-balance bands [lo, lo+500) derived
    from the lowest-keyed suppliers (bands may overlap — interval semantics,
    not a partition)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.where(F.col("s_suppkey") <= 20).select(
        F.col("s_suppkey").alias("band_id"),
        F.col("s_acctbal").alias("lo"),
        (F.col("s_acctbal") + 500.0).alias("hi"),
    )


@register(
    "join_range_banded",
    oracle="""
    WITH bands AS (
      SELECT s_suppkey AS band_id, s_acctbal AS lo, s_acctbal + 500.0 AS hi
      FROM supplier WHERE s_suppkey <= 20)
    SELECT band_id, COUNT(c_custkey) AS n_in_band,
           COALESCE(CAST(SUM(CAST(c_mktsegment = 'BUILDING' AS INT)) AS BIGINT),
                    0) AS n_building
    FROM bands LEFT JOIN customer
      ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band_id
    """,
    doc="PURE interval join (NO equi key) made shuffle-joinable by "
    "BANDING: the naive form 'customer.acctbal BETWEEN band.lo AND "
    "band.hi' has no equi conjunct, so Spark can only plan "
    "BroadcastNestedLoopJoin — every probe row against every band, the "
    "plan that dies first at 100 TB (or OOMs when neither side fits in "
    "a broadcast). The rewrite quantizes the domain into width-500 "
    "buckets: each band explodes to the buckets it overlaps (ceil(span/"
    "width)+1 rows — bounded because band width is bounded), each "
    "customer row computes ONE bucket, the join becomes an equi-join on "
    "the bucket key (shuffle- or broadcast-hash-joinable, AQE-skew-"
    "splittable), and the exact [lo, hi) predicate re-checks inside. "
    "FLOOR-before-CAST on both engines (the round-2 double->int gotcha). "
    "test_plan_properties asserts the nested-loop operator is GONE from "
    "this plan and present in the naive twin; equality of the two plans "
    "is asserted over the full result.",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _range_bands(spark, sf_dir)
    width = 500.0
    expanded = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("bigint"),
                F.floor(F.col("hi") / width).cast("bigint"),
            )
        ).alias("bucket"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / width).cast("bigint").alias("bucket"),
    )
    hits = expanded.join(c, "bucket").where(
        (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi"))
    )
    return (
        bands.join(hits.select("band_id", "c_custkey", "c_mktsegment"), "band_id", "left")
        .groupBy("band_id")
        .agg(
            F.count("c_custkey").alias("n_in_band"),
            F.coalesce(
                F.sum((F.col("c_mktsegment") == "BUILDING").cast("int")).cast("bigint"),
                F.lit(0),
            ).alias("n_building"),
        )
    )


def join_range_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbanded twin (BroadcastNestedLoopJoin) — kept unregistered as
    the plan-comparison baseline for tests; never the production path."""
    bands = _range_bands(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    return (
        bands.join(
            c,
            (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi")),
            "left",
        )
        .groupBy("band_id")
        .agg(
            F.count("c_custkey").alias("n_in_band"),
            F.coalesce(
                F.sum((F.col("c_mktsegment") == "BUILDING").cast("int")).cast("bigint"),
                F.lit(0),
            ).alias("n_building"),
        )
    )
