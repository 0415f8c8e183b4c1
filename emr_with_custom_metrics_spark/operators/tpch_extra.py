"""Remaining TPC-H query shapes (Q7, Q8, Q9, Q11, Q12, Q13, Q15, Q17, Q19,
Q22), adapted to the driver's TPC-H-ish schema.

The reference job (`spark_converter.py:20-28`) is a single-table
count — the full TPC-H join/agg repertoire is the "grown-up" coverage the
engine needs (SURVEY.md §2A.1 "Joins", "Aggregations"). Adaptations forced
by TESTDATA.md's schema, documented per query:

* no ``partsupp`` → Q9's supplycost becomes a deterministic fraction of
  ``p_retailprice``; Q11's stock value is computed from lineitem revenue.
* no ``l_shipmode`` / ``l_receiptdate`` / ``l_commitdate`` → Q12's "late"
  predicate becomes ship-lag > 90 days against ``o_orderdate``.
* no ``c_phone`` → Q22's country code becomes ``c_nationkey % 5``.

Scale posture: every dim side (nation/region/supplier/part) carries an
explicit ``F.broadcast`` — at 100 TB those stay KB–MB while the fact side
grows, so the only shuffles left are the fact-side aggregations. Global
scalars (Q11's threshold, Q15's max, Q22's mean) are computed as 1-row
aggregates and re-attached via ``crossJoin(F.broadcast(...))`` — never
collected driver-side (the ``text_logfreq_score`` lesson, VERDICT r1).

Float-hash discipline (registry docstring): money sums run in
DECIMAL(12,2) and surface as DOUBLE; averages are expressed as
exact-decimal-sum / count so both engines derive the identical double.
``l_quantity`` is integral-valued, so its AVG is exact in ieee754 and safe
to compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register

# exact fixed-point revenue term used by most TPC-H aggregates.
# Column construction needs a live SparkContext (classic PySpark routes
# expressions through the JVM), so this must stay lazy — modules import at
# registry load, before any session exists.
def _rev_dec():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(12,2)") - F.col("l_discount").cast("decimal(12,2)")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"
)


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               {_REV_SQL} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 23:59:59'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by ship "
    "year. Both nation dims broadcast; the nation filter prunes the fact "
    "rows before the orders⋈customer join.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01 00:00:00", "1997-12-31 23:59:59")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST((CAST(ROUND((SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                      / SUM(volume)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST({_REV_SQL} AS DOUBLE) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 23:59:59'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share inside a region, per "
    "order year — conditional aggregation over a 7-table join with every "
    "dim broadcast. Ratio of decimal-exact sums → deterministic double.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1995-01-01 00:00:00", "1996-12-31 23:59:59")
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _rev_dec().cast("double")
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (F.round((F.sum(nation_vol) / F.sum("volume")) * 1000000).cast("bigint") / 1000000.0).cast("double").alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               {_REV_SQL}
                 - CAST(0.6 * p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year. "
    "Adaptation: no partsupp table, so supply cost is the deterministic "
    "0.6·p_retailprice. p_name LIKE filter pushes into the broadcast dim.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev_dec() - (F.lit(0.6) * F.col("p_retailprice")).cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q11_part_value_share",
    oracle="""
    WITH pv AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS value_dec
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(value_dec AS DOUBLE)
          > (SELECT CAST(SUM(value_dec) AS DOUBLE) * 1.6 / COUNT(*) FROM pv)
    """,
    doc="TPC-H Q11 shape: parts whose revenue exceeds 1.6× the average "
    "part revenue. Adaptation: no partsupp, value is lineitem revenue; the "
    "threshold is relative to the average (scale-invariant — a fixed "
    "share-of-total fraction empties out as the part count grows). The "
    "1-row global aggregate re-attaches via broadcast cross join — no "
    "driver collect, no second shuffle. Exact decimal sums cast to double "
    "before the multiply, so both engines derive the identical threshold.",
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).alias("value_dec")
    )
    total = pv.agg(
        (F.sum("value_dec").cast("double") * F.lit(1.6) / F.count("*")).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: priority-class line counts over late shipments. "
    "Adaptation: no l_shipmode/l_receiptdate — 'late' is ship-lag > 90 "
    "days vs o_orderdate (a non-equi predicate evaluated post-join).",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: histogram of per-customer order counts including "
    "zero — the left join keeps orderless customers, COUNT(col) skips the "
    "null-extended rows, and a second aggregation folds to the histogram.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_dec = (SELECT MAX(total_revenue_dec) FROM revenue)
    """,
    doc="TPC-H Q15 shape: supplier(s) with max quarterly revenue. The "
    "1-row MAX re-attaches via broadcast cross join (exact decimal "
    "equality — safe); supplier dim broadcasts onto the winners.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_dec()).alias("total_revenue_dec")
    )
    best = revenue.agg(F.max("total_revenue_dec").alias("best_dec"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue_dec") == F.col("best_dec"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue_dec").cast("double").alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS agg_pk, 0.5 * AVG(l_quantity) AS qty_limit
        FROM lineitem GROUP BY l_partkey
    ) pq ON agg_pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_limit
    """,
    doc="TPC-H Q17 shape: revenue from below-half-average-quantity line "
    "items. The per-part AVG joins back to the fact (no correlated "
    "subquery re-scan); l_quantity is integral so AVG is ieee-exact and "
    "the threshold compare is engine-stable.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    pq = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("agg_pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: three-way disjunction of conjunctive ranges "
    "across both join sides. Catalyst splits the OR into per-side "
    "pushable conjuncts (brand/size prune the part scan, quantity range "
    "prunes lineitem) before evaluating the residual post-join.",
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    clause = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(clause)
        .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
    )


@register(
    "q22_inactive_customers",
    oracle="""
    WITH pos AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey % 5 AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey % 5
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no urgent "
    "orders, bucketed. Adaptations: country code is c_nationkey % 5 (no "
    "c_phone), and the inactivity predicate is 'no 1-URGENT order' — in "
    "this dataset every customer has at least one order, so the literal "
    "Q22 anti-join would be vacuously empty. Global mean = "
    "exact-decimal-sum / count (identical double in both engines); the "
    "anti test is a left-anti join on the filtered orders, never NOT IN.",
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double").alias("totacctbal"),
        )
    )


_Q16 = """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 5, 9, 13, 17)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""


@register(
    "sql_q16_supplier_cnt",
    oracle=_Q16,
    doc="TPC-H Q16 shape via the SQL entry point: distinct-supplier counts "
    "per part class with a NOT IN exclusion subquery. Adaptation: the "
    "part-supplier relation is lineitem (no partsupp); 'complaint' "
    "suppliers are the negative-balance ones. s_suppkey is non-null so "
    "the null-aware NOT IN compiles to a broadcast anti join, and "
    "COUNT(DISTINCT) runs as the two-phase expand aggregate.",
)
def sql_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.operators.extended import _sql

    return _sql(spark, sf_dir, _Q16, ("lineitem", "part", "supplier"))


_Q20 = """
    SELECT s_name, CAST((CAST(ROUND((s_acctbal) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS DOUBLE) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
    )
    AND s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    )
"""


@register(
    "sql_q20_excess_shippers",
    oracle=_Q20,
    doc="TPC-H Q20 shape via the SQL entry point: nested IN-subqueries — "
    "an aggregated HAVING subquery (suppliers who moved >100 units of "
    "red parts in 1996) intersected with a dim-filter subquery. "
    "Adaptation: shipped quantity stands in for partsupp availability. "
    "Both IN's compile to semi joins; the nation one broadcasts.",
)
def sql_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.operators.extended import _sql

    return _sql(spark, sf_dir, _Q20, ("supplier", "lineitem", "part", "nation"))


_Q21 = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
"""


@register(
    "sql_q21_waiting_supplier",
    oracle=_Q21,
    doc="TPC-H Q21 shape via the SQL entry point: the classic "
    "EXISTS + NOT EXISTS pair — suppliers whose line item shipped last "
    "in a multi-supplier finished order. Adaptation: 'kept waiting' is "
    "latest l_shipdate in the order (no receipt/commit dates). Both "
    "correlated subqueries decorrelate to joins on l_orderkey "
    "(semi + anti), so the plan is three hash joins on the same key — "
    "one shuffle of lineitem reused across them.",
)
def sql_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.operators.extended import _sql

    return _sql(spark, sf_dir, _Q21, ("supplier", "lineitem", "orders"))


# Spark 4 / modern-ANSI surface: GROUP BY ALL + ORDER BY ALL — the
# analyst-ergonomics form (every non-aggregate select item becomes a
# grouping key; ORDER BY ALL makes the emitted order total and
# deterministic). Both engines resolve the same way; the result is the
# q1-style pricing rollup with the keys inferred instead of repeated.
_GROUP_BY_ALL = """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100)
               AS BIGINT) AS disc_rev_c,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_quantity < 45
    GROUP BY ALL
"""


@register(
    "sql_group_by_all",
    oracle=_GROUP_BY_ALL,
    doc="GROUP BY ALL (Spark 4 / modern ANSI ergonomics): grouping keys "
    "inferred from the non-aggregate select items — the q1-shaped "
    "pricing rollup without repeating the key list; identical "
    "resolution in Spark and DuckDB, one shared template. Plans as the "
    "same partial+final hash aggregation as an explicit GROUP BY.",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emr_with_custom_metrics_spark.operators.extended import _sql

    return _sql(spark, sf_dir, _GROUP_BY_ALL, ("lineitem",))
