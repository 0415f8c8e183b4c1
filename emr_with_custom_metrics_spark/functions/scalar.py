"""Scalar function surface: string / date / math / JSON.

The reference performs these in bash: jq dotted-path JSON projection (op M2,
reference scripts/custom-metrics.sh:10-11), bc fixed-point arithmetic (op M3,
custom-metrics.sh:12), and grep/split string extraction (op M4,
custom-metrics.sh:8). Here they are JVM-side Catalyst expressions inside
whole-stage codegen — no Python in the row path (SURVEY.md §2A.1 scalar row).

Parity notes vs the DuckDB oracle are inline (regex dialect, weekday
numbering, bc's TRUNCATING scale=2 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name,
           REPLACE(c_name, 'Customer#', '') AS name_digits,
           CAST(REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS BIGINT) AS key_from_name,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
    FROM customer WHERE c_custkey <= 300
    """,
    doc="String battery: case, substring, length, concat, replace, regex "
    "extract (op M4 in-engine), padding.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_replace("c_name", "Customer#", "").alias("name_digits"),
        F.regexp_extract("c_name", "([0-9]+)", 1).cast("bigint").alias("key_from_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
           CAST(ISODOW(o_orderdate) - 1 AS INTEGER) AS order_weekday,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
             AS days_since_epoch_start,
           CAST(STRFTIME(o_orderdate, '%Y-%m') AS VARCHAR) AS order_ym
    FROM orders WHERE o_orderkey <= 2000
    """,
    doc="Date battery: parts, weekday (Monday=0 on both engines), trunc, "
    "date arithmetic, formatting. Session tz pinned to UTC by the registry.",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        # Spark weekday(): Monday=0 … Sunday=6; DuckDB isodow: Monday=1 → -1.
        F.weekday("o_orderdate").alias("order_weekday"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (CAST(ROUND((l_extendedprice) * 10) AS BIGINT) / 10.0) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           (CAST(ROUND((SQRT(l_extendedprice)) * 10000) AS BIGINT) / CAST(10000 AS DOUBLE)) AS price_sqrt,
           (CAST(ROUND((POW(1 + l_tax, 2)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS tax_sq,
           (CAST(ROUND((LN(l_extendedprice + 1)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS price_ln,
           (CAST(ROUND((LOG10(l_extendedprice + 1)) * 1000000) AS BIGINT) / CAST(1000000 AS DOUBLE)) AS price_log10,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(l_linenumber % 3 AS INTEGER) AS line_mod3
    FROM lineitem WHERE l_orderkey <= 1500
    """,
    doc="Math battery: rounding, abs, ceil/floor, sqrt/pow/ln/log10, sign, mod.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1500)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round((price) * 10).cast("bigint") / 10.0).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.round((F.sqrt(price)) * 10000).cast("bigint") / 10000.0).alias("price_sqrt"),
        (F.round((F.pow(1 + F.col("l_tax"), 2)) * 1000000).cast("bigint") / 1000000.0).alias("tax_sq"),
        (F.round((F.log(price + 1)) * 1000000).cast("bigint") / 1000000.0).alias("price_ln"),
        (F.round((F.log10(price + 1)) * 1000000).cast("bigint") / 1000000.0).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_linenumber") % 3).alias("line_mod3"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_via_regex
    FROM events WHERE event_id < 3000
    """,
    doc="Dotted-path JSON projection (op M2 in-engine: jq '.clusterMetrics.x' "
    "→ get_json_object) plus the regex fallback the reference used for "
    "jobFlowId (op M4).",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("bigint").alias("k_via_regex"),
    )


@register(
    "json_from_json_struct",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
    FROM events WHERE event_id < 3000
    """,
    doc="Schema-full JSON parse: from_json into a StructType then dotted "
    "field access (vs the oracle's stringly extraction).",
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.select("event_id", "event_type", F.col("p.k").alias("k_typed"))


@register(
    "m3_derived_metric",
    oracle="""
    SELECT event_id,
           FLOOR(value * 100.0 / NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) * 100)
             / 100 AS pct_metric
    FROM events
    WHERE event_id < 5000
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 0
    """,
    doc="Op M3 in-engine: the reference's `bc scale=2; a*100/t` — note bc "
    "TRUNCATES at 2 decimals, so parity uses floor(x*100)/100, not round.",
)
def m3_derived_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 5000)
    k = F.get_json_object("props", "$.k").cast("bigint")
    pct = F.col("value") * 100.0 / k
    return (
        ev.where(k > 0)
        .select(
            "event_id",
            (F.floor(pct * 100) / 100).alias("pct_metric"),
        )
    )


@register(
    "conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'jumbo'
                WHEN o_totalprice >= 50000 THEN 'large'
                WHEN o_totalprice >= 10000 THEN 'medium'
                ELSE 'small' END AS size_band,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final
    FROM orders WHERE o_orderkey <= 3000
    """,
    doc="CASE WHEN ladders (when/otherwise) — constant-folded, codegen'd.",
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 3000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "jumbo")
        .when(F.col("o_totalprice") >= 50000, "large")
        .when(F.col("o_totalprice") >= 10000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
    )


@register(
    "json_variant_battery",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k,
           COUNT(*) AS n_missing_null
    FROM events GROUP BY event_type
    """,
    doc="Spark 4 VARIANT type: props parse once into a variant column, "
    "fields extract via variant_get (typed path access on the binary "
    "variant encoding — the modern engine path for semi-structured "
    "columns, vs per-access get_json_object string re-parsing). "
    "try_variant_get on a missing path must null out for every row "
    "(counted), and the numeric aggregates must match DuckDB's JSON "
    "extraction exactly.",
)
def json_variant_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'int')")
    missing = F.expr("try_variant_get(v, '$.does_not_exist', 'int')")
    return v.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(F.when(missing.isNull(), 1)).alias("n_missing_null"),
    )


@register(
    "scalar_xml_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS xml_priority,
           (CAST(ROUND((o_totalprice) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS xml_price,
           TRUE AS roundtrip_ok
    FROM orders WHERE o_orderkey < 300
    """,
    doc="Column-level XML (Spark 4: to_xml / from_xml as expressions, not "
    "just the file source): each order serializes to an XML fragment and "
    "parses back with an explicit schema; the oracle pins the parsed "
    "fields to the originals, proving the round trip value-exact. The "
    "roundtrip_ok flag additionally checks IN-ENGINE that the parsed "
    "struct equals the source values row by row — the XML text itself "
    "(whitespace, element order) is representation, not data, and is "
    "deliberately not hashed.",
)
def scalar_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    xml = F.to_xml(
        F.struct(
            F.col("o_orderpriority").alias("prio"),
            (F.round((F.col("o_totalprice")) * 100).cast("bigint") / 100.0).alias("price"),
        )
    )
    parsed = F.from_xml(xml, "prio STRING, price DOUBLE")
    return o.select(
        "o_orderkey",
        parsed.getField("prio").alias("xml_priority"),
        parsed.getField("price").alias("xml_price"),
        (
            (parsed.getField("prio") == F.col("o_orderpriority"))
            & (parsed.getField("price") == (F.round((F.col("o_totalprice")) * 100).cast("bigint") / 100.0))
        ).alias("roundtrip_ok"),
    )


@register(
    "json_parse_modes",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN '{"a": ' || CAST(doc_id AS VARCHAR) || ', "b": "x"'
                    ELSE '{"a": ' || CAST(doc_id AS VARCHAR) || ', "b": "x"}'
               END AS j
        FROM documents WHERE doc_id < 500
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parsed,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 5 <> 0 THEN doc_id ELSE 0 END) AS BIGINT)
             AS sum_parsed_a
    FROM raw
    """,
    doc="Malformed-record handling on the JSON ingestion path: every 5th "
    "payload is truncated mid-object; from_json in PERMISSIVE mode (the "
    "default, and the only sane setting for a 100 TB feed where one bad "
    "record must not kill a 6-hour job) yields NULL for the corrupt rows "
    "while clean rows parse — the query counts both populations and "
    "checksums the parsed field, and the oracle reconstructs the exact "
    "corruption pattern from the row-id rule. FAILFAST's throw-on-first "
    "behavior is the test suite's job, not a distributed query's.",
)
def json_parse_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    j = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit('{"a": '), F.col("doc_id").cast("string"), F.lit(', "b": "x"')),
    ).otherwise(
        F.concat(F.lit('{"a": '), F.col("doc_id").cast("string"), F.lit(', "b": "x"}'))
    )
    parsed = F.from_json(j, "a BIGINT, b STRING", {"mode": "PERMISSIVE"})
    withp = d.select("doc_id", parsed.alias("p"))
    return withp.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("p.a").isNotNull().cast("int")).cast("bigint").alias("n_parsed"),
        F.sum(F.col("p.a").isNull().cast("int")).cast("bigint").alias("n_corrupt"),
        F.sum(F.coalesce(F.col("p.a"), F.lit(0))).cast("bigint").alias("sum_parsed_a"),
    )
