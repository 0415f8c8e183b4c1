"""Statistical testing and decomposition operators.

The experimentation tier every metrics engine grows next to its dashboards:
A/B significance testing (Welch's t), categorical independence screening
(chi-square), and classical seasonal decomposition — each expressed so the
entire answer hash-verifies against DuckDB.

Cross-engine determinism recipe (the round-8 rounding discipline):
- Raw measurements quantize to scaled BIGINT at the scan (``ROUND(x * 10^k)``
  to scale 0 — half-away-from-zero on both engines), so every SUM in the
  query is an exact integer aggregation: addition-order-free, safe for
  map-side partial aggregation at any parallelism.
- The closed-form statistics (t, df, chi2 contributions, Cramér's V) are
  then fixed DAGs of IEEE double ops (divide, multiply, sqrt) over those
  exact integers. Each op is correctly rounded, so identical SQL text ⇒
  bit-identical doubles on every engine — the t-test and chi-square
  templates are ONE SQL string run verbatim by both Spark and DuckDB
  (the sketches-module technique).
- Outputs quantize back to BIGINT, so the driver hashes integers only.

Scale posture: the t-test and chi-square are single-pass aggregations whose
post-shuffle state is arm/cell-count-sized (10 rows / 100 cells); the
global-scalar joins (totals, dims) are the broadcast-cross-join pattern
plan-asserted throughout the repo. Seasonal decomposition shuffles one row
per (series, hour) bucket — pre-aggregated density, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from emr_with_custom_metrics_spark.catalog import register_views
from emr_with_custom_metrics_spark.registry import register

# Deterministic 50/50 arm assignment: first md5 nibble of the unit id.
# A pure function of row identity (the sample_stratified precedent), so the
# oracle reproduces the assignment exactly and re-runs are stable.
_ARM = (
    "CASE WHEN (instr('0123456789abcdef', substring(md5(concat('ab|', "
    "CAST(user_id AS STRING))), 1, 1)) - 1) < 8 THEN 'A' ELSE 'B' END"
)

_TTEST_SQL = f"""
    WITH base AS (
        SELECT event_type,
               {_ARM} AS arm,
               CAST(ROUND(value * 1000) AS BIGINT) AS v_e3
        FROM events
    ), arms AS (
        SELECT event_type, arm,
               COUNT(*) AS n,
               CAST(SUM(v_e3) AS BIGINT) AS s1,
               CAST(SUM(v_e3 * v_e3) AS BIGINT) AS s2
        FROM base GROUP BY event_type, arm
    ), stats AS (
        SELECT a.event_type,
               a.n AS n_a, b.n AS n_b,
               (CAST(a.s1 AS DOUBLE) / a.n) / CAST(1000 AS DOUBLE) AS mean_a,
               (CAST(b.s1 AS DOUBLE) / b.n) / CAST(1000 AS DOUBLE) AS mean_b,
               ((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n)
                   / (a.n - 1)) / CAST(1000000 AS DOUBLE) AS var_a,
               ((CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n)
                   / (b.n - 1)) / CAST(1000000 AS DOUBLE) AS var_b
        FROM arms a JOIN arms b ON a.event_type = b.event_type
        WHERE a.arm = 'A' AND b.arm = 'B'
    ), welch AS (
        SELECT event_type, n_a, n_b, mean_a, mean_b, var_a, var_b,
               var_a / n_a + var_b / n_b AS se2
        FROM stats
    )
    SELECT event_type, n_a, n_b,
           CAST(ROUND(mean_a * 1000000) AS BIGINT) AS mean_a_e6,
           CAST(ROUND(mean_b * 1000000) AS BIGINT) AS mean_b_e6,
           CAST(ROUND((mean_a - mean_b) * 1000000) AS BIGINT) AS diff_e6,
           CAST(ROUND(((mean_a - mean_b) / sqrt(se2)) * 1000000) AS BIGINT)
               AS t_e6,
           CAST(ROUND((se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                       + (var_b / n_b) * (var_b / n_b) / (n_b - 1))) * 1000)
               AS BIGINT) AS df_e3,
           ABS((mean_a - mean_b) / sqrt(se2)) > CAST(1.96 AS DOUBLE)
               AS significant
    FROM welch
"""


@register(
    "stats_ab_ttest",
    oracle=_TTEST_SQL,
    doc="Welch's unequal-variance t-test per metric (event_type): users "
    "split 50/50 into arms by an md5 nibble of user_id (deterministic "
    "bucketing — the production A/B assignment function), values "
    "quantized to exact 1e-3 integers so n/Σx/Σx² are exact integer "
    "aggregates, then t and the Welch–Satterthwaite df computed as one "
    "shared Spark/DuckDB SQL template (identical IEEE op DAG ⇒ "
    "bit-identical doubles). Null data ⇒ |t| should hover near 0; the "
    "1.96 two-sided 5% gate is emitted as a boolean. One map-side "
    "combinable aggregation; at 100 TB the shuffle carries 10 partial "
    "(type, arm) triples per mapper, nothing else.",
)
def stats_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_TTEST_SQL)


_CHI2_SQL = """
    WITH obs AS (
        SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
    ), cells AS (
        SELECT g.lang, g.source, COALESCE(o.o, CAST(0 AS BIGINT)) AS o
        FROM (SELECT l.lang, s.source
              FROM (SELECT DISTINCT lang FROM documents) l
              CROSS JOIN (SELECT DISTINCT source FROM documents) s) g
        LEFT JOIN obs o ON g.lang = o.lang AND g.source = o.source
    ), tot AS (
        SELECT c.lang, c.source, c.o,
               CAST(SUM(c.o) OVER (PARTITION BY c.lang) AS BIGINT) AS row_tot,
               CAST(SUM(c.o) OVER (PARTITION BY c.source) AS BIGINT) AS col_tot,
               CAST(SUM(c.o) OVER () AS BIGINT) AS n
        FROM cells c
    ), expected AS (
        SELECT lang, source, o,
               CAST(row_tot AS DOUBLE) * col_tot / n AS e
        FROM tot
    ), q AS (
        SELECT lang, source, o,
               CAST(ROUND(e * 1000000) AS BIGINT) AS exp_e6,
               CAST(ROUND(((o - e) * (o - e) / e) * 1000000000) AS BIGINT)
                   AS cell_chi_e9
        FROM expected
    ), dims AS (
        SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS nc,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents
    ), total AS (
        SELECT CAST(SUM(cell_chi_e9) AS BIGINT) AS chi2_e9 FROM q
    )
    SELECT q.lang, q.source, q.o AS observed, q.exp_e6, q.cell_chi_e9,
           t.chi2_e9,
           (d.nr - 1) * (d.nc - 1) AS dof,
           CAST(ROUND(sqrt((t.chi2_e9 / CAST(1000000000 AS DOUBLE))
                           / (d.n * LEAST(d.nr - 1, d.nc - 1))) * 1000000)
               AS BIGINT) AS cramers_v_e6
    FROM q CROSS JOIN total t CROSS JOIN dims d
"""


@register(
    "stats_chi2_independence",
    oracle=_CHI2_SQL,
    doc="Chi-square test of independence over the documents lang × source "
    "contingency table, zero cells included (the full grid is a cross "
    "join of the observed category sets — omitting empty cells "
    "understates chi2). Expected counts come from exact integer "
    "row/column/grand totals; each cell's (O−E)²/E quantizes to 1e-9 "
    "BIGINT before the total sum so the reduction is order-free. Emits "
    "per-cell rows (observed, expected, contribution) plus the table "
    "statistics (chi2, dof, Cramér's V) as constant columns — one result "
    "a dashboard can both plot and threshold. One shared Spark/DuckDB "
    "SQL template. At scale: one groupBy the size of the category grid, "
    "then window/broadcast passes over ~100 rows.",
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_CHI2_SQL)


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (trend + seasonal + remainder)
# ---------------------------------------------------------------------------
# The arithmetic below the spine is IDENTICAL TEXT in both dialects; only
# the integer-spine generator differs (Spark sequence() vs DuckDB
# generate_series — both produce the same BIGINT hour range).

_DECOMP_CORE = """
    , counts AS (
        SELECT event_type, h, COUNT(*) AS cnt FROM hours GROUP BY event_type, h
    ), dense AS (
        SELECT s.event_type, s.h, COALESCE(c.cnt, CAST(0 AS BIGINT)) AS c
        FROM spine s LEFT JOIN counts c
          ON s.event_type = c.event_type AND s.h = c.h
    ), ma AS (
        SELECT event_type, h, c,
               CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS BIGINT)
                   AS w_sum,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS w_n
        FROM dense
    ), detr AS (
        SELECT event_type, h, c,
               CAST(w_sum AS DOUBLE) / CAST(24 AS DOUBLE) AS trend,
               CAST(ROUND((c - CAST(w_sum AS DOUBLE) / CAST(24 AS DOUBLE))
                          * 1000000) AS BIGINT) AS detrended_e6
        FROM ma WHERE w_n = 24
    ), seas AS (
        SELECT event_type, h % 24 AS hod,
               CAST(ROUND(CAST(SUM(detrended_e6) AS DOUBLE) / COUNT(*))
                   AS BIGINT) AS seasonal_e6
        FROM detr GROUP BY event_type, h % 24
    )
    SELECT d.event_type, d.h, d.c,
           CAST(ROUND(d.trend * 1000000) AS BIGINT) AS trend_e6,
           s.seasonal_e6,
           d.detrended_e6 - s.seasonal_e6 AS remainder_e6
    FROM detr d JOIN seas s
      ON d.event_type = s.event_type AND d.h % 24 = s.hod
"""

_DECOMP_SPARK = (
    """
    WITH hours AS (
        SELECT event_type,
               CAST(FLOOR(unix_timestamp(ts) / 3600) AS BIGINT) AS h
        FROM events
    ), bounds AS (
        SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM hours
    ), spine AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hours) t
        CROSS JOIN (SELECT explode(sequence(b.hmin, b.hmax)) AS h
                    FROM bounds b) g
    )
"""
    + _DECOMP_CORE
)

_DECOMP_DUCK = (
    """
    WITH hours AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h
        FROM events
    ), bounds AS (
        SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM hours
    ), spine AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hours) t
        CROSS JOIN (SELECT UNNEST(generate_series(b.hmin, b.hmax)) AS h
                    FROM bounds b) g
    )
"""
    + _DECOMP_CORE
)


@register(
    "timeseries_seasonal_decompose",
    oracle=_DECOMP_DUCK,
    doc="Classical additive seasonal decomposition of per-metric hourly "
    "event counts: trend = 24-hour centered moving average over a DENSE "
    "hour spine (missing hours are real zeros, not absent rows — the "
    "spine is the cross join of series × generate_series/sequence over "
    "the global hour range), seasonal = per hour-of-day mean of the "
    "detrended series, remainder = what neither explains. Counts and "
    "detrended values live in integer domain (1e-6 quantization before "
    "every mean), so window sums and group means are exact-integer "
    "reductions; edge hours without a full 24-row window are excluded "
    "rather than padded. Only the spine generator differs between the "
    "Spark and DuckDB texts; every arithmetic expression is literally "
    "identical. At 100 TB the shuffle carries (series, hour, count) "
    "rows — the pre-aggregated density, never events.",
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_DECOMP_SPARK)
