"""Differential privacy: the Laplace mechanism over grouped counts.

The reference has no privacy surface (its 30-line core is an ETL job,
reference scripts/spark_converter.py:25-31), but any engine that
publishes aggregates over user data needs a calibrated-noise release
path: counts with sensitivity 1 get Laplace(1/epsilon) noise and the
release satisfies epsilon-DP (Dwork et al., TCC 2006). This implements
the mechanism with DETERMINISTIC noise so it can be hash-verified
cross-engine: the uniform draw is an md5-derived exact 32-bit integer
per (group, epsilon) — the same seeded-randomness discipline as the
bootstrap/sampling tier (a production system would swap the md5 seed
column for a secret per-release salt; the mechanism arithmetic is
identical).

Inverse-CDF transform, kept exact until the single LN:
    u32 ~ U[0, 2^32)  (exact integer)
    sign = +1 if u32 >= 2^31 else -1
    m    = 2^31 - |u32 - 2^31| + 1    in [1, 2^31+1]   (exact integer)
    arg  = m / (2^31 + 1)             in (0, 1]        (one exact division)
    noise = -(1/eps) * sign * ln(arg)  -> quantized to 1e-6 immediately
(the +1 in m guards ln(0); the 1/2^31 CDF quantization is harmless at
the 1e-6 output quantum). LN is the only non-correctly-rounded op and
is quantized before any further arithmetic (house rule).

Scale posture: one map-side-combinable COUNT aggregation over events —
at 100 TB the shuffle carries one partial row per (mapper, group); the
noise arithmetic is a constant-time scalar epilogue on the 15-row
aggregate. The epsilon sweep is a VALUES cross join, engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from emr_with_custom_metrics_spark.catalog import register_views
from emr_with_custom_metrics_spark.registry import register

_HEX = "0123456789abcdef"


def _h32(seed: str, key: str) -> str:
    """Deterministic 0..2^32-1 from 8 md5 nibbles — valid in Spark AND
    DuckDB (geo.py's _h16 scheme widened to 32 bits)."""
    k = f"md5(concat('{seed}|', CAST({key} AS STRING)))"
    # Each weight is CAST to BIGINT individually: 15 * 16^7 overflows a
    # 32-bit INT literal product under Spark's ANSI arithmetic.
    terms = " + ".join(
        f"(instr('{_HEX}', substring({k}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    )
    return f"({terms})"


_DP_SQL = f"""
    WITH g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ), eps AS (
        SELECT * FROM (VALUES (500), (1000), (2000)) AS t(eps_e3)
    ), draw AS (
        SELECT g.event_type, g.n, e.eps_e3,
               {_h32("dp", "concat(g.event_type, '|', CAST(e.eps_e3 AS STRING))")} AS u32
        FROM g CROSS JOIN eps e
    ), noise AS (
        SELECT event_type, n, eps_e3, u32,
               CAST(ROUND(
                   (CASE WHEN u32 >= 2147483648 THEN 1 ELSE -1 END)
                   * -LN((2147483648 - ABS(u32 - 2147483648) + 1)
                         / 2147483649.0e0)
                   * (1000.0e0 / eps_e3) * 1000000) AS BIGINT) AS noise_e6
        FROM draw
    )
    SELECT event_type, eps_e3, n, noise_e6,
           n * 1000000 + noise_e6 AS noisy_e6,
           CASE WHEN ABS(noise_e6) <= CAST(ROUND(LN(10.0) * (1000.0e0 / eps_e3)
                                                 * 1000000) AS BIGINT)
                THEN 1 ELSE 0 END AS within_90pct_bound
    FROM noise
"""


@register(
    "privacy_dp_counts",
    oracle=_DP_SQL,
    doc="Epsilon-differentially-private release of per-event-type counts "
    "via the Laplace mechanism (Dwork et al. 2006), swept over epsilon "
    "in {0.5, 1, 2}: sensitivity-1 COUNT aggregates get "
    "Laplace(1/epsilon) noise from a deterministic md5-seeded inverse-"
    "CDF draw (exact integer uniform, one exact division, one LN "
    "quantized to 1e-6 immediately — the only transcendental). "
    "within_90pct_bound flags draws inside the ln(10)/epsilon 90% "
    "Laplace quantile, pinning the scale calibration. One map-side-"
    "combinable aggregation; the mechanism is a scalar epilogue on the "
    "15-row aggregate — at 100 TB the shuffle carries one partial per "
    "(mapper, type).",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_DP_SQL)
