"""Pipeline observability: Spark's ``observe`` API wired as a reusable
data-quality tap.

The reference emits operational metrics by polling an HTTP endpoint
(`custom-metrics.sh:7`); in-engine, the equivalent for BATCH pipelines is
``DataFrame.observe`` — named aggregates evaluated DURING the action that
already runs, costing zero extra scans (the metrics ride the same
physical plan). At 100 TB that difference is one full pass over the
input; never count rows with a second action when an observation can do
it for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, name: str, *null_check_cols: str
) -> tuple[DataFrame, Observation]:
    """Attach a quality observation: row count plus a null count per
    requested column. Returns (tapped_df, observation); read
    ``observation.get`` AFTER the first action on ``tapped_df``.

    The tap is transparent to the plan (observations are no-op for
    optimization — pushdown/pruning still fire below them)."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
