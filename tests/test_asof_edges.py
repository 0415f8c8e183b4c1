"""Edge semantics of the generic as-of join operator (operators/asof.py):
empty right side, no-earlier-row nulls, exact-timestamp ties (inclusive)."""

from __future__ import annotations

from datetime import datetime

from emr_with_custom_metrics_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_empty_right_side_yields_all_nulls(spark):
    left = _df(
        spark,
        [(1, datetime(2024, 1, 1, 10), "a")],
        "k BIGINT, ts TIMESTAMP, lv STRING",
    )
    right = _df(spark, [], "k BIGINT, ts TIMESTAMP, rv STRING")
    out = asof_join(left, right, key="k", ts="ts", right_value_cols=["rv"]).collect()
    assert len(out) == 1 and out[0]["rv"] is None and out[0]["lv"] == "a"


def test_asof_no_earlier_row_is_null_later_rows_carry(spark):
    left = _df(
        spark,
        [
            (1, datetime(2024, 1, 1, 9), "early"),
            (1, datetime(2024, 1, 1, 11), "late"),
            (2, datetime(2024, 1, 1, 12), "otherkey"),
        ],
        "k BIGINT, ts TIMESTAMP, lv STRING",
    )
    right = _df(
        spark,
        [(1, datetime(2024, 1, 1, 10), "r10")],
        "k BIGINT, ts TIMESTAMP, rv STRING",
    )
    rows = {r["lv"]: r["rv"] for r in asof_join(left, right, "k", "ts", ["rv"]).collect()}
    assert rows == {"early": None, "late": "r10", "otherkey": None}


def test_asof_exact_tie_is_inclusive(spark):
    """left.ts == right.ts must match (ASOF ... ON l.ts >= r.ts semantics:
    right rows sort before left rows at equal timestamps)."""
    t = datetime(2024, 1, 1, 10)
    left = _df(spark, [(1, t, "L")], "k BIGINT, ts TIMESTAMP, lv STRING")
    right = _df(spark, [(1, t, "R")], "k BIGINT, ts TIMESTAMP, rv STRING")
    out = asof_join(left, right, "k", "ts", ["rv"]).collect()
    assert out[0]["rv"] == "R"


def test_asof_picks_greatest_earlier_not_first(spark):
    left = _df(spark, [(1, datetime(2024, 1, 1, 12), "L")], "k BIGINT, ts TIMESTAMP, lv STRING")
    right = _df(
        spark,
        [
            (1, datetime(2024, 1, 1, 8), "r8"),
            (1, datetime(2024, 1, 1, 11), "r11"),
            (1, datetime(2024, 1, 1, 13), "r13-after"),
        ],
        "k BIGINT, ts TIMESTAMP, rv STRING",
    )
    out = asof_join(left, right, "k", "ts", ["rv"]).collect()
    assert out[0]["rv"] == "r11"


def test_cogroup_asof_survives_count_pruning(spark):
    """Regression: both cogroup branches derive from ONE events scan; with
    shared attribute ids, column pruning under .count() strips the pandas
    worker's input columns (KeyError in the UDF). The operator alias-renames
    the right branch, so a bare count() must succeed and agree with the
    materialized row count."""
    from emr_with_custom_metrics_spark.registry import all_specs
    from tests.conftest import SF_DIR

    fn = all_specs()["cogroup_asof_pandas"].fn
    df = fn(spark, SF_DIR)
    assert df.count() == len(fn(spark, SF_DIR).toPandas())
