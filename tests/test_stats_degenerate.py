"""Degenerate-input guards for the statistics templates (round-9 ADVICE).

The fuzz harness (test_stats_fuzz.py) deliberately excludes degenerate
distributions; these tests cover exactly what it excludes — a 1-row arm,
a zero-variance group, a constant covariate — because on real corpora a
rare event_type at small SF can produce them. The hazard is cross-engine:
Spark's ``x / 0`` returns NULL while DuckDB's IEEE float divide returns
±inf (and DuckDB then ERRORS casting inf/NaN to BIGINT), so an unguarded
template diverges or crashes only on the oracle side — an opaque red row.
Every template must (a) run without exception on BOTH engines and (b)
produce identical frames.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from tests.compare import assert_frames_match


def _arm_of(user_id: int) -> str:
    return "A" if int(hashlib.md5(f"ab|{user_id}".encode()).hexdigest()[0], 16) < 8 else "B"


def _pick_users(arm: str, n: int, start: int = 0) -> list[int]:
    out, u = [], start
    while len(out) < n:
        if _arm_of(u) == arm:
            out.append(u)
        u += 1
    return out


@pytest.fixture(scope="module")
def degenerate_events():
    """Three degenerate metrics:

    - ``const``: both arms populated, every value identical (zero variance
      in each arm and pooled → se2 = 0, pooled_var = 0, var_x = 0).
    - ``onerow``: arm A has exactly ONE row (n_a = 1 → (n-1) divide).
    - ``onearm``: every user hashes to arm B (the A/B join drops it).
    """
    rows = []
    ts = pd.Timestamp("2024-01-05 10:00:00")
    a2, b2 = _pick_users("A", 3), _pick_users("B", 3, start=1000)
    for u in a2 + b2:
        rows.append((u, "const", 5.0, ts))
        rows.append((u, "const", 5.0, ts + pd.Timedelta(days=20)))
    one_a, many_b = _pick_users("A", 1, start=2000), _pick_users("B", 4, start=3000)
    rows.append((one_a[0], "onerow", 7.25, ts))
    for i, u in enumerate(many_b):
        rows.append((u, "onerow", 1.0 + i, ts))
    for i, u in enumerate(_pick_users("B", 5, start=4000)):
        rows.append((u, "onearm", 2.0 * i, ts))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "value", "ts"])
    pdf["event_id"] = range(len(pdf))
    pdf["props"] = '{"k": 1}'
    return pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]


_TEMPLATES = [
    "_TTEST_SQL",
    "_MWU_SQL",
    "_POWER_SQL",
    "_CUPED_SQL",
    "_CUPED_TTEST_SQL",
    "_EFFECT_SQL",
    "_PROP_SQL",
    "_SRM_SQL",
    "_ANOVA_SQL",
]


@pytest.mark.parametrize("template", _TEMPLATES)
def test_degenerate_inputs_match_cross_engine(spark, degenerate_events, template):
    from emr_with_custom_metrics_spark.operators import stats as stats_mod

    sql = getattr(stats_mod, template)
    con = duckdb.connect()
    con.register("events", degenerate_events)
    oracle = con.sql(sql).df()  # must not raise (inf→BIGINT cast would)
    spark.createDataFrame(degenerate_events).createOrReplaceTempView("events")
    try:
        got = spark.sql(sql).toPandas()
    finally:
        spark.catalog.dropTempView("events")
    assert_frames_match(got, oracle, f"degenerate:{template}")
    con.close()


def test_degenerate_guards_emit_finite_values(spark, degenerate_events):
    """The guarded fallbacks are 0/FALSE, never NULL/inf/NaN."""
    from emr_with_custom_metrics_spark.operators import stats as stats_mod

    con = duckdb.connect()
    con.register("events", degenerate_events)
    tt = con.sql(stats_mod._TTEST_SQL).df().set_index("event_type")
    # const: both arms > 1 row, zero variance → guarded zeros
    assert tt.loc["const", "t_e6"] == 0
    assert tt.loc["const", "df_e3"] == 0
    assert not tt.loc["const", "significant"]
    # onerow: n_a = 1 → filtered out entirely; onearm: join drops it
    assert "onerow" not in tt.index and "onearm" not in tt.index
    eff = con.sql(stats_mod._EFFECT_SQL).df().set_index("event_type")
    assert eff.loc["const", "magnitude"] == "undefined"
    assert eff.loc["const", "cohens_d_e6"] == 0
    cu = con.sql(stats_mod._CUPED_SQL).df().set_index("event_type")
    assert cu.loc["const", "theta_e6"] == 0
    assert cu.loc["const", "reduction_e6"] == 0
    for df in (tt, eff, cu):
        assert df.notna().all().all()
    con.close()
