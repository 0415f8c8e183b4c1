"""Randomized differential fuzz for the round-9 ML-eval / drift /
mining templates — same discipline as test_stats_fuzz: run the SAME
template(s) on randomized synthetic frames in BOTH engines and require
identical results, hunting dialect drift on shapes the corpus never
produces (heavy ties, single-class labels, constant strata, tiny
windows). Unlike the r8 fuzz, degenerate inputs are IN scope here —
the round-9 guards define the behavior (zero rows / NULL / alloc 0),
so divergence on them is a real bug.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match


def _events_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(150, 900))
    shape = rng.choice(["uniform", "ties", "single_class", "skew"])
    vals = {
        "uniform": lambda: rng.uniform(0, 900, n),
        "ties": lambda: rng.choice([1.0, 2.5, 2.5, 7.75, 100.0], n),
        "single_class": lambda: rng.uniform(0, 50, n),
        "skew": lambda: np.where(
            rng.random(n) < 0.9,
            rng.uniform(0, 10, n),
            rng.uniform(500, 999, n),
        ),
    }[shape]()
    if shape == "single_class":
        # no purchases at all: the AUC guard must emit zero rows on
        # BOTH engines rather than crash/diverge
        types = rng.choice(["view", "click", "signup", "error"], n)
    else:
        types = rng.choice(["view", "click", "purchase", "signup", "error"], n)
    ts0 = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts0
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 40, n).astype("int64"),
            "event_type": types,
            "value": vals,
        }
    )


def _both2(spark, duck, pdf, spark_sql, duck_sql, name, view="events"):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView(view)
    try:
        got_spark = spark.sql(spark_sql).toPandas()
        duck.register("fuzz_src", pdf)
        duck.execute(
            f"CREATE OR REPLACE TEMP VIEW {view} AS SELECT * FROM fuzz_src"
        )
        got_duck = duck.sql(duck_sql).df()
        assert_frames_match(got_spark, got_duck, name)
    finally:
        duck.execute(f"DROP VIEW IF EXISTS {view}")
        spark.catalog.dropTempView(view)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_auc_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9e import _AUC_SQL

    _both2(spark, duck, _events_frame(seed), _AUC_SQL, _AUC_SQL, f"auc[{seed}]")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_calibration_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9e import _CALIB_SQL

    _both2(
        spark, duck, _events_frame(seed + 50), _CALIB_SQL, _CALIB_SQL,
        f"calib[{seed}]",
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_mutual_information_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9e import _MI_DUCK, _MI_SQL

    _both2(
        spark, duck, _events_frame(seed + 100), _MI_SQL, _MI_DUCK,
        f"mi[{seed}]",
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_psi_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9h import (
        _PSI_DUCK,
        _PSI_SPARK,
    )

    _both2(
        spark, duck, _events_frame(seed + 200), _PSI_SPARK, _PSI_DUCK,
        f"psi[{seed}]",
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_sequence_patterns_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9f import (
        _SEQPAT_DUCK,
        _SEQPAT_SPARK,
    )

    _both2(
        spark, duck, _events_frame(seed + 300), _SEQPAT_SPARK, _SEQPAT_DUCK,
        f"seqpat[{seed}]",
    )


def _orders_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(100, 800))
    shape = rng.choice(["mixed", "all_low", "one_cat"])
    price = {
        "mixed": lambda: rng.uniform(1000, 400000, n),
        # all below the 150k label threshold: every stratum/category is
        # single-label — the LOO grid must still be consistent
        "all_low": lambda: rng.uniform(1000, 140000, n),
        "one_cat": lambda: rng.uniform(1000, 400000, n),
    }[shape]()
    cats = (
        np.repeat("1-URGENT", n)
        if shape == "one_cat"
        else rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW"], n)
    )
    return pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": rng.integers(0, 50, n).astype("int64"),
            "o_orderstatus": rng.choice(["O", "F", "P"], n),
            "o_totalprice": price,
            "o_orderdate": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 300, n), unit="D"),
            "o_orderpriority": cats,
        }
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_target_encoding_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9e import _TENC_SQL

    _both2(
        spark, duck, _orders_frame(seed), _TENC_SQL, _TENC_SQL,
        f"tenc[{seed}]", view="orders",
    )


def _lineitem_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 1500))
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_suppkey": rng.integers(0, 30, n).astype("int64"),
            "l_extendedprice": rng.uniform(100, 90000, n),
            "l_discount": rng.uniform(0, 0.1, n),
            "l_returnflag": rng.choice(["R", "N", "A"], n),
        }
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_skyline_template(spark, duck, seed):
    from emr_with_custom_metrics_spark.operators.wave9d import (
        _SKY_AGG,
        _SKY_TAIL,
    )

    shared = f"WITH m AS ({_SKY_AGG})" + _SKY_TAIL
    _both2(
        spark, duck, _lineitem_frame(seed), shared, shared,
        f"skyline[{seed}]", view="lineitem",
    )
