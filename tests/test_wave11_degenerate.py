"""Degenerate-input guards for every wave-11 operator (the wave-9
precedent, applied fleet-wide to the round's additions).

One pathological fixture directory: every event value identical and
every timestamp identical (zero variance, one spine point, equal-range
binning degenerates), one dose level in orders, and a documents table
whose texts are too short to shingle. The hazard is cross-engine:
Spark's ANSI ``x / 0`` raises or NULLs while DuckDB's IEEE divide gives
±inf (then ERRORS casting to BIGINT) — an unguarded template crashes or
diverges on exactly one side. Every wave-11 query must (a) run without
exception through BOTH engines and (b) produce identical frames.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.compare import assert_frames_match

EVENTS_OPS = [
    "stats_mcnemar_paired", "stats_kendall_tau_pairs", "stats_kruskal_wallis",
    "stats_runs_test", "stats_wilson_ci", "ml_cohen_kappa",
    "ml_confusion_multiclass", "ml_ks_separation", "ml_logloss_eval",
    "stats_hodges_lehmann", "stats_bland_altman", "spc_western_electric",
    "timeseries_page_hinkley", "stats_cvm_twosample",
    "stats_permutation_test", "events_sessionize_batch", "stats_quantile_ci",
    "stats_cronbach_alpha", "ml_expected_calibration_error",
    "stats_sprt_sequential", "events_markov_absorption",
    "stats_dispersion_index", "stats_hill_tail_index",
    "stats_fisher_combined", "stats_benjamini_yekutieli",
    "stats_mcc_matthews", "timeseries_spectral_periodogram",
    "events_uplift_qini",
]
ORDERS_OPS = ["stats_cochran_armitage"]
DOCS_OPS = [
    "corpus_capture_recapture", "corpus_token_budget_mix",
    "text_ngram_novelty", "text_burstiness_dispersion", "stats_cronbach_alpha",
    "text_yule_k", "text_good_turing", "stats_kendall_w",
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("w11_degenerate")
    ts = pd.Timestamp("2024-01-05 10:00:00")
    rows = []
    # 12 'view' rows, every value identical, every timestamp identical
    for i in range(12):
        rows.append((i, ts, i % 6, "view", 5.0, "{}"))
    # 3 'purchase' rows, same constant value and timestamp
    for i in range(12, 15):
        rows.append((i, ts, i % 6, "purchase", 5.0, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "events.parquet", index=False)
    # one dose level only -> Cochran-Armitage variance factor is exactly 0
    pd.DataFrame(
        {
            "o_orderkey": range(6),
            "o_custkey": range(6),
            "o_orderstatus": ["F", "O", "F", "O", "F", "O"],
            "o_totalprice": [100.0] * 6,
            "o_orderdate": [pd.Timestamp("2024-01-01")] * 6,
            "o_orderpriority": ["3-MEDIUM"] * 6,
        }
    ).to_parquet(d / "orders.parquet", index=False)
    # texts too short to 8-gram shingle; two sources; duplicate tokens
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b c", "a b c", "b c d"],
            "lang": ["en", "en", "fr"],
            "source": ["s0", "s1", "s1"],
            "n_chars": [5, 5, 5],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle_tables(name):
    if name in ORDERS_OPS:
        return ["orders"]
    if name in DOCS_OPS and name != "stats_cronbach_alpha":
        return ["documents"]
    return ["events"]


@pytest.mark.parametrize(
    "name", sorted(set(EVENTS_OPS + ORDERS_OPS + DOCS_OPS))
)
def test_wave11_degenerate_cross_engine(spark, degenerate_dir, name):
    from emr_with_custom_metrics_spark.registry import all_specs

    spec = all_specs()[name]
    got = spec.fn(spark, degenerate_dir).toPandas()  # must not raise
    con = duckdb.connect()
    for t in _oracle_tables(name):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{t}.parquet')"
        )
    try:
        oracle = con.sql(spec.oracle).df()  # must not raise either
    finally:
        con.close()
    assert_frames_match(got, oracle, f"degenerate:{name}")


def test_degenerate_edges_are_the_documented_fallbacks(spark, degenerate_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    # zero value range -> the equal-width binners produce NO test rows
    # (rng.hi > rng.lo gate) rather than a divide-by-zero
    assert len(specs["ml_logloss_eval"].fn(spark, degenerate_dir).toPandas()) == 0
    assert (
        len(
            specs["ml_expected_calibration_error"]
            .fn(spark, degenerate_dir)
            .toPandas()
        )
        == 0
    )
    # single dose level -> trend variance factor 0 -> guarded z = 0
    ca = specs["stats_cochran_armitage"].fn(spark, degenerate_dir).toPandas()
    assert (ca["z_e6"] == 0).all() and (~ca["reject_h0"]).all()
    # constant values -> zero-variance guards, not NULL/inf
    di = specs["stats_dispersion_index"].fn(spark, degenerate_dir).toPandas()
    assert (di["dispersion_e6"] == 0).all() or (di["n_days"] == 1).all()
    # too-short docs -> empty shingle space flows through as NULL/0
    # counts, never an error
    crc = specs["corpus_capture_recapture"].fn(spark, degenerate_dir).toPandas()
    assert int(crc.iloc[0]["n_observed"]) == 0
