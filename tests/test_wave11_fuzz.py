"""Randomized differential fuzz for the wave-11 operators.

Same posture as test_stats_fuzz: the fixed corpus exercises one data
shape, so each seed synthesizes an events frame with a hostile value
distribution (heavy ties for the rank statistics, skew for the tail
estimator, discrete lattices for the histogram order-statistic picks)
and requires the REGISTRY query and its DuckDB oracle to produce
identical frames. Runs through the registry functions, so the
engine-split templates (epoch extraction, explodes) are fuzzed too,
not just shared-text SQL.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match

OPS = [
    "stats_kruskal_wallis",
    "stats_cvm_twosample",
    "stats_hodges_lehmann",
    "ml_ks_separation",
    "stats_kendall_tau_pairs",
    "stats_sprt_sequential",
    "stats_quantile_ci",
    "ml_expected_calibration_error",
]


def _events_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 1500))
    n_users = int(rng.integers(8, 60))
    dist = rng.choice(["uniform", "lattice", "skew", "lognormal"])
    if dist == "uniform":
        vals = rng.uniform(0, 900, n)
    elif dist == "lattice":  # heavy ties: the rank/histogram hot path
        vals = rng.choice([0.25, 1.0, 1.0, 3.5, 3.5, 3.5, 42.0], n)
    elif dist == "skew":
        vals = np.where(rng.random(n) < 0.9, rng.uniform(0, 5, n),
                        rng.uniform(400, 999, n))
    else:
        vals = np.minimum(rng.lognormal(2.5, 1.4, n), 999.0)
    ts0 = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts0
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "user_id": rng.integers(0, n_users, n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n
            ),
            "value": vals,
            "props": "{}",
        }
    )


@pytest.mark.parametrize("seed", [11, 23, 47, 89])
def test_wave11_fuzz_cross_engine(spark, tmp_path_factory, seed):
    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    d = tmp_path_factory.mktemp(f"w11fuzz{seed}")
    _events_frame(seed).to_parquet(d / "events.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    try:
        for name in OPS:
            got = specs[name].fn(spark, str(d)).toPandas()
            oracle = con.sql(specs[name].oracle).df()
            assert_frames_match(got, oracle, f"fuzz{seed}:{name}")
    finally:
        con.close()
