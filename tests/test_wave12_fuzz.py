"""Randomized differential fuzz for the wave-12 operators (the wave-11
posture): each seed synthesizes an events frame with a hostile value
distribution — heavy ties for the rank statistics (Friedman /
Jonckheere), near-constant groups for Bartlett, symmetric lattices for
the normality omnibus, constant metrics for Krippendorff's degenerate
path — and requires the REGISTRY query and its DuckDB oracle to
produce identical frames."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match

OPS = [
    "stats_friedman_test",
    "stats_jonckheere_trend",
    "stats_bartlett_variance",
    "stats_dagostino_k2",
    "stats_holm_bonferroni",
    "ml_krippendorff_alpha",
    "timeseries_hurst_rs",
    "timeseries_mase_backtest",
    "timeseries_pacf_durbin",
    "attribution_markov_removal",
]


def _events_frame(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(400, 1600))
    n_users = int(rng.integers(8, 60))
    dist = rng.choice(["uniform", "lattice", "skew", "nearconst"])
    if dist == "uniform":
        vals = rng.uniform(0, 900, n)
    elif dist == "lattice":  # heavy ties: the rank hot path
        vals = rng.choice([0.25, 1.0, 1.0, 3.5, 3.5, 3.5, 42.0], n)
    elif dist == "skew":
        vals = np.where(rng.random(n) < 0.9, rng.uniform(0, 5, n),
                        rng.uniform(400, 999, n))
    else:  # near-constant: Bartlett/D'Agostino/Krippendorff degenerates
        vals = np.full(n, 7.0) + rng.choice([0.0, 0.0, 0.0, 0.001], n)
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


@pytest.mark.parametrize("seed", [7, 31, 61, 97])
def test_wave12_fuzz_cross_engine(spark, tmp_path_factory, seed):
    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()
    d = tmp_path_factory.mktemp(f"w12fuzz{seed}")
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
