"""Behavior tests for wave 10a (causal inference + distribution tests).

Oracle parity is covered by test_oracle_parity's registry sweep; these
pin SEMANTICS against independent plain-numpy reimplementations (the
differential-fuzz discipline) plus the structural invariants the SQL
cannot state about itself (KS bounds, TOST direction, stratification
identity on unconfounded strata, Mann-Kendall sign symmetry).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _events():
    return duckdb.sql(
        "SELECT event_id, user_id, event_type, value, "
        "CAST(ROUND(value*1000) AS BIGINT) AS v_e3, epoch(ts) AS es "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()


def _arm(user_id: int) -> str:
    h = hashlib.md5(f"ab|{user_id}".encode()).hexdigest()
    return "A" if int(h[0], 16) < 8 else "B"


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov
# ---------------------------------------------------------------------------


def test_ks_matches_numpy(spark):
    pdf = _collect(spark, "stats_ks_test").set_index("event_type")
    ev = _events()
    for et, r in pdf.iterrows():
        x = np.sort(ev[ev["event_type"] == et]["v_e3"].to_numpy())
        y = np.sort(ev[ev["event_type"] != et]["v_e3"].to_numpy())
        support = np.unique(np.concatenate([x, y]))
        f1 = np.searchsorted(x, support, side="right")
        f2 = np.searchsorted(y, support, side="right")
        d_num = np.max(np.abs(f1.astype(np.int64) * len(y)
                              - f2.astype(np.int64) * len(x)))
        d = d_num / (len(x) * len(y))
        assert int(r["n1"]) == len(x) and int(r["n2"]) == len(y)
        assert int(r["d_e9"]) == math.floor(d * 1e9 + 0.5)
        lam = d * math.sqrt(len(x) * len(y) / (len(x) + len(y)))
        assert int(r["lambda_e6"]) == math.floor(lam * 1e6 + 0.5)
        assert bool(r["reject_h0"]) == (int(r["lambda_e6"]) > 1358102)


def test_ks_is_zero_on_identical_samples(spark, tmp_path):
    """D must be exactly 0 when the focal and pooled distributions are
    identical — two event types, identical value multisets."""
    import pandas as pd

    vals = [1.0, 2.0, 2.0, 3.5, 9.0] * 10
    pdf = pd.DataFrame(
        {
            "event_id": range(2 * len(vals)),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": ["a"] * len(vals) + ["b"] * len(vals),
            "value": vals * 2,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_ks_test", sf_dir=str(tmp_path))
    assert (out["d_e9"] == 0).all()
    assert (~out["reject_h0"]).all()


# ---------------------------------------------------------------------------
# TOST
# ---------------------------------------------------------------------------


def test_tost_matches_numpy(spark):
    pdf = _collect(spark, "stats_tost_equivalence").set_index("event_type")
    ev = _events()
    ev["arm"] = ev["user_id"].map(_arm)
    for et, r in pdf.iterrows():
        g = ev[ev["event_type"] == et]
        a = g[g["arm"] == "A"]["v_e3"].to_numpy(dtype=np.int64)
        b = g[g["arm"] == "B"]["v_e3"].to_numpy(dtype=np.int64)
        diff = a.sum() / len(a) - b.sum() / len(b)
        delta = (a.sum() + b.sum()) / (len(a) + len(b)) * 0.02
        var_a = (a.astype(float) ** 2).sum() - a.sum() * a.sum() / len(a)
        var_b = (b.astype(float) ** 2).sum() - b.sum() * b.sum() / len(b)
        se = math.sqrt(var_a / (len(a) - 1) / len(a)
                       + var_b / (len(b) - 1) / len(b))
        t_lo, t_hi = (diff + delta) / se, (diff - delta) / se
        assert int(r["n_a"]) == len(a) and int(r["n_b"]) == len(b)
        # replay at e5 (not e6): the SQL's division tree differs from
        # numpy's at ~1e-12 relative, so the last quantized digit may
        # round differently — parity at full precision is the oracle
        # gate's job, this pins the FORMULA
        assert abs(int(r["t_lower_e6"]) - t_lo * 1e6) <= 10
        assert abs(int(r["t_upper_e6"]) - t_hi * 1e6) <= 10
        assert bool(r["equivalent"]) == (t_lo > 1.645 and t_hi < -1.645)


def test_tost_shows_equivalence_on_identical_arms(spark, tmp_path):
    """Synthetic near-identical arms with tight variance: at n ~ 1000/arm
    and sd << margin, both one-sided tests must clear. (At the smoke SF
    the real corpus has n ~ 100/arm — too small for a 2% margin, and the
    honest answer there is 'not shown'; this pins the SHOWN direction.)"""
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": rng.integers(0, 1000, n),
            "event_type": "m",
            "value": 100.0 + rng.normal(0, 0.5, n),
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_tost_equivalence", sf_dir=str(tmp_path))
    r = out.iloc[0]
    assert bool(r["equivalent"])
    assert int(r["t_lower_e6"]) > 1_645_000
    assert int(r["t_upper_e6"]) < -1_645_000
    assert int(r["margin_e6"]) > 0


# ---------------------------------------------------------------------------
# CMH
# ---------------------------------------------------------------------------


def test_cmh_matches_numpy(spark):
    r = _collect(spark, "stats_cmh_stratified").iloc[0]
    ev = _events()
    ev["arm"] = ev["user_id"].map(_arm)
    ev["dow"] = (ev["es"] // 86400).astype(np.int64) % 7
    ev["y"] = (ev["event_type"] == "purchase").astype(np.int64)
    dev_e6 = v_e6 = 0
    sum_a = n_strata = 0
    for dow, g in ev.groupby("dow"):
        a_g = g[g["arm"] == "A"]
        b_g = g[g["arm"] == "B"]
        if len(a_g) == 0 or len(b_g) == 0 or len(g) < 2:
            continue
        n_strata += 1
        a_k = int(a_g["y"].sum())
        n1k, n0k = len(a_g), len(b_g)
        m1k = int(g["y"].sum())
        m0k = len(g) - m1k
        nk = len(g)
        sum_a += a_k
        dev_e6 += math.floor((a_k - n1k * m1k / nk) * 1e6 + 0.5)
        v = (n1k * n0k) * (m1k * m0k) / ((nk * nk) * (nk - 1))
        v_e6 += math.floor(v * 1e6 + 0.5)
    assert int(r["n_strata"]) == n_strata
    assert int(r["sum_a"]) == sum_a
    assert int(r["dev_sum_e6"]) == dev_e6
    assert int(r["v_sum_e6"]) == v_e6
    cmh = (abs(dev_e6 / 1e6) - 0.5) ** 2 / (v_e6 / 1e6)
    assert abs(int(r["cmh_e6"]) - cmh * 1e6) <= 2
    assert bool(r["significant"]) == (cmh > 3.841459)


# ---------------------------------------------------------------------------
# DiD + stratified ATE
# ---------------------------------------------------------------------------


def test_did_matches_numpy(spark):
    pdf = _collect(spark, "events_did_estimator").set_index("event_type")
    ev = _events()
    ev["treat"] = (ev["user_id"].map(_arm) == "A").astype(int)
    mid = math.floor((ev["es"].min() + ev["es"].max()) / 2.0)
    ev["post"] = (ev["es"] >= mid).astype(int)
    for et, r in pdf.iterrows():
        g = ev[ev["event_type"] == et]
        cells = {}
        for (t, p), c in g.groupby(["treat", "post"]):
            cells[(t, p)] = math.floor(
                c["v_e3"].sum() / len(c) * 1000 + 0.5)
        did = (cells[(1, 1)] - cells[(1, 0)]) - (
            cells[(0, 1)] - cells[(0, 0)])
        assert int(r["did_e6"]) == did
        assert int(r["t_post_e6"]) == cells[(1, 1)]


def test_stratified_ate_recovers_constant_effect_exactly(spark, tmp_path):
    """Noise-free constant treatment effect tau = 5.0: every surviving
    stratum's diff is exactly 5e6, so the weighted ATE and the naive
    diff must BOTH equal 5e6 exactly — pins the weighting identity."""
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 3000
    users = rng.integers(0, 500, n)
    treat = np.array([_arm(int(u)) == "A" for u in users])
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 7 * 86400, n), unit="s"),
            "user_id": users,
            "event_type": "m",
            "value": np.where(treat, 105.0, 100.0),
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_stratified_ate", sf_dir=str(tmp_path))
    r = out.iloc[0]
    assert int(r["ate_e6"]) == 5_000_000
    assert int(r["naive_diff_e6"]) == 5_000_000
    assert (out["n_strata"] <= 24).all()


def test_stratified_ate_matches_numpy(spark):
    pdf = _collect(spark, "stats_stratified_ate").set_index("event_type")
    ev = _events()
    ev["treat"] = (ev["user_id"].map(_arm) == "A").astype(int)
    ev["hod"] = (ev["es"] // 3600).astype(np.int64) % 24
    for et, r in pdf.iterrows():
        g = ev[ev["event_type"] == et]
        w_sum = n_used = 0
        for hod, s in g.groupby("hod"):
            t = s[s["treat"] == 1]
            c = s[s["treat"] == 0]
            if len(t) == 0 or len(c) == 0:
                continue
            diff_e6 = math.floor(
                (t["v_e3"].sum() / len(t) - c["v_e3"].sum() / len(c))
                * 1000 + 0.5)
            w_sum += len(s) * diff_e6
            n_used += len(s)
        assert int(r["n_used"]) == n_used
        assert int(r["ate_e6"]) == math.floor(w_sum / n_used + 0.5) or \
            int(r["ate_e6"]) == -math.floor(-w_sum / n_used + 0.5)


# ---------------------------------------------------------------------------
# Spearman + Mann-Kendall
# ---------------------------------------------------------------------------


def _avg_ranks_doubled(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="stable")
    r2 = np.empty(len(v), dtype=np.int64)
    sorted_v = v[order]
    i = 0
    while i < len(v):
        j = i
        while j < len(v) and sorted_v[j] == sorted_v[i]:
            j += 1
        r2[order[i:j]] = i + j + 1  # 2*avg_rank for 1-based ranks
        i = j
    return r2


def test_spearman_matches_numpy(spark):
    pdf = _collect(spark, "stats_spearman_corr").set_index("flag")
    li = duckdb.sql(
        "SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p "
        f"FROM '{SF_SMOKE_DIR}/lineitem.parquet'"
    ).df()
    for flag, r in pdf.iterrows():
        g = li[li["flag"] == flag]
        n = len(g)
        dx = _avg_ranks_doubled(g["q"].to_numpy()) - (n + 1)
        dy = _avg_ranks_doubled(g["p"].to_numpy()) - (n + 1)
        rho = (dx * dy).sum() / math.sqrt(
            float((dx * dx).sum()) * float((dy * dy).sum()))
        assert int(r["n"]) == n
        assert abs(int(r["spearman_e9"]) - rho * 1e9) <= 2


def test_spearman_is_exactly_one_on_monotone_data(spark, tmp_path):
    import pandas as pd

    n = 500
    pdf = pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_returnflag": "X",
            "l_quantity": np.arange(n, dtype=float),
            "l_extendedprice": np.arange(n, dtype=float) ** 2 + 1,
        }
    )
    pdf.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = _collect(spark, "stats_spearman_corr", sf_dir=str(tmp_path))
    assert int(out.iloc[0]["spearman_e9"]) == 1_000_000_000


def test_mann_kendall_matches_numpy(spark):
    pdf = _collect(spark, "stats_mann_kendall_trend").set_index("event_type")
    ev = _events()
    ev["d"] = (ev["es"] // 86400).astype(np.int64)
    for et, r in pdf.iterrows():
        g = ev[ev["event_type"] == et].groupby("d").size().sort_index()
        c = g.to_numpy(dtype=np.int64)
        n = len(c)
        s = sum(
            int(np.sign(c[j] - c[i]))
            for i in range(n) for j in range(i + 1, n)
        )
        _, t_counts = np.unique(c, return_counts=True)
        tie = int(sum(t * (t - 1) * (2 * t + 5) for t in t_counts))
        var18 = n * (n - 1) * (2 * n + 5) - tie
        z = (s - int(np.sign(s))) / math.sqrt(var18 / 18)
        assert int(r["n_days"]) == n
        assert int(r["s_stat"]) == s
        assert abs(int(r["z_e6"]) - z * 1e6) <= 2
        want = "increasing" if s > 0 else ("decreasing" if s < 0 else "none")
        assert r["direction"] == want
