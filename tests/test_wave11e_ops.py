"""Behavior tests for wave 11e: SPRT walk replay (exact integer
process), value-iteration convergence against a numpy linear solve,
spectrum statistics replays, and a planted heavy-tail fixture.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _events(sf_dir=SF_SMOKE_DIR):
    return duckdb.sql(
        "SELECT event_id, user_id, event_type, "
        "CAST(ROUND(value*1000) AS BIGINT) AS v_e3, epoch_us(ts) AS us "
        f"FROM '{sf_dir}/events.parquet'"
    ).df()


# ---------------------------------------------------------------------------
# SPRT
# ---------------------------------------------------------------------------

L_E9 = 200670695  # round(ln(11/9)*1e9)
BOUND_E9 = 2944438979  # round(ln(19)*1e9)


def test_sprt_walk_matches_replay(spark):
    out = _collect(spark, "stats_sprt_sequential").set_index("event_type")
    ev = _events()
    for t, g in ev.groupby("event_type"):
        v = np.sort(g["v_e3"].to_numpy())
        n = len(v)
        med2 = int(v[(n + 1) // 2 - 1]) + int(v[(n + 2) // 2 - 1])
        gs = g.sort_values(["us", "event_id"])
        succ = (2 * gs["v_e3"].to_numpy() > med2).astype(np.int64)
        walk = L_E9 * (2 * np.cumsum(succ) - np.arange(1, n + 1))
        crossed = np.where(np.abs(walk) >= BOUND_E9)[0]
        r = out.loc[t]
        assert int(r["n_total"]) == n
        assert int(r["llr_final_e9"]) == int(walk[-1])
        if len(crossed):
            td = int(crossed[0]) + 1
            assert int(r["n_at_decision"]) == td
            assert int(r["llr_at_decision_e9"]) == int(walk[td - 1])
            want = "accept_h1" if walk[td - 1] >= BOUND_E9 else "accept_h0"
            assert r["decision"] == want
        else:
            assert pd.isna(r["n_at_decision"]) or r["decision"] == "continue"
            assert r["decision"] == "continue"


def test_sprt_decides_early_on_drifted_stream(spark, tmp_path):
    """The sequential property: against the full-stream median the
    ENDPOINT is ~zero by construction, but a stream whose high values
    all arrive FIRST crosses the H1 boundary within ~15 events —
    the early stopping a fixed-n test cannot give. (ceil(ln19/lnL)
    = 15 consecutive successes reach the bound.)"""
    rows = []
    for i in range(500):
        v = 3.0 if i < 250 else 1.0  # hot half first, cold half second
        rows.append((i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                     i % 10, "view", v))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_sprt_sequential", str(tmp_path)).iloc[0]
    assert out["decision"] == "accept_h1"
    assert int(out["n_at_decision"]) == 15  # first t with t*L >= ln19
    assert int(out["n_total"]) == 500


# ---------------------------------------------------------------------------
# Markov absorption
# ---------------------------------------------------------------------------


def test_markov_absorption_near_linear_solve(spark):
    out = _collect(spark, "events_markov_absorption").set_index("state")
    ev = _events().sort_values(["user_id", "us", "event_id"])
    trans = {}
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({a for a, _ in trans})
    idx = {s: i for i, s in enumerate(states)}
    row_tot = {s: sum(c for (a, _), c in trans.items() if a == s) for s in states}
    # exact linear solve of h = 1 + P_non h with purchase absorbing
    k = len(states)
    A = np.eye(k)
    b = np.ones(k)
    for i, s in enumerate(states):
        if s == "purchase":
            A[i] = 0
            A[i, i] = 1
            b[i] = 0
            continue
        for (a, t), c in trans.items():
            if a == s and t != "purchase":
                A[i, idx[t]] -= c / row_tot[s]
    h = np.linalg.solve(A, b)
    for s in states:
        r = out.loc[s]
        assert int(r["n_transitions"]) == row_tot[s]
        if s == "purchase":
            assert int(r["exp_steps_e6"]) == 0
        else:
            # 40 value-iteration rounds vs the exact solve: geometric
            # residual, loose bound of 1% relative
            assert abs(int(r["exp_steps_e6"]) / 1e6 - h[idx[s]]) < max(
                0.01 * h[idx[s]], 0.01
            )
    # monotone: iterates increase toward the fixpoint
    assert (out["exp_steps_e6"] >= out["exp_steps_prev_e6"]).all()


# ---------------------------------------------------------------------------
# Yule's K / Good-Turing
# ---------------------------------------------------------------------------


def _spectra():
    docs = duckdb.sql(
        f"SELECT text, source FROM '{SF_SMOKE_DIR}/documents.parquet'"
    ).df()
    spec = {}
    for _, r in docs.iterrows():
        tf = spec.setdefault(r["source"], {})
        for w in r["text"].split(" "):
            tf[w] = tf.get(w, 0) + 1
    return spec


def test_yule_k_matches_replay(spark):
    out = _collect(spark, "text_yule_k").set_index("source")
    for src, tf in _spectra().items():
        N = sum(tf.values())
        s2 = sum(m * m for m in tf.values())
        k = 1e4 * (s2 - N) / (N * N)
        r = out.loc[src]
        assert int(r["n_tokens"]) == N
        assert int(r["vocab"]) == len(tf)
        assert int(r["yule_k_e6"]) == int(_rha(k * 1e6)[()])


def test_good_turing_matches_replay(spark):
    out = _collect(spark, "text_good_turing")
    for src, tf in _spectra().items():
        N = sum(tf.values())
        nr = {}
        for m in tf.values():
            nr[m] = nr.get(m, 0) + 1
        sub = out[out["source"] == src].set_index("r")
        assert len(sub) == 5
        for r in range(1, 6):
            row = sub.loc[r]
            assert int(row["n_r"]) == nr.get(r, 0)
            assert int(row["n_r1"]) == nr.get(r + 1, 0)
            if nr.get(r, 0) > 0:
                want = int(_rha((r + 1) * nr.get(r + 1, 0) / nr[r] * 1e6)[()])
                assert int(row["r_star_e6"]) == want
            assert bool(row["spectrum_gap"]) == (
                nr.get(r, 0) == 0 or nr.get(r + 1, 0) == 0
            )
        assert (sub["p_unseen_e9"] == int(_rha(nr.get(1, 0) / N * 1e9)[()])).all()


# ---------------------------------------------------------------------------
# Dispersion index
# ---------------------------------------------------------------------------


def test_dispersion_index_matches_replay(spark):
    out = _collect(spark, "stats_dispersion_index").set_index("event_type")
    ev = _events()
    ev["d"] = ev["us"] // 86_400_000_000
    for t, g in ev.groupby("event_type"):
        v = g.groupby("d").size().to_numpy()
        n = len(v)
        mean = v.sum() / n
        var = (int((v.astype(object) ** 2).sum()) - int(v.sum()) ** 2 / n) / (n - 1)
        D = var / mean
        z = ((n - 1) * D - (n - 1)) / math.sqrt(2 * (n - 1))
        r = out.loc[t]
        assert int(r["n_days"]) == n
        assert int(r["dispersion_e6"]) == int(_rha(D * 1e6)[()])
        assert int(r["z_e6"]) == int(_rha(z * 1e6)[()])
        assert bool(r["overdispersed"]) == (int(_rha(z * 1e6)[()]) > 1645000)


# ---------------------------------------------------------------------------
# Hill estimator
# ---------------------------------------------------------------------------


def test_hill_matches_replay(spark):
    out = _collect(spark, "stats_hill_tail_index").set_index("event_type")
    ev = _events()
    for t, g in ev.groupby("event_type"):
        x = np.sort(g.loc[g["v_e3"] > 0, "v_e3"].to_numpy())[::-1]
        if len(x) < 101:
            assert t not in out.index
            continue
        xk1 = int(x[100])
        lns = [int(_rha(math.log(int(xi) / xk1) * 1e9)[()]) for xi in x[:100]]
        r = out.loc[t]
        assert int(r["xk1_e3"]) == xk1
        assert int(r["hill_gamma_e9"]) == int(_rha(sum(lns) / 100)[()])
        if sum(lns) > 0:
            alpha = 100 / sum(lns) * 1e9
            assert int(r["alpha_e6"]) == int(_rha(alpha * 1e6)[()])


def test_hill_flags_planted_pareto_tail(spark, tmp_path):
    """Pareto(alpha=1.2) values (heavy, infinite variance) must flag
    heavy_tail; uniform values must not."""
    rng = np.random.default_rng(5)
    n = 2000
    u = rng.uniform(size=n)
    pareto = (1.0 / (1 - u)) ** (1 / 1.2)  # alpha = 1.2
    uniform = rng.uniform(1, 2, size=n)
    rows = []
    for i in range(n):
        rows.append((i, pd.Timestamp("2024-01-01"), i % 50, "heavy",
                     float(pareto[i])))
        rows.append((n + i, pd.Timestamp("2024-01-01"), i % 50, "light",
                     float(uniform[i])))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_hill_tail_index", str(tmp_path)).set_index(
        "event_type"
    )
    assert bool(out.loc["heavy", "heavy_tail"])
    assert not bool(out.loc["light", "heavy_tail"])
    assert int(out.loc["heavy", "alpha_e6"]) < int(out.loc["light", "alpha_e6"])
