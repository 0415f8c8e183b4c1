"""Planted-fixture tests for wave 15 (closed-form answers by hand or
independent pure-Python replays + cross-engine frame equality — the
round-12 rule: a replay that mirrors the engine formula is blind to
shared errors, so every statistic gets a fixture whose answer is known
another way)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


def _collect(spark, name, sf_dir):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, str(sf_dir)).toPandas()


def _duck_oracle(name, sf_dir, tables=("events",)):
    import duckdb

    from emr_with_custom_metrics_spark.registry import all_specs

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(all_specs()[name].oracle).df()
    finally:
        con.close()


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> None:
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert len(av) == len(bv), c
        ma, mb = pd.isna(av), pd.isna(bv)
        assert (ma == mb).all(), (c, av, bv)
        assert (av[~ma] == bv[~mb]).all(), (c, av, bv)


def _events(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    df["event_id"] = df["event_id"].astype(np.int64)
    df["user_id"] = df["user_id"].astype(np.int64)
    df["value"] = df["value"].astype(np.float64)
    return df


def _md5_nibble(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16)


def _md5_byte(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    return int(h[0], 16) * 16 + int(h[1], 16)


# ---------------------------------------------------------------------------
# delta-presence
# ---------------------------------------------------------------------------


def test_delta_presence_pure_python_replay(spark, tmp_path):
    """One QI class per user cohort; the release rule replayed with
    hashlib gives the exact per-class delta."""
    t0 = pd.Timestamp("2024-01-01")  # a Monday -> dow fixed per day
    rows = []
    eid = 0
    for uid in range(40):
        rows.append((eid, t0, uid, "view", 10.0, "{}"))
        eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)

    released = {u for u in range(40) if _md5_nibble(f"dp|{u}") < 4}
    out = _collect(spark, "dq_delta_presence", tmp_path)
    r = out.iloc[0]
    assert int(r["n_classes"]) == 1
    want = round(len(released) / 40 * 1e9)
    assert int(r["max_delta_e9"]) == want
    assert int(r["min_delta_e9"]) == want
    assert int(r["avg_delta_e9"]) == want
    _frames_equal(out, _duck_oracle("dq_delta_presence", tmp_path))


def test_delta_presence_full_disclosure_class(spark, tmp_path):
    """A class whose every member is released has delta = 1 and lands
    in the at-risk count."""
    t0 = pd.Timestamp("2024-01-01")
    rel = [u for u in range(200) if _md5_nibble(f"dp|{u}") < 4][:3]
    unrel = [u for u in range(200) if _md5_nibble(f"dp|{u}") >= 4][:5]
    rows = []
    eid = 0
    for u in rel:  # class (dow0, band0): all released
        rows.append((eid, t0, u, "view", 5.0, "{}"))
        eid += 1
    for u in unrel:  # class (dow0, band2): none released
        rows.append((eid, t0, u, "view", 55.0, "{}"))
        eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "dq_delta_presence", tmp_path)
    r = out.iloc[0]
    assert int(r["n_classes"]) == 2
    assert int(r["max_delta_e9"]) == 1_000_000_000
    assert int(r["min_delta_e9"]) == 0
    assert int(r["n_classes_above"]) == 1
    assert int(r["n_released_at_risk"]) == 3
    _frames_equal(out, _duck_oracle("dq_delta_presence", tmp_path))


# ---------------------------------------------------------------------------
# randomized response
# ---------------------------------------------------------------------------


def test_randomized_response_exact_mechanism(spark, tmp_path):
    """All-true bits: the released ones are exactly the kept coins, the
    estimator is 2*lambda - 1/2 — replayed bit-for-bit with hashlib."""
    t0 = pd.Timestamp("2024-01-01")
    n = 300
    rows = [(i, t0, 1, "view", 80.0, "{}") for i in range(n)]
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)

    kept = sum(1 for i in range(n) if _md5_byte(f"rr|{i}") < 192)
    out = _collect(spark, "privacy_randomized_response", tmp_path)
    r = out.iloc[0]
    assert int(r["n"]) == n
    assert int(r["true_rate_e9"]) == 1_000_000_000
    assert int(r["released_ones"]) == kept
    lam = kept / n
    est = max(0.0, min(1.0, 2.0 * lam - 0.5))
    assert int(r["estimated_rate_e9"]) == round(est * 1e9)
    _frames_equal(out, _duck_oracle("privacy_randomized_response", tmp_path))


# ---------------------------------------------------------------------------
# log-rank
# ---------------------------------------------------------------------------


def test_logrank_identical_curves_not_rejected(spark, tmp_path):
    """Arms with IDENTICAL lifetime distributions: chi2 near zero,
    no rejection. Users are chosen by replaying the md5 arm rule so
    each arm gets the same planted lifetimes."""
    arm_of = lambda u: "A" if _md5_nibble(f"ab|{u}") < 8 else "B"  # noqa: E731
    a_users = [u for u in range(500) if arm_of(u) == "A"][:6]
    b_users = [u for u in range(500) if arm_of(u) == "B"][:6]
    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    # lifetimes 2,2,5,5,8,8 days per arm; a censoring anchor at day 30
    for users in (a_users, b_users):
        for u, life in zip(users, (2, 2, 5, 5, 8, 8)):
            rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1
            rows.append(
                (eid, t0 + pd.Timedelta(days=life), u, "view", 1.0, "{}")
            ); eid += 1
    anchor_a, anchor_b = a_users[0], b_users[0]
    rows.append((eid, t0, 990_000 + anchor_a, "view", 1.0, "{}")); eid += 1
    rows.append(
        (eid, t0 + pd.Timedelta(days=30), 990_000 + anchor_a, "view", 1.0,
         "{}")
    ); eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)

    out = _collect(spark, "survival_logrank_test", tmp_path)
    r = out.iloc[0]
    assert not bool(r["degenerate"])
    # O-E is small for mirrored cohorts (not exactly 0: the anchor
    # user joins one arm's risk sets)
    assert not bool(r["reject_05"])
    _frames_equal(out, _duck_oracle("survival_logrank_test", tmp_path))


def test_logrank_separated_curves_rejected(spark, tmp_path):
    """Arm A churns at day 1, arm B at day 20 (many users): the test
    must reject, and O1/E1 must match a pure-Python log-rank."""
    arm_of = lambda u: "A" if _md5_nibble(f"ab|{u}") < 8 else "B"  # noqa: E731
    a_users = [u for u in range(2000) if arm_of(u) == "A"][:25]
    b_users = [u for u in range(2000) if arm_of(u) == "B"][:25]
    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for u in a_users:
        rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=1), u, "view", 1.0, "{}"))
        eid += 1
    for u in b_users:
        rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=20), u, "view", 1.0, "{}"))
        eid += 1
    # censoring anchor: one user alive at day 40 keeps everyone churned
    rows.append((eid, t0, 999_999, "view", 1.0, "{}")); eid += 1
    rows.append(
        (eid, t0 + pd.Timedelta(days=40), 999_999, "view", 1.0, "{}")
    ); eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)

    out = _collect(spark, "survival_logrank_test", tmp_path)
    r = out.iloc[0]
    assert bool(r["reject_05"]) and not bool(r["degenerate"])

    # pure-Python log-rank over the same lifetimes (anchor in its arm)
    anchor_arm = arm_of(999_999)
    lifetimes = (
        [("A", 1, 1)] * 25 + [("B", 20, 1)] * 25
        + [(anchor_arm, 40, 0)]
    )
    times = sorted({t for _, t, c in lifetimes if c})
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for a, tt, _ in lifetimes if a == "A" and tt >= t)
        n2 = sum(1 for a, tt, _ in lifetimes if a == "B" and tt >= t)
        d1 = sum(1 for a, tt, c in lifetimes if a == "A" and tt == t and c)
        d2 = sum(1 for a, tt, c in lifetimes if a == "B" and tt == t and c)
        dt, nt = d1 + d2, n1 + n2
        if dt == 0 or nt <= 1:
            continue
        o1 += d1
        e1 += round(dt * n1 / nt * 1e9) / 1e9
        v += round(dt * n1 / nt * (nt - n1) / nt * (nt - dt) / (nt - 1)
                   * 1e9) / 1e9
    assert int(out.iloc[0]["o1"]) == int(o1)
    assert int(out.iloc[0]["expected1_e9"]) == round(e1 * 1e9)
    chi2 = (o1 - e1) ** 2 / v
    assert abs(int(r["chi2_e6"]) - round(chi2 * 1e6)) <= 1
    _frames_equal(out, _duck_oracle("survival_logrank_test", tmp_path))


# ---------------------------------------------------------------------------
# capability indices
# ---------------------------------------------------------------------------


def test_capability_closed_form(spark, tmp_path):
    """Two-point metric {40, 60}: mean 50, s = sqrt(200) -> Cp = Cpk =
    80/(6 sqrt(200)) exactly; a constant metric flags degenerate."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (0, t0, 1, "view", 40.0, "{}"),
        (1, t0, 1, "view", 60.0, "{}"),
        (2, t0, 1, "click", 50.0, "{}"),
        (3, t0, 1, "click", 50.0, "{}"),
    ]
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "spc_capability_indices", tmp_path).set_index(
        "event_type"
    )
    sigma = math.sqrt(((40_000 - 50_000) ** 2 + (60_000 - 50_000) ** 2) / 1)
    cp = 80_000 / (6 * sigma)
    v = out.loc["view"]
    assert int(v["mean_e3"]) == 50_000
    assert int(v["sigma_e3"]) == round(sigma)
    assert int(v["cp_e6"]) == round(cp * 1e6)
    assert int(v["cpk_e6"]) == round(cp * 1e6)
    assert not bool(v["capable_133"]) and not bool(v["degenerate"])
    c = out.loc["click"]
    assert bool(c["degenerate"]) and int(c["cp_e6"]) == 0
    _frames_equal(
        out.reset_index(), _duck_oracle("spc_capability_indices", tmp_path)
    )


# ---------------------------------------------------------------------------
# Dickey-Fuller
# ---------------------------------------------------------------------------


def _daily_events(series_by_metric, t0=pd.Timestamp("2024-01-01")):
    """One event per count unit per (metric, day) — daily counts equal
    the planted series exactly."""
    rows, eid = [], 0
    for metric, series in series_by_metric.items():
        for day, cnt in enumerate(series):
            for _ in range(int(cnt)):
                rows.append(
                    (eid, t0 + pd.Timedelta(days=day, hours=1), 1,
                     metric, 1.0, "{}")
                )
                eid += 1
    return _events(rows)


def _df_numpy(series):
    """Constant-only DF tau replay (float OLS — the engine quantizes
    only at the output, so agreement is to ~1e-5 relative)."""
    y = np.asarray(series, dtype=float)
    x = y[:-1]
    d = np.diff(y)
    n = len(x)
    cxx = ((x - x.mean()) ** 2).sum()
    cxd = ((x - x.mean()) * (d - d.mean())).sum()
    cdd = ((d - d.mean()) ** 2).sum()
    rho = cxd / cxx
    sse = cdd - rho * cxd
    se = math.sqrt((sse / (n - 2)) / cxx)
    return rho, rho / se


def test_dickey_fuller_noise_vs_walk(spark, tmp_path):
    """iid noise mean-reverts (rho near -1, strong rejection); a
    monotone ramp behaves like a trend/walk and must NOT reject.
    (A perfectly alternating series is the PERFECT-FIT degenerate —
    covered by test_dickey_fuller_constant_degenerate's class.)"""
    rng = np.random.default_rng(3)
    noise = (rng.integers(2, 30, 40)).tolist()
    ramp = list(range(3, 33))
    _daily_events({"view": noise, "click": ramp}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_dickey_fuller", tmp_path).set_index(
        "event_type"
    )
    rho_a, tau_a = _df_numpy(noise)
    va = out.loc["view"]
    assert abs(int(va["rho_e9"]) - round(rho_a * 1e9)) <= 5
    assert abs(int(va["tau_e6"]) - round(tau_a * 1e6)) <= 5
    assert bool(va["reject_unit_root_05"])
    vc = out.loc["click"]
    assert not bool(vc["reject_unit_root_05"])
    _frames_equal(
        out.reset_index(), _duck_oracle("timeseries_dickey_fuller", tmp_path)
    )


def test_dickey_fuller_constant_degenerate(spark, tmp_path):
    _daily_events({"view": [5] * 10}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_dickey_fuller", tmp_path)
    assert bool(out.iloc[0]["degenerate"])
    _frames_equal(out, _duck_oracle("timeseries_dickey_fuller", tmp_path))


# ---------------------------------------------------------------------------
# ARCH LM
# ---------------------------------------------------------------------------


def test_arch_lm_planted_clustering(spark, tmp_path):
    """Volatility clustering (a calm block then a wild block of
    alternating large moves) must reject; a constant-magnitude
    alternating series has |e| constant so u is constant -> den 0 ->
    degenerate."""
    calm = [20, 21] * 10
    wild = [40, 4] * 10
    clustered = calm + wild
    _daily_events({"view": clustered}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_arch_lm", tmp_path).set_index(
        "event_type"
    )
    assert bool(out.loc["view"]["reject_05"])
    _frames_equal(
        out.reset_index(), _duck_oracle("timeseries_arch_lm", tmp_path)
    )
    # flat series in its OWN fixture (a shared fixture zero-pads the
    # day grid to the union span): increments +/-4 demeaned -> u = 16
    # constant -> zero variance -> degenerate
    d2 = tmp_path / "flat"
    d2.mkdir()
    _daily_events({"click": [10, 14] * 12}).to_parquet(
        d2 / "events.parquet", index=False
    )
    out2 = _collect(spark, "timeseries_arch_lm", d2)
    assert bool(out2.iloc[0]["degenerate"])
    _frames_equal(out2, _duck_oracle("timeseries_arch_lm", d2))


def test_arch_lm_numpy_replay(spark, tmp_path):
    rng = np.random.default_rng(7)
    series = np.abs(rng.normal(20, 5, 40)).round().astype(int).tolist()
    _daily_events({"view": series}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_arch_lm", tmp_path).iloc[0]
    d = np.diff(np.asarray(series, float))
    md = round(d.mean())
    u = (d - md) ** 2
    uu, vv = u[1:], u[:-1]
    n = len(uu)
    num = n * (uu * vv).sum() - uu.sum() * vv.sum()
    den_u = n * (uu * uu).sum() - uu.sum() ** 2
    den_v = n * (vv * vv).sum() - vv.sum() ** 2
    lm = n * (num / den_u) * (num / den_v)
    assert abs(int(out["arch_lm_e6"]) - round(lm * 1e6)) <= 5
    _frames_equal(
        _collect(spark, "timeseries_arch_lm", tmp_path),
        _duck_oracle("timeseries_arch_lm", tmp_path),
    )


# ---------------------------------------------------------------------------
# CUSUM of squares
# ---------------------------------------------------------------------------


def test_cusum_squares_variance_switch(spark, tmp_path):
    """Tiny moves for 20 days then huge alternating moves: the IT
    statistic rejects and the changepoint lands at the switch."""
    quiet = [50, 51] * 10
    loud = [90, 10] * 10
    series = quiet + loud
    _daily_events({"view": series}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_cusum_squares", tmp_path).set_index(
        "event_type"
    )
    v = out.loc["view"]
    assert bool(v["reject_05"]) and not bool(v["degenerate"])
    # the deviation peaks at the last quiet increment (k = 19 of 39,
    # day index 19 on the 0-based increment grid -> absolute day 19)
    d = np.diff(np.asarray(series, float))
    u = (d - round(d.mean())) ** 2
    dev = np.abs(np.cumsum(u) / u.sum()
                 - (np.arange(1, len(u) + 1)) / len(u))
    k_star = int(np.argmax(np.round(dev * 1e9)))  # ties -> earliest
    base_day = int(
        (pd.Timestamp("2024-01-01") + pd.Timedelta(hours=1)).value
        // (86_400 * 10**9)
    )
    assert int(v["change_day"]) == base_day + 1 + k_star
    _frames_equal(
        out.reset_index(),
        _duck_oracle("timeseries_cusum_squares", tmp_path),
    )
    # constant series in its OWN fixture (the shared-grid zero-padding
    # lesson): all increments zero -> S_n = 0 -> degenerate row
    d2 = tmp_path / "const"
    d2.mkdir()
    _daily_events({"click": [7] * 30}).to_parquet(
        d2 / "events.parquet", index=False
    )
    out2 = _collect(spark, "timeseries_cusum_squares", d2)
    assert bool(out2.iloc[0]["degenerate"])
    assert pd.isna(out2.iloc[0]["change_day"])
    _frames_equal(out2, _duck_oracle("timeseries_cusum_squares", d2))


# ---------------------------------------------------------------------------
# Markov homogeneity
# ---------------------------------------------------------------------------


def test_markov_homogeneity_planted_switch(spark, tmp_path):
    """First half: every journey goes view->click; second half:
    view->purchase. G^2 is large and the test rejects; identical
    halves on a second fixture give G^2 = 0."""
    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for u in range(20):  # first half pairs (days 0..9)
        rows.append((eid, t0 + pd.Timedelta(days=u % 10), u, "view",
                     1.0, "{}")); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=u % 10, hours=1), u,
                     "click", 1.0, "{}")); eid += 1
    for u in range(100, 120):  # second half pairs (days 20..29)
        rows.append((eid, t0 + pd.Timedelta(days=20 + u % 10), u, "view",
                     1.0, "{}")); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=20 + u % 10, hours=1), u,
                     "purchase", 1.0, "{}")); eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "events_markov_homogeneity", tmp_path)
    r = out.iloc[0]
    assert bool(r["reject_05"]) and not bool(r["degenerate"])
    # G^2 by hand: each half has 20 view->X transitions, pooled
    # p(view->click) = p(view->purchase) = 0.5 -> G^2 = 2*40*ln(2)
    want = 2 * 40 * math.log(2)
    assert abs(int(r["g2_e6"]) - round(want * 1e6)) <= 50
    assert int(r["df"]) == 1
    _frames_equal(out, _duck_oracle("events_markov_homogeneity", tmp_path))


def test_markov_homogeneity_identical_halves(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for u in range(24):
        day = (u % 2) * 20  # half by day 0 vs day 20
        rows.append((eid, t0 + pd.Timedelta(days=day), u, "view",
                     1.0, "{}")); eid += 1
        rows.append((eid, t0 + pd.Timedelta(days=day, hours=2), u,
                     "click", 1.0, "{}")); eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "events_markov_homogeneity", tmp_path)
    r = out.iloc[0]
    assert int(r["g2_e6"]) == 0
    assert not bool(r["reject_05"])
    _frames_equal(out, _duck_oracle("events_markov_homogeneity", tmp_path))


# ---------------------------------------------------------------------------
# Gumbel block maxima
# ---------------------------------------------------------------------------


def test_gumbel_closed_form(spark, tmp_path):
    """Four weekly maxima {10, 20, 30, 40}: mean 25, s = sqrt(500/3),
    beta = s sqrt(6)/pi, mu = 25 - gamma beta, RL4 = mu - beta
    ln(-ln(3/4)) — all checked to the quantization grain."""
    series = []
    for wk, mx in enumerate((10, 20, 30, 40)):
        series += [mx] + [1] * 6  # day 0 of each week carries the max
    _daily_events({"view": series}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_gumbel_block_maxima", tmp_path).iloc[0]
    assert int(out["n_blocks"]) == 4
    assert int(out["observed_max"]) == 40
    mean, sd = 25.0, math.sqrt(((15**2 + 5**2) * 2) / 3)
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(0.75))
    assert abs(int(out["gumbel_mu_e6"]) - round(mu * 1e6)) <= 2
    assert abs(int(out["gumbel_beta_e6"]) - round(beta * 1e6)) <= 2
    assert abs(int(out["return_level_4wk_e6"]) - round(rl * 1e6)) <= 2
    assert not bool(out["degenerate"])
    _frames_equal(
        _collect(spark, "stats_gumbel_block_maxima", tmp_path),
        _duck_oracle("stats_gumbel_block_maxima", tmp_path),
    )


# ---------------------------------------------------------------------------
# IVF-PQ trade-off
# ---------------------------------------------------------------------------


def _emb_df(vecs, labels=None) -> pd.DataFrame:
    arr = [np.asarray(v, dtype=np.float32) for v in vecs]
    n = len(arr)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": arr,
            "label": np.asarray(
                labels if labels is not None else [i % 3 for i in range(n)],
                dtype=np.int32,
            ),
        }
    )


def test_ivfpq_tradeoff_monotone_and_anchored(spark, tmp_path):
    """Recall is non-decreasing and scanned count strictly increasing
    in nprobe (distinct non-empty cells); the nprobe-4 point must agree
    with the registered similarity_ivfpq_topk pipeline's recall."""
    rng = np.random.default_rng(11)
    vecs, labels = [], []
    for i in range(60):
        c = i % 6
        v = np.zeros(64)
        v[c] = 1.0
        v += 0.05 * rng.normal(size=64)
        vecs.append(v / np.linalg.norm(v))
        labels.append(c)
    _emb_df(vecs, labels).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "similarity_ivfpq_tradeoff", tmp_path)
    assert list(out["nprobe"]) == [1, 2, 4, 8]
    rec = list(out["recall_e4"])
    scan = list(out["n_scanned"])
    assert all(b >= a for a, b in zip(rec, rec[1:]))
    assert all(b > a for a, b in zip(scan, scan[1:-1]))  # 8 may saturate
    assert scan[3] >= scan[2]
    _frames_equal(
        out,
        _duck_oracle("similarity_ivfpq_tradeoff", tmp_path, ["embeddings"]),
    )

    from emr_with_custom_metrics_spark.llm.similarity import (
        similarity_ivfpq_topk,
        similarity_topk_exact,
    )

    top = similarity_ivfpq_topk(spark, str(tmp_path)).toPandas()
    exact = similarity_topk_exact(spark, str(tmp_path)).toPandas()
    hits = len(set(top["vec_id"]) & set(exact["vec_id"]))
    assert int(out[out["nprobe"] == 4]["n_hits"].iloc[0]) == hits


# ---------------------------------------------------------------------------
# Hubness
# ---------------------------------------------------------------------------


def test_hubness_planted_hub(spark, tmp_path):
    """Six cluster vectors plus one central vector similar to ALL of
    them: the central vector appears in every top-4 list (k-occurrence
    = 6), the clusters mostly point at each other — max_occ and the
    zero row count are exact by construction."""
    vecs = []
    # two tight clusters of 3 in dims 0 and 1
    for c, n in ((0, 3), (1, 3)):
        for i in range(n):
            v = np.zeros(8)
            v[c] = 1.0
            v[7] = 0.3  # shared component pointing at the hub
            vecs.append(v / np.linalg.norm(v))
    hub = np.zeros(8)
    hub[7] = 1.0
    hub[0] = hub[1] = 0.25
    vecs.append(hub / np.linalg.norm(hub))
    _emb_df(vecs, [0] * 7).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "embedding_hubness", tmp_path).iloc[0]
    assert int(out["n_vectors"]) == 7
    assert int(out["max_occ"]) == 6  # the hub is in everyone's top-4
    assert not bool(out["degenerate"])
    _frames_equal(
        _collect(spark, "embedding_hubness", tmp_path),
        _duck_oracle("embedding_hubness", tmp_path, ["embeddings"]),
    )


def test_hubness_isolated_vectors_are_antihubs(spark, tmp_path):
    """Orthogonal vectors (cosine 0 < floor): nobody has neighbors,
    every vector is an antihub, variance 0 -> degenerate."""
    vecs = []
    for i in range(5):
        v = np.zeros(8)
        v[i] = 1.0
        vecs.append(v)
    _emb_df(vecs, [0] * 5).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "embedding_hubness", tmp_path).iloc[0]
    assert int(out["n_antihubs"]) == 5
    assert bool(out["degenerate"])
    _frames_equal(
        _collect(spark, "embedding_hubness", tmp_path),
        _duck_oracle("embedding_hubness", tmp_path, ["embeddings"]),
    )


# ---------------------------------------------------------------------------
# Silhouette
# ---------------------------------------------------------------------------


def test_silhouette_separated_vs_scrambled(spark, tmp_path):
    """Two orthogonal clusters, correct labels: silhouette near 1 for
    every label; with one vector mislabeled, its class mean drops and
    the misassigned count flags it."""
    def emb(labels):
        rng = np.random.default_rng(5)
        vecs = []
        for i in range(8):
            v = np.zeros(16)
            v[0 if i < 4 else 1] = 1.0
            v += 0.01 * rng.normal(size=16)
            vecs.append(v / np.linalg.norm(v))
        return _emb_df(vecs, labels)

    emb([0, 0, 0, 0, 1, 1, 1, 1]).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "cluster_silhouette_labels", tmp_path)
    assert len(out) == 2
    assert (out["mean_sil_e6"] > 900_000).all()
    assert (out["n_negative"] == 0).all()
    _frames_equal(
        out,
        _duck_oracle("cluster_silhouette_labels", tmp_path, ["embeddings"]),
    )
    d2 = tmp_path / "scr"
    d2.mkdir()
    emb([0, 0, 0, 1, 1, 1, 1, 0]).to_parquet(
        d2 / "embeddings.parquet", index=False
    )
    out2 = _collect(spark, "cluster_silhouette_labels", d2)
    assert int(out2["n_negative"].sum()) == 2  # the two swapped vectors
    _frames_equal(
        out2, _duck_oracle("cluster_silhouette_labels", d2, ["embeddings"])
    )


def test_silhouette_single_label_degenerate(spark, tmp_path):
    v = np.zeros(16)
    v[0] = 1.0
    _emb_df([v, v], [3, 3]).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "cluster_silhouette_labels", tmp_path)
    assert len(out) == 1
    assert bool(out.iloc[0]["degenerate"])
    assert pd.isna(out.iloc[0]["mean_sil_e6"])
    _frames_equal(
        out,
        _duck_oracle("cluster_silhouette_labels", tmp_path, ["embeddings"]),
    )


# ---------------------------------------------------------------------------
# Anisotropy
# ---------------------------------------------------------------------------


def test_anisotropy_closed_forms(spark, tmp_path):
    """Identical vectors -> E[cos] = 1 exactly; orthogonal basis
    vectors -> E[cos] = 0 exactly."""
    v = np.zeros(8)
    v[3] = 2.0  # non-unit input: normalization is part of the op
    _emb_df([v, v, v], [0, 0, 0]).to_parquet(
        tmp_path / "embeddings.parquet", index=False
    )
    out = _collect(spark, "embedding_anisotropy", tmp_path).iloc[0]
    assert int(out["anisotropy_e9"]) == 1_000_000_000
    assert int(out["mean_vector_norm_e6"]) == 1_000_000
    _frames_equal(
        _collect(spark, "embedding_anisotropy", tmp_path),
        _duck_oracle("embedding_anisotropy", tmp_path, ["embeddings"]),
    )

    d2 = tmp_path / "orth"
    d2.mkdir()
    vecs = []
    for i in range(4):
        w = np.zeros(8)
        w[i] = 1.0
        vecs.append(w)
    _emb_df(vecs, [0] * 4).to_parquet(d2 / "embeddings.parquet", index=False)
    out2 = _collect(spark, "embedding_anisotropy", d2).iloc[0]
    assert int(out2["anisotropy_e9"]) == 0
    assert int(out2["n_zero_norm"]) == 0
    _frames_equal(
        _collect(spark, "embedding_anisotropy", d2),
        _duck_oracle("embedding_anisotropy", d2, ["embeddings"]),
    )


# ---------------------------------------------------------------------------
# Wave 15d
# ---------------------------------------------------------------------------


def test_turning_points_extremes(spark, tmp_path):
    """A perfectly alternating series turns at EVERY interior point
    (T = n-2, huge positive z); a monotone ramp never turns (T = 0,
    huge negative z) — both reject randomness, from opposite sides."""
    alt = [5 if i % 2 == 0 else 9 for i in range(24)]
    ramp = list(range(1, 25))
    _daily_events({"view": alt, "click": ramp}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_turning_points", tmp_path).set_index(
        "event_type"
    )
    v, c = out.loc["view"], out.loc["click"]
    assert int(v["n_turns"]) == 22 and int(v["z_e6"]) > 0
    assert int(c["n_turns"]) == 0 and int(c["z_e6"]) < 0
    assert bool(v["reject_05"]) and bool(c["reject_05"])
    n = 24
    z = (22 - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    assert int(v["z_e6"]) == round(z * 1e6)
    _frames_equal(
        out.reset_index(),
        _duck_oracle("timeseries_turning_points", tmp_path),
    )


def _docs(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df["doc_id"] = df["doc_id"].astype(np.int64)
    df["n_chars"] = df["n_chars"].astype(np.int64)
    return df


def test_lognormal_fit_two_point_and_degenerate(spark, tmp_path):
    """Two lengths {4, 16} in equal measure: mu = (ln4 + ln16)/2 =
    ln 8, sigma = |ln4 - ln16|/2 ... checked via the quantized-moment
    replay; a single-length source flags degenerate with mu = ln L."""
    rows = []
    did = 0
    for _ in range(6):
        rows.append((did, "t " * 3 + "t", "en", "two", 8)); did += 1
        rows.append((did, "t " * 15 + "t", "en", "two", 32)); did += 1
    for _ in range(4):
        rows.append((did, "a b c d e", "en", "mono", 9)); did += 1
    _docs(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "corpus_length_lognormal_fit", tmp_path).set_index(
        "source"
    )
    two = out.loc["two"]
    l4, l16 = round(math.log(4) * 1e9), round(math.log(16) * 1e9)
    mu = (l4 + l16) / 2 / 1e9
    s1, s2 = 6 * (l4 + l16), 6.0 * (l4 * l4 + l16 * l16)
    sigma = math.sqrt((s2 - (s1 ** 2) / 12) / 11) / 1e9
    assert int(two["n_docs"]) == 12
    assert abs(int(two["mu_e6"]) - round(mu * 1e6)) <= 1
    assert abs(int(two["sigma_e6"]) - round(sigma * 1e6)) <= 1
    assert int(two["ks_e6"]) > 0 and not bool(two["degenerate"])
    mono = out.loc["mono"]
    assert bool(mono["degenerate"])
    assert abs(int(mono["mu_e6"]) - round(math.log(5) * 1e6)) <= 1
    _frames_equal(
        out.reset_index(),
        _duck_oracle("corpus_length_lognormal_fit", tmp_path, ["documents"]),
    )


def test_pack_nextfit_hand_computed(spark, tmp_path):
    """Lengths [100, 60, 100, 30, 600] in doc order: next-fit bins by
    hand for each block size, with the 600-token doc truncated
    everywhere."""
    rows = []
    for i, ln in enumerate((100, 60, 100, 30, 600)):
        rows.append((i, " ".join(["w"] * ln), "en", "s", ln * 2))
    _docs(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "pack_nextfit_tradeoff", tmp_path).set_index(
        "block_size"
    )
    # B=128: 100 | 60 | 100 | 30+... 100+30=130>128 -> new bin 30, then
    # 600->128 doesn't fit 30+128 -> new bin. bins: [100],[60],[100],
    # [30],[128] = 5 bins, packed 418
    b = out.loc[128]
    assert int(b["n_bins"]) == 5 and int(b["packed_tokens"]) == 418
    assert int(b["n_truncated"]) == 1
    assert int(b["bins_lower_bound"]) == math.ceil(418 / 128)
    # B=256: [100+60] -> +100=260>256 -> [100+30] -> +256>256 ->
    # [256]: 3 bins, packed 546
    b = out.loc[256]
    assert int(b["n_bins"]) == 3 and int(b["packed_tokens"]) == 546
    # B=512: [100+60+100+30=290] -> +512>512 -> [512]: 2 bins
    b = out.loc[512]
    assert int(b["n_bins"]) == 2 and int(b["packed_tokens"]) == 802
    waste = round((2 * 512 - 802) / (2 * 512) * 1e6)
    assert int(b["waste_frac_e6"]) == waste
    _frames_equal(
        out.reset_index(),
        _duck_oracle("pack_nextfit_tradeoff", tmp_path, ["documents"]),
    )


def test_recursive_cl_diversity_planted_classes(spark, tmp_path):
    """Three classes on one day (one dow): counts [8,2,1] passes
    (8 < 3*3 strictly — 9 would TIE and tie counts as violating),
    [30,2] violates (30 >= 6), a single-value class is a maximal
    violation and counted separately."""
    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for et, cnt in (("view", 8), ("click", 2), ("purchase", 1)):
        for _ in range(cnt):
            rows.append((eid, t0, 1, et, 5.0, "{}")); eid += 1
    for et, cnt in (("view", 30), ("click", 2)):
        for _ in range(cnt):
            rows.append((eid, t0, 1, et, 30.0, "{}")); eid += 1
    for _ in range(7):
        rows.append((eid, t0, 1, "error", 55.0, "{}")); eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "dq_recursive_cl_diversity", tmp_path).iloc[0]
    assert int(out["n_classes"]) == 3
    assert int(out["n_violating"]) == 2
    assert int(out["n_rows_at_risk"]) == 32 + 7
    assert int(out["n_single_value_classes"]) == 1
    assert int(out["worst_head_tail_ratio_e6"]) == 15_000_000  # 30/2
    _frames_equal(
        _collect(spark, "dq_recursive_cl_diversity", tmp_path),
        _duck_oracle("dq_recursive_cl_diversity", tmp_path),
    )


def test_poisson_rate_ratio_planted_and_degenerate(spark, tmp_path):
    """Arm A gets a 10x error rate: RR and z by hand via the hashlib
    arm replay; a fixture with zero errors flags degenerate."""
    arm_of = lambda u: "A" if _md5_nibble(f"ab|{u}") < 8 else "B"  # noqa: E731
    a_users = [u for u in range(500) if arm_of(u) == "A"][:5]
    b_users = [u for u in range(500) if arm_of(u) == "B"][:5]
    t0 = pd.Timestamp("2024-01-01")
    rows, eid = [], 0
    for u in a_users:  # 20 events each, 10 errors
        for i in range(20):
            et = "error" if i < 10 else "view"
            rows.append((eid, t0, u, et, 1.0, "{}")); eid += 1
    for u in b_users:  # 20 events each, 1 error
        for i in range(20):
            et = "error" if i < 1 else "view"
            rows.append((eid, t0, u, et, 1.0, "{}")); eid += 1
    _events(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_poisson_rate_ratio", tmp_path).iloc[0]
    xa, na, xb, nb = 50, 100, 5, 100
    assert int(out["errors_a"]) == xa and int(out["errors_b"]) == xb
    rr = (xa / na) / (xb / nb)
    z = math.log((xa * nb) / (xb * na)) / math.sqrt(1 / xa + 1 / xb)
    assert int(out["rate_ratio_e6"]) == round(rr * 1e6)
    assert abs(int(out["z_e6"]) - round(z * 1e6)) <= 1
    assert bool(out["reject_05"]) and not bool(out["degenerate"])
    _frames_equal(
        _collect(spark, "stats_poisson_rate_ratio", tmp_path),
        _duck_oracle("stats_poisson_rate_ratio", tmp_path),
    )

    d2 = tmp_path / "noerr"
    d2.mkdir()
    _events([(0, t0, 1, "view", 1.0, "{}"),
             (1, t0, 600, "view", 1.0, "{}")]).to_parquet(
        d2 / "events.parquet", index=False
    )
    out2 = _collect(spark, "stats_poisson_rate_ratio", d2).iloc[0]
    assert bool(out2["degenerate"])
    _frames_equal(
        _collect(spark, "stats_poisson_rate_ratio", d2),
        _duck_oracle("stats_poisson_rate_ratio", d2),
    )


# ---------------------------------------------------------------------------
# structural pins
# ---------------------------------------------------------------------------


def test_privacy_family_qi_expressions_pinned_to_triad():
    """dq_delta_presence and dq_recursive_cl_diversity re-state the
    triad's QI expressions (they need columns the triad's CTE drops),
    so this pin asserts the dow / value-band formulas appear verbatim
    in wave9g's _LDIV_QI — the five privacy screens cannot drift to
    different class grids without this test failing."""
    from emr_with_custom_metrics_spark.operators.wave9g import _LDIV_QI
    from emr_with_custom_metrics_spark.operators.wave15a import (
        _DP_QI_BAND,
        _DP_QI_DOW,
    )
    from emr_with_custom_metrics_spark.operators.wave15d import _RCL_TMPL

    assert _DP_QI_DOW == "{EPOCH_DAY} % 7"
    assert _DP_QI_DOW in _LDIV_QI
    assert _DP_QI_BAND in _LDIV_QI
    assert "{EPOCH_DAY} % 7" in _RCL_TMPL
    assert "CAST(FLOOR(value / 25) AS BIGINT)" in _RCL_TMPL


def test_tradeoff_oracle_slices_registered_ivfpq_text():
    """The trade-off sweep's oracle must embed the EXACT registered
    similarity_ivfpq_topk text at nprobe 4 (the slice discipline)."""
    from emr_with_custom_metrics_spark.llm.similarity import (
        _SQL_IVFPQ_TOPK,
        _ivfpq_sql,
    )
    from emr_with_custom_metrics_spark.registry import all_specs

    assert _ivfpq_sql(4) == _SQL_IVFPQ_TOPK
    assert all_specs()["similarity_ivfpq_topk"].oracle == _SQL_IVFPQ_TOPK
    assert _SQL_IVFPQ_TOPK in all_specs()["similarity_ivfpq_tradeoff"].oracle
