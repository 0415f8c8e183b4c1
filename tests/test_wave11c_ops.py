"""Behavior tests for wave 11c (control charts, drift, exact inference,
sessionization): numpy replays including a hashlib replay of the
deterministic permutation scheme, plus engineered-shift fixtures that
must trip the detectors.
"""

from __future__ import annotations

import hashlib
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


def _hourly(sf_dir=SF_SMOKE_DIR):
    ev = _events(sf_dir)
    h = (ev["us"] // 3_600_000_000).to_numpy()
    lo, hi = h.min(), h.max()
    out = {}
    for t, g in ev.groupby("event_type"):
        series = np.zeros(hi - lo + 1, dtype=np.int64)
        np.add.at(series, (g["us"].to_numpy() // 3_600_000_000) - lo, 1)
        out[t] = series
    return out


def _events_frame(values_by_hour, event_type="view", base_users=True):
    """One event per (hour, i) so the hourly count series equals
    values_by_hour exactly."""
    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-01-01")
    for h, cnt in enumerate(values_by_hour):
        for i in range(cnt):
            rows.append(
                (eid, t0 + pd.Timedelta(hours=h, seconds=i), eid % 7, event_type, 1.0)
            )
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    return df


# ---------------------------------------------------------------------------
# Western Electric
# ---------------------------------------------------------------------------


def _we_replay(series):
    n = len(series)
    s1, s2 = int(series.sum()), int((series.astype(object) ** 2).sum())
    A = n * s2 - s1 * s1
    d = series * n - s1

    def beyond(k):
        above = (d > 0) & (d.astype(object) ** 2 * (n - 1) > k * k * n * A)
        below = (d < 0) & (d.astype(object) ** 2 * (n - 1) > k * k * n * A)
        return above.astype(int), below.astype(int)

    ab0, be0 = (d > 0).astype(int), (d < 0).astype(int)
    ab1, be1 = beyond(1)
    ab2, be2 = beyond(2)
    ab3, be3 = beyond(3)

    def winsum(x, w):
        c = np.convolve(x, np.ones(w, dtype=int), "full")[: len(x)]
        return c

    r1 = ((ab3 + be3) > 0).astype(int)
    r2 = np.zeros(n, int)
    r3 = np.zeros(n, int)
    r4 = np.zeros(n, int)
    for t in range(n):
        if t >= 2:
            r2[t] = int(ab2[t - 2 : t + 1].sum() >= 2 or be2[t - 2 : t + 1].sum() >= 2)
        if t >= 4:
            r3[t] = int(ab1[t - 4 : t + 1].sum() >= 4 or be1[t - 4 : t + 1].sum() >= 4)
        if t >= 7:
            r4[t] = int(ab0[t - 7 : t + 1].sum() == 8 or be0[t - 7 : t + 1].sum() == 8)
    return (
        int(r1.sum()),
        int(r2.sum()),
        int(r3.sum()),
        int(r4.sum()),
        int(((r1 + r2 + r3 + r4) > 0).sum()),
    )


def test_western_electric_matches_replay(spark):
    out = _collect(spark, "spc_western_electric").set_index("event_type")
    for t, series in _hourly().items():
        r1, r2, r3, r4, fl = _we_replay(series)
        r = out.loc[t]
        assert (
            int(r["rule1_points"]),
            int(r["rule2_points"]),
            int(r["rule3_points"]),
            int(r["rule4_points"]),
            int(r["flagged_points"]),
        ) == (r1, r2, r3, r4, fl)


def test_western_electric_flags_engineered_shift(spark, tmp_path):
    """A flat series with a sustained step: rule 4 (8 in a row same
    side) must fire on the shifted stretch, and a single huge spike
    must fire rule 1."""
    vals = [10] * 30 + [14] * 12 + [10] * 20 + [60] + [10] * 10
    _events_frame(vals).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "spc_western_electric", str(tmp_path)).iloc[0]
    assert int(out["rule4_points"]) >= 1
    assert int(out["rule1_points"]) >= 1
    assert _we_replay(np.array(vals, dtype=np.int64)) == (
        int(out["rule1_points"]),
        int(out["rule2_points"]),
        int(out["rule3_points"]),
        int(out["rule4_points"]),
        int(out["flagged_points"]),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley
# ---------------------------------------------------------------------------


def _ph_replay(series):
    n = len(series)
    srun = np.cumsum(series)
    terms = _rha((series - srun / np.arange(1, n + 1)) * 1e6)
    M = np.cumsum(terms)
    runmin = np.minimum.accumulate(M)
    ph = M - runmin
    t_alarm = int(np.argmax(ph))  # earliest argmax (np.argmax takes first)
    s1, s2 = int(series.sum()), int((series.astype(object) ** 2).sum())
    sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    lam = int(_rha(5 * sd * 1e6)[()])
    return int(ph[t_alarm]), t_alarm, lam


def test_page_hinkley_matches_replay(spark):
    out = _collect(spark, "timeseries_page_hinkley").set_index("event_type")
    for t, series in _hourly().items():
        ph, t_alarm, lam = _ph_replay(series)
        r = out.loc[t]
        assert int(r["ph_e6"]) == ph
        assert int(r["t_alarm"]) == t_alarm
        assert int(r["lambda_e6"]) == lam
        assert bool(r["drift_detected"]) == (ph > lam)


def test_page_hinkley_detects_level_shift(spark, tmp_path):
    """Mean steps up 3x halfway: the running-mean PH walk must clear
    the 5-sigma lambda of the (now bimodal) series."""
    vals = [5] * 60 + [15] * 60
    _events_frame(vals).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "timeseries_page_hinkley", str(tmp_path)).iloc[0]
    assert bool(out["drift_detected"])
    assert int(out["t_alarm"]) >= 60  # alarm inside the shifted regime


# ---------------------------------------------------------------------------
# Cramér-von Mises
# ---------------------------------------------------------------------------


def test_cvm_matches_replay(spark):
    out = _collect(spark, "stats_cvm_twosample").set_index("event_type")
    ev = _events()
    v = ev["v_e3"].to_numpy()
    for t in ev["event_type"].unique():
        x = np.sort(ev.loc[ev["event_type"] == t, "v_e3"].to_numpy())
        n, N = len(x), len(v)
        m = N - n
        uniq, l = np.unique(v, return_counts=True)
        B = np.cumsum(l)
        M = np.searchsorted(x, uniq, side="right")
        s = 0
        for j in range(len(uniq)):
            num = float(int(M[j]) * N - int(B[j]) * n)
            term = num * num * int(l[j]) / (float(N) * N) / n / m
            s += int(_rha(term * 1e9)[()])
        r = out.loc[t]
        assert (int(r["n_focal"]), int(r["m_rest"])) == (n, m)
        assert int(r["t_cvm_e9"]) == s
        assert bool(r["reject_h0"]) == (s > 461000000)


# ---------------------------------------------------------------------------
# Permutation test
# ---------------------------------------------------------------------------


def _nib(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16)


def test_permutation_matches_hashlib_replay(spark):
    out = _collect(spark, "stats_permutation_test").set_index("event_type")
    ev = _events()
    B = 200
    for t, g in ev.groupby("event_type"):
        per_user = g.groupby("user_id")["v_e3"].agg(["count", "sum"])
        obs_a = per_user[[_nib(f"ab|{u}") < 8 for u in per_user.index]]
        obs_b = per_user[[_nib(f"ab|{u}") >= 8 for u in per_user.index]]
        na, sa = int(obs_a["count"].sum()), int(obs_a["sum"].sum())
        nb, sb = int(obs_b["count"].sum()), int(obs_b["sum"].sum())
        obs_num, obs_den = abs(sa * nb - sb * na), na * nb
        n_exceed = 0
        for b in range(B):
            mask = np.array([_nib(f"perm|{b}|{u}") < 8 for u in per_user.index])
            ra_n = int(per_user.loc[mask, "count"].sum())
            ra_s = int(per_user.loc[mask, "sum"].sum())
            rb_n = int(per_user.loc[~mask, "count"].sum())
            rb_s = int(per_user.loc[~mask, "sum"].sum())
            if ra_n > 0 and rb_n > 0:
                if abs(ra_s * rb_n - rb_s * ra_n) * obs_den >= obs_num * (
                    ra_n * rb_n
                ):
                    n_exceed += 1
        r = out.loc[t]
        assert (int(r["n_a"]), int(r["n_b"])) == (na, nb)
        assert int(r["n_exceed"]) == n_exceed
        assert int(r["p_value_e6"]) == int(_rha((1 + n_exceed) / (B + 1) * 1e6)[()])
        assert int(r["diff_obs_e6"]) == int(_rha((sa / na - sb / nb) * 1000)[()])


def test_permutation_huge_effect_gets_minimal_p(spark, tmp_path):
    """Arm A users at value 100, arm B at 1: no user re-randomization
    should beat the observed separation -> p = 1/201."""
    users = list(range(400))
    rows = []
    for i, u in enumerate(users):
        v = 100.0 if _nib(f"ab|{u}") < 8 else 1.0
        rows.append((i, pd.Timestamp("2024-01-01"), u, "view", v, "{}"))
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_permutation_test", str(tmp_path)).iloc[0]
    assert int(out["n_exceed"]) == 0
    assert int(out["p_value_e6"]) == int(_rha(1 / 201 * 1e6)[()])


# ---------------------------------------------------------------------------
# Sessionization
# ---------------------------------------------------------------------------


def test_sessionize_matches_pandas_islands(spark):
    out = _collect(spark, "events_sessionize_batch")
    ev = _events().sort_values(["user_id", "us"])
    sessions = []
    for u, g in ev.groupby("user_id"):
        us = g["us"].to_numpy()
        brk = np.concatenate([[1], (np.diff(us) > 1_800_000_000).astype(int)])
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            seg = us[sid == s]
            sessions.append((len(seg), int(seg.max() - seg.min())))
    df = pd.DataFrame(sessions, columns=["len", "dur"])
    W = len(df)
    durs = np.sort(df["dur"].to_numpy())
    med2 = int(durs[(W + 1) // 2 - 1]) + int(durs[(W + 2) // 2 - 1])
    hist = df.groupby("len").size()
    assert int(out.iloc[0]["n_sessions_total"]) == W
    assert int(out.iloc[0]["median_duration_x2_us"]) == med2
    for _, r in out.iterrows():
        assert int(r["n_sessions_at_len"]) == int(hist.loc[int(r["session_len"])])
    assert int(out["n_sessions_at_len"].sum()) == W
    assert int(out.iloc[0]["n_users"]) == ev["user_id"].nunique()


# ---------------------------------------------------------------------------
# Order-statistic CI
# ---------------------------------------------------------------------------


def test_quantile_ci_matches_rank_bracket(spark):
    out = _collect(spark, "stats_quantile_ci")
    ev = _events()
    for _, r in out.iterrows():
        x = np.sort(ev.loc[ev["event_type"] == r["event_type"], "v_e3"].to_numpy())
        n = len(x)
        lo = max(1, math.floor((n - 1.96 * math.sqrt(n)) / 2))
        hi = min(n, math.ceil(1 + (n + 1.96 * math.sqrt(n)) / 2))
        assert (int(r["l_rank"]), int(r["u_rank"])) == (lo, hi)
        assert int(r["ci_lo_e3"]) == int(x[lo - 1])
        assert int(r["ci_hi_e3"]) == int(x[hi - 1])
        med2 = int(x[(n + 1) // 2 - 1]) + int(x[(n + 2) // 2 - 1])
        assert int(r["median_x2_e3"]) == med2
        assert int(r["ci_lo_e3"]) * 2 <= med2 <= int(r["ci_hi_e3"]) * 2
