"""Behavior tests for waves 11a (classical nonparametric/categorical
inference) and 11b (classifier eval + agreement): independent
numpy/pandas replays of every statistic, plus structural invariants
(confusion-count conservation, CI ordering, median-pick conventions).
scipy is absent in this container — rank statistics are re-derived in
numpy by hand.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR, SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    """SQL ROUND: half away from zero (np.round is banker's)."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _events(sf_dir=SF_SMOKE_DIR):
    return duckdb.sql(
        "SELECT event_id, user_id, event_type, "
        "CAST(ROUND(value*1000) AS BIGINT) AS v_e3, epoch_us(ts) AS us "
        f"FROM '{sf_dir}/events.parquet'"
    ).df()


def _hourly():
    """Dense per-metric hourly count series (the stats spine)."""
    ev = _events()
    h = (ev["us"] // 3_600_000_000).to_numpy()
    lo, hi = h.min(), h.max()
    out = {}
    for t, g in ev.groupby("event_type"):
        series = np.zeros(hi - lo + 1, dtype=np.int64)
        hh = (g["us"].to_numpy() // 3_600_000_000) - lo
        np.add.at(series, hh, 1)
        out[t] = series
    return out


# ---------------------------------------------------------------------------
# wave 11a
# ---------------------------------------------------------------------------


def test_mcnemar_matches_replay(spark):
    # sf0.01: the smoke corpus has too few users for any discordant
    # pair, which would leave the continuity-corrected path untested
    out = _collect(spark, "stats_mcnemar_paired", sf_dir=SF_DIR).iloc[0]
    ev = _events(SF_DIR)
    mid = math.floor((ev["us"].min() + ev["us"].max()) / 2.0)
    y = ev.assign(p=(ev["event_type"] == "purchase").astype(int))
    g = y.groupby("user_id").apply(
        lambda d: pd.Series(
            {
                "y1": int(d.loc[d["us"] <= mid, "p"].max() if (d["us"] <= mid).any() else 0),
                "y2": int(d.loc[d["us"] > mid, "p"].max() if (d["us"] > mid).any() else 0),
            }
        ),
        include_groups=False,
    )
    b = int(((g["y1"] == 1) & (g["y2"] == 0)).sum())
    c = int(((g["y1"] == 0) & (g["y2"] == 1)).sum())
    assert int(out["disc_b"]) == b and int(out["disc_c"]) == c
    assert int(out["n_users"]) == len(g)
    if b + c == 0:
        assert int(out["chi2_cc_e6"]) == 0 and not bool(out["reject_h0"])
    else:
        d = max(abs(b - c) - 1, 0)
        assert int(out["chi2_cc_e6"]) == int(_rha(d * d / (b + c) * 1e6)[()])
        assert bool(out["reject_h0"]) == (d * d / (b + c) > 3.841)


def test_kendall_tau_matches_bruteforce(spark):
    out = _collect(spark, "stats_kendall_tau_pairs")
    ev = _events()
    hm = (
        ev.assign(h=ev["us"] // 3_600_000_000)
        .groupby(["event_type", "h"])["v_e3"]
        .agg(["sum", "count"])
        .reset_index()
    )
    types = sorted(ev["event_type"].unique())
    for _, r in out.iterrows():
        a = hm[hm["event_type"] == r["type_a"]].set_index("h")
        b = hm[hm["event_type"] == r["type_b"]].set_index("h")
        hs = sorted(set(a.index) & set(b.index))
        ma = [(int(a.loc[h, "sum"]), int(a.loc[h, "count"])) for h in hs]
        mb = [(int(b.loc[h, "sum"]), int(b.loc[h, "count"])) for h in hs]
        C = D = Ta = Tb = 0
        n = len(hs)
        for i in range(n):
            for j in range(i + 1, n):
                da = ma[i][0] * ma[j][1] - ma[j][0] * ma[i][1]
                db = mb[i][0] * mb[j][1] - mb[j][0] * mb[i][1]
                if da == 0:
                    Ta += 1
                if db == 0:
                    Tb += 1
                if da * db > 0:
                    C += 1
                elif da != 0 and db != 0:
                    D += 1
        n0 = n * (n - 1) // 2
        assert int(r["n0"]) == n0
        assert (int(r["concordant"]), int(r["discordant"])) == (C, D)
        assert (int(r["ties_a"]), int(r["ties_b"])) == (Ta, Tb)
        if n0 > Ta and n0 > Tb:
            tau = (C - D) / math.sqrt((n0 - Ta) * (n0 - Tb))
            assert int(r["tau_b_e9"]) == int(_rha(tau * 1e9)[()])
    assert len(out) == len(types) * (len(types) - 1) // 2


def test_kruskal_wallis_matches_midrank_replay(spark):
    out = _collect(spark, "stats_kruskal_wallis")
    ev = _events()
    v = ev["v_e3"].to_numpy()
    order = np.argsort(v, kind="stable")
    # midranks via the doubled-rank identity
    uniq, counts = np.unique(v, return_counts=True)
    cumb = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank2 = {int(u): 2 * int(cb) + int(c) + 1 for u, cb, c in zip(uniq, cumb, counts)}
    N = len(v)
    groups = {}
    for t, g in ev.groupby("event_type"):
        r2 = sum(rank2[int(x)] for x in g["v_e3"])
        groups[t] = (len(g), r2)
    H = 3 * sum(r2**2 / n for n, r2 in groups.values()) / (N * (N + 1)) - 3 * (N + 1)
    t3 = int(sum(int(c) ** 3 - int(c) for c in counts))
    corr = 1 - t3 / (N**3 - N)
    for _, r in out.iterrows():
        n_i, r2_i = groups[r["event_type"]]
        assert int(r["n_i"]) == n_i and int(r["rank_sum_x2"]) == r2_i
        # per-group e6 quantization before the cross-group sum drifts
        # the total by at most 0.5 ulp per group
        assert abs(int(r["h_e6"]) - H * 1e6) <= len(groups) * 0.5 + 1
        assert abs(int(r["h_adj_e6"]) - H / corr * 1e6) <= len(groups) + 2
        assert int(r["df"]) == len(groups) - 1


def test_runs_test_matches_replay(spark):
    out = _collect(spark, "stats_runs_test").set_index("event_type")
    for t, series in _hourly().items():
        n = len(series)
        sv = np.sort(series)
        med2 = int(sv[(n + 1) // 2 - 1]) + int(sv[(n + 2) // 2 - 1])
        kept = series[2 * series != med2]
        sgn = np.where(2 * kept > med2, 1, -1)
        a, b = int((sgn == 1).sum()), int((sgn == -1).sum())
        runs = 1 + int((sgn[1:] != sgn[:-1]).sum())
        r = out.loc[t]
        assert (int(r["n_above"]), int(r["n_below"]), int(r["n_runs"])) == (a, b, runs)
        mu = 2 * a * b / (a + b) + 1
        var = 2 * a * b * (2 * a * b - a - b) / ((a + b) ** 2 * (a + b - 1))
        if a > 0 and b > 0 and var > 0:
            z = (runs - mu) / math.sqrt(var)
            assert int(r["z_e6"]) == int(_rha(z * 1e6)[()])
            assert bool(r["reject_h0"]) == (abs(int(r["z_e6"])) > 1960000)


def test_wilson_interval_matches_formula_and_orders(spark):
    out = _collect(spark, "stats_wilson_ci")
    ev = _events()
    per = ev.groupby(["event_type", "user_id"]).size().reset_index(name="k")
    for _, r in out.iterrows():
        g = per[per["event_type"] == r["event_type"]]
        n, k = len(g), int((g["k"] >= 2).sum())
        assert (int(r["n_users"]), int(r["repeaters"])) == (n, k)
        p = k / n
        z2 = 3.8416
        denom = 1 + z2 / n
        center = (p + z2 / (2.0 * n)) / denom
        half = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) / denom
        assert int(r["wilson_lo_e9"]) == int(_rha((center - half) * 1e9)[()])
        assert int(r["wilson_hi_e9"]) == int(_rha((center + half) * 1e9)[()])
        assert 0 <= int(r["wilson_lo_e9"]) <= int(r["p_hat_e9"]) <= int(
            r["wilson_hi_e9"]
        ) <= 10**9


def test_cochran_armitage_matches_replay(spark):
    out = _collect(spark, "stats_cochran_armitage")
    od = duckdb.sql(
        "SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS dose, "
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y "
        f"FROM '{SF_SMOKE_DIR}/orders.parquet'"
    ).df()
    per = od.groupby("dose")["y"].agg(["count", "sum"])
    N = int(per["count"].sum())
    R = int(per["sum"].sum())
    sw1 = int(sum(d * r["count"] for d, r in per.iterrows()))
    sw2 = int(sum(d * d * r["count"] for d, r in per.iterrows()))
    swr = int(sum(d * r["sum"] for d, r in per.iterrows()))
    A = N * swr - R * sw1
    B = R * (N - R)
    C = N * sw2 - sw1 * sw1
    z = A * math.sqrt(N) / math.sqrt(float(B) * C)
    assert len(out) == 5
    assert (out["z_e6"] == int(_rha(z * 1e6)[()])).all()
    assert (out["reject_h0"] == (abs(int(_rha(z * 1e6)[()])) > 1960000)).all()
    for _, r in out.iterrows():
        assert int(r["n_i"]) == int(per.loc[int(r["dose"]), "count"])
        assert int(r["r_i"]) == int(per.loc[int(r["dose"]), "sum"])


# ---------------------------------------------------------------------------
# wave 11b
# ---------------------------------------------------------------------------


def test_cohen_kappa_matches_replay(spark):
    out = _collect(spark, "ml_cohen_kappa").iloc[0]
    ev = _events()
    v = np.sort(ev["v_e3"].to_numpy())
    n = len(v)
    med2 = int(v[(n + 1) // 2 - 1]) + int(v[(n + 2) // 2 - 1])
    r1 = (2 * ev["v_e3"].to_numpy() > med2).astype(int)
    r2 = ev["event_type"].isin(["purchase", "click"]).to_numpy().astype(int)
    c11 = int(((r1 == 1) & (r2 == 1)).sum())
    c10 = int(((r1 == 1) & (r2 == 0)).sum())
    c01 = int(((r1 == 0) & (r2 == 1)).sum())
    c00 = int(((r1 == 0) & (r2 == 0)).sum())
    assert (int(out["c11"]), int(out["c10"]), int(out["c01"]), int(out["c00"])) == (
        c11, c10, c01, c00,
    )
    po = (c11 + c00) / n
    pe = ((c11 + c10) * (c11 + c01) + (c01 + c00) * (c10 + c00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert int(out["kappa_e9"]) == int(_rha(kappa * 1e9)[()])


def test_confusion_multiclass_conserves_and_matches(spark):
    out = _collect(spark, "ml_confusion_multiclass")
    ev = _events().sort_values(["v_e3", "event_id"]).reset_index(drop=True)
    n = len(ev)
    label = np.where(
        ev["event_type"] == "purchase",
        "buy",
        np.where(ev["event_type"].isin(["click", "view"]), "browse", "other"),
    )
    rn = np.arange(1, n + 1)
    pred = np.where(rn * 3 <= n, "buy", np.where(rn * 3 <= 2 * n, "browse", "other"))
    f1s = {}
    for cls in ("buy", "browse", "other"):
        tp = int(((label == cls) & (pred == cls)).sum())
        fp = int(((label != cls) & (pred == cls)).sum())
        fn = int(((label == cls) & (pred != cls)).sum())
        r = out[out["cls"] == cls].iloc[0]
        assert (int(r["tp"]), int(r["fp"]), int(r["fn"])) == (tp, fp, fn)
        f1s[cls] = int(_rha(2 * tp / (2 * tp + fp + fn) * 1e9)[()]) if 2 * tp + fp + fn else 0
        assert int(r["f1_e9"]) == f1s[cls]
    # micro == accuracy; macro == mean of quantized per-class F1
    acc = int(out["tp"].sum()) / n
    assert int(out.iloc[0]["micro_f1_e9"]) == int(_rha(acc * 1e9)[()])
    assert int(out.iloc[0]["macro_f1_e9"]) == int(
        _rha(sum(f1s.values()) / 3.0)[()]
    )
    # conservation: every row appears once as a label and once as a pred
    assert int(out["tp"].sum() + out["fn"].sum()) == n
    assert int(out["tp"].sum() + out["fp"].sum()) == n


def test_ks_separation_matches_replay(spark):
    out = _collect(spark, "ml_ks_separation").iloc[0]
    ev = _events()
    y = (ev["event_type"] == "purchase").to_numpy(int)
    s = ev["v_e3"].to_numpy()
    P, Q = int(y.sum()), int((1 - y).sum())
    best = (-1, None)
    for thr in np.unique(s):
        cpos = int(((s <= thr) & (y == 1)).sum())
        cneg = int(((s <= thr) & (y == 0)).sum())
        d = abs(cpos * Q - cneg * P)
        if d > best[0]:
            best = (d, int(thr))
    assert (int(out["n_pos"]), int(out["n_neg"])) == (P, Q)
    assert int(out["d_num"]) == best[0]
    assert int(out["best_threshold_e3"]) == best[1]
    assert int(out["ks_e9"]) == int(_rha(best[0] / (P * Q) * 1e9)[()])


def test_logloss_consistent_with_brier_calibration_and_skill_sign(spark):
    out = _collect(spark, "ml_logloss_eval").iloc[0]
    # the constant base-rate forecast can never beat a calibrated one by
    # more than quantization; both payloads positive
    assert int(out["logloss_e6"]) > 0
    assert int(out["logloss_base_e6"]) > 0
    assert int(out["skill_e6"]) == int(out["logloss_base_e6"]) - int(out["logloss_e6"])
    # base-rate forecast logloss equals the entropy of the test labels
    p = int(out["pos_test"]) / int(out["n_test"])
    lnp = int(_rha(math.log(max(min(p, 1 - 1e-9), 1e-9)) * 1e9)[()])
    ln1p = int(_rha(math.log(max(min(1 - p, 1 - 1e-9), 1e-9)) * 1e9)[()])
    n, pos = int(out["n_test"]), int(out["pos_test"])
    base = _rha(-(pos * lnp + (n - pos) * ln1p) / n / 1000)[()]
    assert int(out["logloss_base_e6"]) == int(base)


def test_hodges_lehmann_matches_weighted_median(spark):
    out = _collect(spark, "stats_hodges_lehmann")
    ev = duckdb.sql(
        "SELECT event_type, "
        "CASE WHEN (instr('0123456789abcdef', substring(md5(concat('ab|', "
        "CAST(user_id AS STRING))), 1, 1)) - 1) < 8 THEN 'A' ELSE 'B' END "
        "AS arm, CAST(ROUND(value*10) AS BIGINT) AS v_e1 "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()
    for _, r in out.iterrows():
        g = ev[ev["event_type"] == r["event_type"]]
        xa = np.sort(g.loc[g["arm"] == "A", "v_e1"].to_numpy())
        xb = np.sort(g.loc[g["arm"] == "B", "v_e1"].to_numpy())
        diffs = np.sort((xa[:, None] - xb[None, :]).ravel())
        W = len(diffs)
        assert int(r["n_pairs"]) == W
        lo = int(diffs[(W + 1) // 2 - 1])
        hi = int(diffs[(W + 2) // 2 - 1])
        assert int(r["hl_shift_x2_e1"]) == lo + hi
        assert int(r["hl_shift_e6"]) == int(_rha((lo + hi) / 2.0 * 1e5)[()])


def test_bland_altman_matches_replay(spark):
    out = _collect(spark, "stats_bland_altman")
    ev = _events()
    hm = (
        ev.assign(h=ev["us"] // 3_600_000_000)
        .groupby(["event_type", "h"])["v_e3"]
        .agg(["sum", "count"])
    )
    for _, r in out.iterrows():
        a = hm.loc[r["type_a"]]
        b = hm.loc[r["type_b"]]
        hs = sorted(set(a.index) & set(b.index))
        d = np.array(
            [
                int(
                    _rha(
                        (a.loc[h, "sum"] / a.loc[h, "count"]
                         - b.loc[h, "sum"] / b.loc[h, "count"]) * 1000
                    )[()]
                )
                for h in hs
            ],
            dtype=np.int64,
        )
        n = len(d)
        assert int(r["n_hours"]) == n
        bias = int(_rha(d.sum() / n)[()])
        assert int(r["bias_e6"]) == bias
        sd = math.sqrt(
            (float((d.astype(object) ** 2).sum()) - float(d.sum()) ** 2 / n) / (n - 1)
        )
        assert int(r["sd_e6"]) == int(_rha(sd)[()])
        lo = int(_rha(d.sum() / n - 1.96 * sd)[()])
        hi = int(_rha(d.sum() / n + 1.96 * sd)[()])
        assert (int(r["loa_lo_e6"]), int(r["loa_hi_e6"])) == (lo, hi)
        assert int(r["n_outside"]) == int(((d < lo) | (d > hi)).sum())
