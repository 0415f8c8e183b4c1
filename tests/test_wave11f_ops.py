"""Behavior tests for wave 11f: multiple-testing replays against the
shared p-value pipeline, MCC/periodogram/Kendall-W/Qini numpy replays,
and a planted-periodicity fixture.
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


# ---------------------------------------------------------------------------
# Fisher / BY consume the SAME p-values as BH
# ---------------------------------------------------------------------------


def test_fisher_combined_consistent_with_bh_pvalues(spark):
    bh = _collect(spark, "stats_fdr_bh").set_index("event_type").sort_index()
    fi = (_collect(spark, "stats_fisher_combined")
          .set_index("event_type").sort_index())
    assert fi["p_e9"].equals(bh["p_e9"])  # shared pipeline, no drift
    x = 0
    for p in bh["p_e9"]:
        lnp = int(_rha(math.log(max(p / 1e9, 1e-9)) * 1e9)[()])
        x += -2 * lnp
    assert (fi["fisher_x_e6"] == int(_rha(x / 1000)[()])).all()
    assert (fi["df"] == 2 * len(bh)).all()


def test_by_is_stricter_than_bh_and_matches_replay(spark):
    bh = _collect(spark, "stats_fdr_bh").set_index("event_type").sort_index()
    by = (_collect(spark, "stats_benjamini_yekutieli")
          .set_index("event_type").sort_index())
    assert by["p_e9"].equals(bh["p_e9"])
    m = len(by)
    c_e6 = sum(int(_rha(1e6 / i)[()]) for i in range(1, m + 1))
    assert (by["c_e6"] == c_e6).all()
    # replay the step-up
    ranked = sorted(by["p_e9"].items(), key=lambda kv: (kv[1], kv[0]))
    kmax = 0
    for rnk, (t, p) in enumerate(ranked, start=1):
        if p * m * c_e6 <= rnk * 50_000_000 * 1_000_000:
            kmax = rnk
    for rnk, (t, p) in enumerate(ranked, start=1):
        assert bool(by.loc[t, "rejected"]) == (rnk <= kmax)
    # BY can never reject something BH keeps (same p, stricter bound)
    assert not (by["rejected"] & ~bh["rejected"]).any()


# ---------------------------------------------------------------------------
# MCC
# ---------------------------------------------------------------------------


def test_mcc_matches_replay(spark):
    out = _collect(spark, "stats_mcc_matthews").iloc[0]
    ev = _events()
    v = np.sort(ev["v_e3"].to_numpy())
    n = len(v)
    med2 = int(v[(n + 1) // 2 - 1]) + int(v[(n + 2) // 2 - 1])
    pred = 2 * ev["v_e3"].to_numpy() > med2
    y = (ev["event_type"] == "purchase").to_numpy()
    tp = int((pred & y).sum())
    fp = int((pred & ~y).sum())
    tn = int((~pred & ~y).sum())
    fn = int((~pred & y).sum())
    assert (int(out["tp"]), int(out["fp"]), int(out["tn"]), int(out["fn"])) == (
        tp, fp, tn, fn,
    )
    mcc = (tp * tn - fp * fn) / math.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert int(out["mcc_e9"]) == int(_rha(mcc * 1e9)[()])
    assert -(10**9) <= int(out["mcc_e9"]) <= 10**9


# ---------------------------------------------------------------------------
# Periodogram
# ---------------------------------------------------------------------------


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


def test_periodogram_matches_replay(spark):
    out = _collect(spark, "timeseries_spectral_periodogram")
    for t, v in _hourly().items():
        n = len(v)
        s1, s2 = int(v.sum()), int((v.astype(object) ** 2).sum())
        ss = n * s2 - s1 * s1
        sub = out[out["event_type"] == t].set_index("period_h")
        best = None
        for P in (6, 8, 12, 24, 48, 168):
            tmod = np.arange(n) % P
            c = _rha(np.cos(2 * math.pi * tmod / P) * 1e6)
            s = _rha(np.sin(2 * math.pi * tmod / P) * 1e6)
            A = int((v * c).sum())
            B = int((v * s).sum())
            # variance share 2(A^2+B^2)/(n*SS); ss already equals n*SS
            # (the r11 ADVICE factor-of-n bug: an extra *n here once
            # replayed the same wrong formula and hid it)
            share = (float(A) * A + float(B) * B) / 1e12 * 2.0 / ss
            want = int(_rha(share * 1e9)[()])
            assert int(sub.loc[P, "power_share_e9"]) == want
            key = (-want, P)
            if best is None or key < best:
                best = key
        assert bool(sub.loc[-best[1] if False else best[1], "is_dominant"])


def test_periodogram_finds_planted_24h_cycle(spark, tmp_path):
    """A strong sinusoidal daily cycle must dominate at period 24."""
    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-01-01")
    for h in range(240):
        cnt = int(10 + 8 * math.sin(2 * math.pi * h / 24))
        for i in range(cnt):
            rows.append((eid, t0 + pd.Timedelta(hours=h, seconds=i),
                         eid % 7, "view", 1.0, "{}"))
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_spectral_periodogram", str(tmp_path))
    dom = out[out["is_dominant"]].iloc[0]
    assert int(dom["period_h"]) == 24
    assert int(dom["power_share_e9"]) > 700_000_000  # >70% of variance
    # a share is a fraction of variance: the e9 value must sit in [0, 1]
    # (+1e6 quantization headroom) — this is what made the old *n bug
    # visible at a glance (it emitted ~239e9)
    assert int(dom["power_share_e9"]) <= 1_001_000_000


# ---------------------------------------------------------------------------
# Kendall's W
# ---------------------------------------------------------------------------


def test_kendall_w_matches_replay(spark):
    out = _collect(spark, "stats_kendall_w")
    docs = duckdb.sql(
        f"SELECT text, source FROM '{SF_SMOKE_DIR}/documents.parquet'"
    ).df()
    tf = {}
    tot = {}
    for _, r in docs.iterrows():
        for w in r["text"].split(" "):
            tf[(r["source"], w)] = tf.get((r["source"], w), 0) + 1
            tot[w] = tot.get(w, 0) + 1
    top = [t for t, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:12]]
    sources = sorted({s for s, _ in tf})
    k, n = len(sources), len(top)
    r2 = {}
    t_corr = 0
    for s in sources:
        counts = {t: tf.get((s, t), 0) for t in top}
        for t in top:
            better = sum(1 for o in top if counts[o] > counts[t])
            ties = sum(1 for o in top if counts[o] == counts[t])
            r2[(s, t)] = 2 * better + ties + 1
        from collections import Counter

        for c in Counter(counts.values()).values():
            t_corr += c**3 - c
    sum_r2sq = sum(
        sum(r2[(s, t)] for s in sources) ** 2 for t in top
    )
    denom = k * k * n * (n * n - 1) - k * t_corr
    W = (3 * sum_r2sq - 3 * k * k * n * (n + 1) ** 2) / denom
    assert len(out) == n
    assert (out["kendall_w_e9"] == int(_rha(W * 1e9)[()])).all()
    for _, r in out.iterrows():
        assert int(r["rank_sum_x2"]) == sum(r2[(s, r["term"])] for s in sources)
    assert 0 <= int(out.iloc[0]["kendall_w_e9"]) <= 10**9


# ---------------------------------------------------------------------------
# Qini
# ---------------------------------------------------------------------------


def _nib(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16)


def test_qini_matches_replay(spark):
    out = _collect(spark, "events_uplift_qini").set_index("decile")
    ev = _events()
    mid = math.floor((ev["us"].min() + ev["us"].max()) / 2.0)
    users = []
    for u, g in ev.groupby("user_id"):
        treat = 1 if _nib(f"ab|{u}") < 8 else 0
        score = int((g["us"] <= mid).sum())
        conv = int(
            ((g["us"] > mid) & (g["event_type"] == "purchase")).max()
        )
        users.append((u, treat, score, conv))
    users.sort(key=lambda r: (-r[2], r[0]))
    n = len(users)
    cum = np.cumsum([[r[1], 1 - r[1], r[1] * r[3], (1 - r[1]) * r[3]]
                     for r in users], axis=0)
    for d in range(1, 11):
        rn = max(1, math.floor(d * n / 10))
        nt, nc, rt, rc = (int(x) for x in cum[rn - 1])
        row = out.loc[d]
        assert (int(row["n_treated"]), int(row["n_control"])) == (nt, nc)
        assert (int(row["resp_treated"]), int(row["resp_control"])) == (rt, rc)
        if nc > 0:
            assert int(row["qini_e6"]) == int(_rha((rt - rc * nt / nc) * 1e6)[()])
