"""Wave-12b operators: exact numpy replays + planted discriminators."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _hourly(sf_dir=SF_SMOKE_DIR):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("int64")
    h = us // 3_600_000_000
    lo, hi = h.min(), h.max()
    out = {}
    for t, g in ev.groupby("event_type"):
        series = np.zeros(hi - lo + 1, dtype=np.int64)
        np.add.at(series, (g["ts"].astype("int64") // 3_600_000_000) - lo, 1)
        out[t] = series
    return out


def _events_frame(values, event_types, ts=None, user_ids=None):
    n = len(values)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts if ts is not None else (
                pd.Timestamp("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="s")
            ),
            "user_id": np.asarray(
                user_ids if user_ids is not None else np.arange(n),
                dtype=np.int64,
            ),
            "event_type": event_types,
            "value": np.asarray(values, dtype=np.float64),
            "props": "{}",
        }
    )


def _acf_e6(v, lags=24):
    n = len(v)
    s = int(v.sum())
    d = n * v.astype(object) - s
    den = int(sum(x * x for x in d))
    out = {}
    for lag in range(1, lags + 1):
        num = int(sum(d[i] * d[i + lag] for i in range(n - lag)))
        out[lag] = int(_rha(num / den * 1e6)[()])
    return out


# ---------------------------------------------------------------------------
# PACF
# ---------------------------------------------------------------------------


def _q9(x):
    return float(_rha(x * 1e9)[()]) / 1e9


def _pacf_replay(acf_e6, L=10):
    r = {k: acf_e6[k] / 1e6 for k in acf_e6}
    v = 1.0
    phi = {}
    pacf = {}
    for k in range(1, L + 1):
        if v > 1e-9:
            num = r[k] - sum(phi[j] * r[k - j] for j in range(1, k))
            pk = _q9(num / v)
        else:
            pk = 0.0
        newphi = {}
        for j in range(1, k):
            newphi[j] = _q9(phi[j] - pk * phi[k - j])
        newphi[k] = pk
        v = _q9(v * (1 - pk * pk))
        phi = newphi
        pacf[k] = pk
    return {k: int(_rha(pv * 1e9)[()]) for k, pv in pacf.items()}


def test_pacf_matches_replay(spark):
    out = _collect(spark, "timeseries_pacf_durbin")
    for m, v in _hourly().items():
        acf = _acf_e6(v)
        want = _pacf_replay(acf)
        sub = out[out["event_type"] == m].set_index("lag")
        for lag in range(1, 11):
            assert int(sub.loc[lag, "pacf_e9"]) == want[lag], (m, lag)


def test_pacf_lag1_equals_acf_lag1(spark):
    """Durbin-Levinson identity: phi_11 = r_1 exactly (mod the e9
    quantization of an e6-quantized input)."""
    out = _collect(spark, "timeseries_pacf_durbin")
    for m, v in _hourly().items():
        r1_e9 = _acf_e6(v)[1] * 1000
        got = int(out[(out.event_type == m) & (out.lag == 1)]["pacf_e9"].iloc[0])
        assert got == r1_e9, m


# ---------------------------------------------------------------------------
# Hurst
# ---------------------------------------------------------------------------


def _hurst_replay(v):
    pts = []
    n = len(v)
    for m in (8, 16, 32, 64, 128):
        rss = []
        for b in range(n // m):
            blk = v[b * m:(b + 1) * m].astype(object)
            s1 = int(sum(blk))
            s2 = int(sum(x * x for x in blk))
            pref = np.cumsum(blk)
            cum = [m * int(pref[j]) - (j + 1) * s1 for j in range(m)]
            r_x = max(cum) - min(min(cum), 0)
            s2_x = m * s2 - s1 * s1
            if s2_x > 0:
                rss.append(int(_rha(r_x / math.sqrt(s2_x) * 1e6)[()]))
        if rss and sum(rss) > 0:
            lx = int(_rha(math.log(m) * 1e6)[()])
            ly = int(_rha(math.log(sum(rss) / len(rss) / 1e6) * 1e6)[()])
            pts.append((lx, ly))
    np_ = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    h = (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    return int(_rha(h * 1e9)[()]), np_


def test_hurst_matches_replay(spark):
    out = _collect(spark, "timeseries_hurst_rs").set_index("event_type")
    for m, v in _hourly().items():
        want, np_ = _hurst_replay(v)
        assert int(out.loc[m, "hurst_e9"]) == want, m
        assert int(out.loc[m, "n_scales"]) == np_, m


def test_hurst_discriminates_trend_vs_alternation(spark, tmp_path):
    """A strong trend (counts ramp with time) is persistent (high H);
    a strictly alternating series is antipersistent (low H)."""
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    eid = 0
    for h in range(512):
        for i in range(1 + h // 16):  # ramp
            rows.append((eid, t0 + pd.Timedelta(hours=h, seconds=i), 1,
                         "ramp", 1.0, "{}"))
            eid += 1
        for i in range(3 if h % 2 == 0 else 9):  # alternating
            rows.append((eid, t0 + pd.Timedelta(hours=h, seconds=60 + i), 2,
                         "flip", 1.0, "{}"))
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_hurst_rs", str(tmp_path)).set_index(
        "event_type"
    )
    assert int(out.loc["ramp", "hurst_e9"]) > 850_000_000
    assert bool(out.loc["ramp", "long_memory"])
    assert int(out.loc["flip", "hurst_e9"]) < 350_000_000
    assert not bool(out.loc["flip", "long_memory"])


# ---------------------------------------------------------------------------
# MASE
# ---------------------------------------------------------------------------


def test_mase_matches_replay(spark):
    out = _collect(spark, "timeseries_mase_backtest").set_index("event_type")
    for m, v in _hourly().items():
        n = len(v)
        cut = int(3 * n // 4)
        tr_ae = te_ae = tr_n = te_n = 0
        sm = 0
        for t in range(24, n):
            e = abs(int(v[t]) - int(v[t - 24]))
            if t < cut:
                tr_ae += e
                tr_n += 1
            else:
                te_ae += e
                te_n += 1
                tot = int(v[t]) + int(v[t - 24])
                if tot > 0:
                    sm += int(_rha(2.0 * e / tot * 1e9)[()])
        mase = int(_rha((te_ae / te_n) / (tr_ae / tr_n) * 1e6)[()]) \
            if tr_ae > 0 else 0
        assert int(out.loc[m, "train_naive_ae"]) == tr_ae, m
        assert int(out.loc[m, "test_ae"]) == te_ae, m
        assert int(out.loc[m, "mase_e6"]) == mase, m
        assert int(out.loc[m, "smape_e6"]) == int(_rha(sm / te_n / 1000)[()]), m


def test_mase_perfect_period_scores_zero(spark, tmp_path):
    """A perfectly 24h-periodic series: the seasonal naive is exact on
    the test quarter -> MASE 0 and sMAPE 0."""
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    eid = 0
    for h in range(480):
        for i in range(3 + (h % 24)):
            rows.append((eid, t0 + pd.Timedelta(hours=h, seconds=i), 1,
                         "p", 1.0, "{}"))
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "timeseries_mase_backtest", str(tmp_path))
    assert int(out["test_ae"].iloc[0]) == 0
    assert int(out["mase_e6"].iloc[0]) == 0
    assert int(out["smape_e6"].iloc[0]) == 0


# ---------------------------------------------------------------------------
# Markov removal attribution
# ---------------------------------------------------------------------------


def test_markov_removal_funnel_is_fully_attributed(spark, tmp_path):
    """Strict funnel view -> click -> purchase for every converting
    user: removing click (or view) kills ALL conversion (removal
    effect 1e9); an off-funnel channel ('error' dead ends) has effect
    ~0 under the lost-mass semantics."""
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    eid = 0
    for u in range(40):
        for i, et in enumerate(["view", "click", "purchase"]):
            rows.append((eid, t0 + pd.Timedelta(minutes=u * 10 + i), u,
                         et, 1.0, "{}"))
            eid += 1
    for u in range(40, 50):  # non-converters: view -> error (dead end)
        for i, et in enumerate(["view", "error"]):
            rows.append((eid, t0 + pd.Timedelta(minutes=u * 10 + i), u,
                         et, 1.0, "{}"))
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type",
                                "value", "props"]).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "attribution_markov_removal", str(tmp_path)).set_index(
        "channel"
    )
    assert int(out.loc["view", "removal_effect_e9"]) == 10**9
    assert int(out.loc["click", "removal_effect_e9"]) == 10**9
    # removing the dead-end error channel does not change conversion
    assert int(out.loc["error", "removal_effect_e9"]) == 0
    # conv_full = 40 converting of 50 starts = 0.8
    assert int(out.loc["view", "conv_full_e9"]) == 800_000_000


def test_markov_removal_smoke_consistency(spark):
    out = _collect(spark, "attribution_markov_removal")
    assert (out["removal_effect_e9"] >= 0).all()
    assert (out["removal_effect_e9"] <= 10**9).all()
    assert out["conv_full_e9"].nunique() == 1
    assert (out["conv_removed_e9"] <= out["conv_full_e9"]).all()


# ---------------------------------------------------------------------------
# Assortativity
# ---------------------------------------------------------------------------


def test_assortativity_matches_numpy_edges(spark):
    emb = pd.read_parquet(f"{SF_SMOKE_DIR}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    m0 = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m0 /= np.linalg.norm(m0, axis=1, keepdims=True)
    sims = np.round(m0 @ m0.T, 6)
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= 0.3
    a, b = ids[iu[0][mask]], ids[iu[1][mask]]
    deg = {}
    for x in np.concatenate([a, b]):
        deg[x] = deg.get(x, 0) + 1
    dx = np.array([deg[x] for x in a] + [deg[x] for x in b], dtype=np.int64)
    dy = np.array([deg[x] for x in b] + [deg[x] for x in a], dtype=np.int64)
    mm = len(dx)
    sx, sxx = int(dx.sum()), int((dx.astype(object) ** 2).sum())
    sxy = int((dx.astype(object) * dy).sum())
    want = int(_rha((mm * sxy - sx * sx) / (mm * sxx - sx * sx) * 1e9)[()])
    out = _collect(spark, "graph_assortativity")
    assert int(out["n_oriented_edges"].iloc[0]) == mm
    assert int(out["assortativity_e9"].iloc[0]) == want


# ---------------------------------------------------------------------------
# Flesch
# ---------------------------------------------------------------------------


def test_flesch_matches_replay(spark):
    import re

    out = _collect(spark, "text_flesch_readability").set_index("doc_id")
    docs = pd.read_parquet(f"{SF_SMOKE_DIR}/documents.parquet")
    for _, row in docs.head(60).iterrows():
        text = row["text"]
        words = [w for w in text.split(" ") if w]
        wn = len(words)
        sents = max(1, text.count("."))
        syl = sum(
            max(1, len(re.findall(r"[aeiou]+", w.lower()))) for w in words
        )
        score = int(
            _rha((206.835 - 1.015 * (wn / sents) - 84.6 * (syl / wn)) * 1000)[()]
        ) if wn else 0
        assert int(out.loc[row["doc_id"], "n_words"]) == wn
        assert int(out.loc[row["doc_id"], "n_syllables"]) == syl
        assert int(out.loc[row["doc_id"], "flesch_e3"]) == score
