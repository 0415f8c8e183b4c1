"""Behavior tests for round-9 wave 8h: cross-correlation lead-lag,
PSI drift, Heaps' law — numpy/pure-Python parity plus the structural
invariants (corr bounds, PSI non-negativity under smoothing, Heaps
saturation on a closed vocabulary)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _dense_hourly(sf_dir: str):
    df = duckdb.sql(f"""
        SELECT event_type, CAST(FLOOR(epoch(ts)/3600) AS BIGINT) AS h,
               COUNT(*) AS c
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
    """).df()
    h0, h1 = int(df["h"].min()), int(df["h"].max())
    n = h1 - h0 + 1
    out = {}
    for et, g in df.groupby("event_type"):
        x = np.zeros(n, dtype=np.int64)
        x[g["h"].to_numpy(np.int64) - h0] = g["c"].to_numpy(np.int64)
        out[et] = x
    return out


def test_cross_correlation_matches_numpy(spark):
    series = _dense_hourly(SF_SMOKE_DIR)
    want = {}
    for ex, vx in series.items():
        for ey, vy in series.items():
            if ex == ey:
                continue
            best = None
            for lag in range(-12, 13):
                # corr(x[t], y[t+lag]) over the overlap
                if lag >= 0:
                    a, b = vx[: len(vx) - lag], vy[lag:]
                else:
                    a, b = vx[-lag:], vy[: len(vy) + lag]
                n = len(a)
                sx, sy = int(a.sum()), int(b.sum())
                sxx = int((a * a).sum())
                syy = int((b * b).sum())
                sxy = int((a * b).sum())
                va, vb = n * sxx - sx * sx, n * syy - sy * sy
                if va <= 0 or vb <= 0:
                    continue
                c = float(n * sxy - sx * sy) / (
                    np.sqrt(float(va)) * np.sqrt(float(vb))
                )
                ce9 = _rha(c * 1e9)
                key = (-abs(ce9), abs(lag), lag)
                if best is None or key < best[0]:
                    best = (key, lag, n, ce9)
            want[(ex, ey)] = (best[1], best[2], best[3])
    pdf = _collect(spark, "timeseries_cross_correlation")
    got = {
        (r.ex, r.ey): (int(r.best_lag), int(r.n_overlap), int(r.corr_e9))
        for r in pdf.itertuples()
    }
    assert got == want
    assert (pdf["corr_e9"].abs() <= 1_000_000_000).all()
    assert (pdf["best_lag"].abs() <= 12).all()


def test_psi_drift_matches_python(spark):
    ev = duckdb.sql(f"""
        SELECT event_type, CAST(FLOOR(epoch(ts)/3600) AS BIGINT) AS h,
               CAST(ROUND(value*1000) AS BIGINT) AS v, event_id AS rid
        FROM '{SF_SMOKE_DIR}/events.parquet'
    """).df()
    mid = math.floor((int(ev["h"].min()) + int(ev["h"].max())) / 2.0)
    pdf = _collect(spark, "events_psi_drift").set_index("event_type")
    for et, g in ev.groupby("event_type"):
        ref = g[g["h"] < mid].sort_values(["v", "rid"])
        cur = g[g["h"] >= mid]
        n = len(ref)
        edges = sorted(
            {int(ref.iloc[math.ceil(n * k / 10.0) - 1]["v"]) for k in range(1, 10)}
        )

        def bin_of(v):
            return sum(1 for e in edges if v > e)

        from collections import Counter

        cr = Counter(bin_of(int(v)) for v in ref["v"])
        cc = Counter(bin_of(int(v)) for v in cur["v"])
        bins = sorted(set(cr) | set(cc))
        c_ref = {b: cr.get(b, 0) + 1 for b in bins}
        c_cur = {b: cc.get(b, 0) + 1 for b in bins}
        tr, tc = sum(c_ref.values()), sum(c_cur.values())
        psi = sum(
            _rha(
                (c_cur[b] / tc - c_ref[b] / tr)
                * math.log((c_cur[b] / tc) / (c_ref[b] / tr))
                * 1e9
            )
            for b in bins
        )
        row = pdf.loc[et]
        assert int(row["n_bins"]) == len(bins)
        assert int(row["psi_e9"]) == psi
        assert bool(row["action_flag"]) == (psi >= 250_000_000)
        # every PSI term (p-q)*ln(p/q) is >= 0, so the sum is non-
        # negative up to one rounding quantum per bin; no upper sanity
        # bound — at ~200-row smoke halves decile sampling noise alone
        # legitimately reaches the 0.25 action threshold
        assert psi >= -len(bins)


def test_heaps_law_matches_python(spark):
    rows = duckdb.sql(f"""
        SELECT doc_id, string_split(text, ' ')
        FROM '{SF_SMOKE_DIR}/documents.parquet' ORDER BY doc_id
    """).fetchall()
    firsts = {}
    gpos = 0
    for _, toks in rows:
        for t in toks:
            if not t:
                continue
            gpos += 1
            firsts.setdefault(t, gpos)
    n_tok = gpos
    pts = []
    for k in range(1, 21):
        n_at = math.floor(k * n_tok / 20.0)
        v_at = sum(1 for f in firsts.values() if f <= n_at)
        pts.append((_rha(math.log(n_at) * 1e6), _rha(math.log(v_at) * 1e6)))
    m = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    k_e6 = _rha(
        math.exp((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m / 1e6)
        * 1e6
    )
    pdf = _collect(spark, "text_heaps_law")
    assert int(pdf["n_checkpoints"][0]) == 20
    assert abs(int(pdf["beta_e9"][0]) - _rha(beta * 1e9)) <= 1
    assert int(pdf["k_e6"][0]) == k_e6
    # closed 31-word vocabulary saturates: beta must be near zero
    assert 0 <= int(pdf["beta_e9"][0]) < 100_000_000
