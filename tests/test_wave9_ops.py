"""Behavior tests for the round-9 wave: record linkage, differential
privacy, changepoint, conformal intervals, winsorized means, geohash.

Parity against the DuckDB oracles is covered by test_oracle_parity's
registry parameterization; these tests pin the SEMANTICS — each operator
against an independent plain-Python/numpy reimplementation (the
differential-fuzz discipline), plus the structural invariants the SQL
can't state about itself (blocking recall, prefix property, conformal
coverage direction).
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


# ---------------------------------------------------------------------------
# Fellegi-Sunter linkage
# ---------------------------------------------------------------------------


def test_linkage_blocking_covers_every_true_pair(spark):
    """The +/-1 band join must lose ZERO true pairs (jitter 1000 cents
    << 200000-cent band): summed n_true across decision bands equals the
    customer count exactly."""
    pdf = _collect(spark, "linkage_fellegi_sunter")
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE_DIR}/customer.parquet'"
    ).fetchone()[0]
    assert int(pdf["n_true"].sum()) == n_cust


def test_linkage_match_band_is_high_precision_high_recall(spark):
    pdf = _collect(spark, "linkage_fellegi_sunter").set_index("decision")
    assert "match" in pdf.index
    m = pdf.loc["match"]
    n_cust = int(pdf["n_true"].sum())
    # the dirtied copy keeps >= 2 of 3 fields agreeing for every record,
    # so the match band should capture nearly all true pairs...
    assert m["n_true"] / n_cust > 0.95
    # ...and true pairs should dominate it (agreement on all three
    # fields is rare for random same-block pairs)
    assert m["n_true"] / m["n_pairs"] > 0.5
    # weights are shown on every row and agreement weights are positive
    assert (pdf["wa_seg"] > 0).all()
    assert (pdf["wa_bal"] > 0).all()
    assert (pdf["wa_name"] > 0).all()


def test_linkage_non_match_band_is_almost_all_false(spark):
    pdf = _collect(spark, "linkage_fellegi_sunter").set_index("decision")
    if "non_match" in pdf.index:
        nm = pdf.loc["non_match"]
        assert nm["n_true"] / nm["n_pairs"] < 0.01


# ---------------------------------------------------------------------------
# Differential privacy: Laplace mechanism
# ---------------------------------------------------------------------------


def _py_laplace_noise_e6(event_type: str, eps_e3: int) -> int:
    """Plain-Python replay of the engine's seeded inverse-CDF draw."""
    key = f"dp|{event_type}|{eps_e3}"
    u32 = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    sign = 1 if u32 >= 2**31 else -1
    m = 2**31 - abs(u32 - 2**31) + 1
    arg = m / (2**31 + 1)
    noise = sign * -math.log(arg) * (1000.0 / eps_e3) * 1e6
    return int(round(noise))


def test_dp_counts_match_python_mechanism(spark):
    pdf = _collect(spark, "privacy_dp_counts")
    assert len(pdf) == 15  # 5 event types x 3 epsilons
    for _, r in pdf.iterrows():
        assert int(r["noise_e6"]) == _py_laplace_noise_e6(
            r["event_type"], int(r["eps_e3"])
        )
        assert int(r["noisy_e6"]) == int(r["n"]) * 10**6 + int(r["noise_e6"])


def test_dp_counts_true_counts_and_calibration_flag(spark):
    pdf = _collect(spark, "privacy_dp_counts")
    truth = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(*) FROM '{SF_SMOKE_DIR}/events.parquet' "
            "GROUP BY event_type"
        ).fetchall()
    )
    for _, r in pdf.iterrows():
        assert int(r["n"]) == truth[r["event_type"]]
        bound = round(math.log(10.0) * (1000.0 / int(r["eps_e3"])) * 1e6)
        assert int(r["within_90pct_bound"]) == (
            1 if abs(int(r["noise_e6"])) <= bound else 0
        )


# ---------------------------------------------------------------------------
# Changepoint: single-split binary segmentation
# ---------------------------------------------------------------------------


def test_changepoint_matches_numpy_bruteforce(spark):
    pdf = _collect(spark, "timeseries_changepoint_binseg")
    daily = duckdb.sql(
        "SELECT event_type, CAST(FLOOR(epoch(ts)/3600/24) AS BIGINT) d, "
        f"COUNT(*) y FROM '{SF_SMOKE_DIR}/events.parquet' "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    for _, r in pdf.iterrows():
        g = daily[daily["event_type"] == r["event_type"]]
        y = g["y"].to_numpy(dtype=np.int64)
        d = g["d"].to_numpy(dtype=np.int64)
        n = len(y)
        s = int(y.sum())
        best = None
        for t in range(3, n - 2):  # t >= 3 and n - t >= 3
            ps = int(y[:t].sum())
            gain = round(ps * ps / t + (s - ps) ** 2 / (n - t) - s * s / n)
            if best is None or gain > best[0]:
                best = (gain, d[t - 1])
        assert int(r["gain"]) == best[0]
        assert int(r["split_day"]) == best[1]
        assert int(r["n_days"]) == n


# ---------------------------------------------------------------------------
# Conformal interval
# ---------------------------------------------------------------------------


def test_conformal_reports_plausible_coverage(spark):
    pdf = _collect(spark, "timeseries_conformal_interval")
    assert len(pdf) == 5
    # distribution-free guarantee is >= 0.9 marginal; empirical test-half
    # coverage fluctuates but should never collapse
    assert (pdf["coverage_e6"] >= 700000).all()
    assert (pdf["q"] >= 0).all()
    assert (pdf["n_cal"] > 0).all() and (pdf["n_test"] > 0).all()
    # q is the ceil(0.9*(n+1))-th order statistic: at least 90% of
    # calibration residuals sit at or below it by construction — implied
    # by rank arithmetic; spot-check the rank formula
    for _, r in pdf.iterrows():
        k = math.floor((9 * (int(r["n_cal"]) + 1) + 9) / 10.0)
        assert k <= int(r["n_cal"])


def test_conformal_predictor_is_past_not_future(spark, tmp_path):
    """Pin the seasonal-naive DIRECTION (round-10 fix: the join read
    y(h+24), the FUTURE count) with a hand-computed synthetic series.

    One metric, 72 dense hours, exactly 24-periodic counts except a
    known +3 bump at hour 60. With yhat(h) = y(h-24):
      residuals exist for h in [24, 71] (first day trimmed), all zero
      except r(60) = 3; calibration half h <= 47 is all-zero so q = 0;
      test half h in [48, 71] covers 23 of 24 -> coverage_e6 = 958333.
    The pre-fix inverted join instead yields r(36) = 3 in calibration
    and COALESCE-0 forecasts for the whole last day (r = y(h) itself,
    10..36), collapsing coverage — so these exact pins discriminate.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for h in range(72):
        cnt = 10 + (h % 24) + (3 if h == 60 else 0)
        for _ in range(cnt):
            rows.append((eid, (h * 3600 + 30) * 1_000_000, 1, "m", 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    tbl = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        1, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("us"))
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = _collect(spark, "timeseries_conformal_interval",
                   sf_dir=str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["n_cal"]) == 24
    assert int(r["q"]) == 0
    assert int(r["n_test"]) == 24
    assert int(r["n_covered"]) == 23
    assert int(r["coverage_e6"]) == 958333

    # the DuckDB oracle text carries the same fixed direction
    from emr_with_custom_metrics_spark.registry import all_specs

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    orc = con.execute(
        all_specs()["timeseries_conformal_interval"].oracle
    ).df()
    assert len(orc) == 1
    assert int(orc.iloc[0]["n_covered"]) == 23
    assert int(orc.iloc[0]["coverage_e6"]) == 958333


# ---------------------------------------------------------------------------
# Winsorized / trimmed means
# ---------------------------------------------------------------------------


def test_winsorized_matches_numpy(spark):
    pdf = _collect(spark, "stats_winsorized_mean")
    ev = duckdb.sql(
        "SELECT event_type, CAST(ROUND(value*1000) AS BIGINT) v "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()
    for _, r in pdf.iterrows():
        v = np.sort(ev[ev["event_type"] == r["event_type"]]["v"].to_numpy())
        n = len(v)
        lo = v[math.ceil(n * 5 / 100) - 1]
        hi = v[math.ceil(n * 95 / 100) - 1]
        assert int(r["n"]) == n
        assert int(r["lo_e3"]) == lo and int(r["hi_e3"]) == hi
        assert int(r["raw_mean_e3"]) == round(v.sum() / n)
        assert int(r["winsor_mean_e3"]) == round(np.clip(v, lo, hi).sum() / n)
        kept = v[(v >= lo) & (v <= hi)]
        assert int(r["trim_mean_e3"]) == round(kept.sum() / len(kept))
        # robustness direction: winsorized mean sits within the clamp range
        assert lo <= int(r["winsor_mean_e3"]) <= hi


# ---------------------------------------------------------------------------
# Geohash cells
# ---------------------------------------------------------------------------


def _py_geohash4(lat10: int, lon10: int) -> str:
    latb = lat10 * 1024 // 1200
    lonb = lon10 * 1024 // 2400
    z = 0
    for i in range(10):
        z += ((lonb >> i) & 1) << (2 * i + 1)
        z += ((latb >> i) & 1) << (2 * i)
    a = "0123456789bcdefghjkmnpqrstuvwxyz"
    return "".join(a[(z >> (5 * (3 - j))) & 31] for j in range(4))


def _h16_py(seed: str, key: int) -> int:
    return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:4], 16)


def test_geohash_totals_and_python_parity(spark):
    pdf = _collect(spark, "geo_geohash_cells")
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE_DIR}/customer.parquet'"
    ).fetchone()[0]
    n_supp = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMOKE_DIR}/supplier.parquet'"
    ).fetchone()[0]
    assert int(pdf["n_cust"].sum()) == n_cust
    assert int(pdf["n_supp"].sum()) == n_supp
    # every first_cell extends its own 2-char prefix (prefix property)
    assert (
        pdf.apply(lambda r: r["first_cell"].startswith(r["gh2"]), axis=1)
    ).all()
    # replay a handful of customers through a pure-Python geohash and
    # check their cells appear under the right prefix
    keys = duckdb.sql(
        f"SELECT c_custkey FROM '{SF_SMOKE_DIR}/customer.parquet' LIMIT 20"
    ).fetchall()
    prefixes = set(pdf["gh2"])
    for (k,) in keys:
        gh = _py_geohash4(_h16_py("lat", k) % 1200, _h16_py("lon", k) % 2400)
        assert gh[:2] in prefixes


def test_geohash_interleave_is_bijective_on_frame():
    seen = set()
    for lat10 in range(0, 1200, 97):
        for lon10 in range(0, 2400, 101):
            seen.add(_py_geohash4(lat10, lon10))
    # coarse sweep: distinct inputs in distinct 20-bit cells must not
    # collide more than the quantization allows (1024/1200 merges some
    # adjacent tenth-degrees, but the 97/101 stride keeps inputs apart)
    assert len(seen) >= 0.95 * (len(range(0, 1200, 97)) * len(range(0, 2400, 101)))


# ---------------------------------------------------------------------------
# Isotonic regression (exact minimax)
# ---------------------------------------------------------------------------


def _pava(y):
    """Classic pool-adjacent-violators on quantized integers — the
    SEQUENTIAL algorithm the SQL minimax formula must agree with."""
    blocks = [[v, 1] for v in map(float, y)]  # [sum-mean, weight]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1] + 1e-12:
            s2, w2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += w2
    fit = []
    for s, w in out:
        fit.extend([s / w] * int(w))
    return fit


def test_isotonic_matches_pava_and_is_monotone(spark):
    pdf = _collect(spark, "stats_isotonic_trend")
    for et, g in pdf.groupby("event_type"):
        g = g.sort_values("d")
        iso = g["iso_e6"].to_numpy()
        # monotone nondecreasing by construction
        assert (np.diff(iso) >= 0).all()
        # PAVA on the same quantized inputs agrees within the 1e-6
        # quantization of the interval averages
        fit = _pava(g["y_e6"].to_numpy())
        assert np.abs(iso - np.array(fit)).max() <= 1.0 + 1e-9, et
        # isotonic fit preserves the total (weighted mean invariance),
        # up to one quantum per day
        assert abs(iso.sum() - g["y_e6"].sum()) <= len(g) + 1


# ---------------------------------------------------------------------------
# PLSA topics
# ---------------------------------------------------------------------------


def _py_plsa(sf_dir):
    """Plain-Python replay of the engine's quantized 2-round EM."""
    import collections

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    cnt = collections.Counter()
    for _, text in rows:
        cnt.update(text.split(" "))
    voc = sorted(cnt, key=lambda w: (-cnt[w], w))[:30]
    vset = set(voc)
    wd = collections.Counter()
    for d, text in rows:
        for w in text.split(" "):
            if w in vset:
                wd[(d, w)] += 1
    E9 = 10**9
    raw = {
        (w, z): 1000 + _h16_py("plsa", f"{w}|{z}") % 1000
        for w in voc
        for z in range(3)
    }
    pwz = {}
    for z in range(3):
        tot = sum(raw[(w, z)] for w in voc)
        for w in voc:
            pwz[(w, z)] = round(raw[(w, z)] / tot * E9)
    docs = sorted({d for d, _ in wd})
    pzd = {(d, z): round(E9 / 3) for d in docs for z in range(3)}
    for _ in range(2):
        nwz = collections.Counter()
        nzd = collections.Counter()
        for (d, w), c in wd.items():
            num = [pwz[(w, z)] * pzd[(d, z)] for z in range(3)]
            den = sum(num)
            for z in range(3):
                rc = round(c * num[z] / den * E9)
                nwz[(w, z)] += rc
                nzd[(d, z)] += rc
        for z in range(3):
            tot = sum(nwz[(w, z)] for w in voc)
            for w in voc:
                pwz[(w, z)] = round(nwz[(w, z)] / tot * E9)
        for d in docs:
            tot = sum(nzd[(d, z)] for z in range(3))
            for z in range(3):
                pzd[(d, z)] = round(nzd[(d, z)] / tot * E9)
    return pwz, pzd


def test_plsa_matches_python_em_replay(spark):
    pdf = _collect(spark, "text_plsa_topics")
    assert len(pdf) == 15  # 3 topics x top-5 words
    pwz, pzd = _py_plsa(SF_SMOKE_DIR)
    for z in range(3):
        top = sorted(
            ((p, w) for (w, zz), p in pwz.items() if zz == z),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        got = pdf[pdf["z"] == z].sort_values("rnk")
        for (p, w), (_, r) in zip(top, got.iterrows()):
            assert r["w"] == w and abs(int(r["p_e9"]) - p) <= 2, (z, w)
    # topic shares sum to ~1 and every p_e9 is a valid probability cell
    shares = pdf.groupby("z")["share_e6"].first()
    assert abs(int(shares.sum()) - 1_000_000) <= 3
    assert (pdf["p_e9"] > 0).all() and (pdf["p_e9"] < 10**9).all()


def test_plsa_em_moves_off_init(spark):
    """Two EM rounds must actually concentrate topics: the round-2
    P(w|z) top cell should exceed the near-uniform init ceiling."""
    pdf = _collect(spark, "text_plsa_topics")
    # init cells are ~1/30 +- 33% jitter => < 0.045; EM concentrates
    assert int(pdf["p_e9"].max()) > 45_000_000


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR
# ---------------------------------------------------------------------------


def test_fdr_bh_pvalues_and_stepup_match_python(spark):
    pdf = _collect(spark, "stats_fdr_bh").sort_values("rnk")
    assert len(pdf) == 5 and int(pdf["m"].iloc[0]) == 5
    try:
        from scipy.stats import norm
        tail = lambda z: 2 * (1 - norm.cdf(z))
    except ImportError:  # A&S self-check only
        tail = None
    ps = pdf["p_e9"].to_numpy()
    # p ascending by construction of rnk
    assert (np.diff(ps) >= 0).all()
    if tail is not None:
        for _, r in pdf.iterrows():
            z = int(r["abs_z_e6"]) / 1e6
            # Zelen-Severo polynomial |err| < 7.5e-8 => 1e-4 slack at e9
            assert abs(int(r["p_e9"]) - round(tail(z) * 1e9)) < 200_000
    # replay the exact integer step-up
    kmax = 0
    for _, r in pdf.iterrows():
        if int(r["p_e9"]) * 5 <= int(r["rnk"]) * 50_000_000:
            kmax = max(kmax, int(r["rnk"]))
    for _, r in pdf.iterrows():
        assert bool(r["rejected"]) == (int(r["rnk"]) <= kmax)


# ---------------------------------------------------------------------------
# Partition skew report
# ---------------------------------------------------------------------------


def test_partition_skew_report_math(spark):
    pdf = _collect(spark, "dq_partition_skew_report")
    counts = duckdb.sql(
        "SELECT event_type, CAST(FLOOR(epoch(ts)/86400) AS BIGINT) d, "
        f"COUNT(*) c FROM '{SF_SMOKE_DIR}/events.parquet' GROUP BY 1,2"
    ).df()
    total = int(counts["c"].sum())
    n_parts = len(counts)
    mx = int(counts["c"].max())
    assert len(pdf) == n_parts
    assert int(pdf["cnt"].sum()) == total
    # shares sum to ~1e6 (each share rounds independently)
    assert abs(int(pdf["share_e6"].sum()) - 1_000_000) <= n_parts
    skew = round(mx * n_parts / total * 1000)
    assert (pdf["skew_factor_e3"] == skew).all()
    assert (pdf["suggested_salt"] == math.ceil(mx * n_parts / total)).all()
    hot = pdf[pdf["is_hot"]]
    assert (hot["cnt"] * n_parts > 2 * total).all()
