"""Behavior tests for wave 11d (corpus statistics + allocation):
python-set shingle replays, the exact-apportionment invariant
(allocations sum to the budget EXACTLY), and numpy replays of
dispersion/reliability/calibration scalars.
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


def _docs(sf_dir=SF_SMOKE_DIR):
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{sf_dir}/documents.parquet'"
    ).df()


def _shingle_sets(docs):
    out = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        out[int(r["doc_id"])] = {
            " ".join(w[i : i + 8]) for i in range(len(w) - 7)
        } if len(w) >= 8 else set()
    return out


# ---------------------------------------------------------------------------
# capture-recapture
# ---------------------------------------------------------------------------


def test_capture_recapture_matches_set_replay(spark):
    out = _collect(spark, "corpus_capture_recapture").iloc[0]
    sh = _shingle_sets(_docs())
    A = set().union(*(s for d, s in sh.items() if d % 2 == 0))
    B = set().union(*(s for d, s in sh.items() if d % 2 == 1))
    na, nb, m = len(A), len(B), len(A & B)
    assert (int(out["n_a"]), int(out["n_b"]), int(out["m_overlap"])) == (na, nb, m)
    assert int(out["n_observed"]) == len(A | B)
    chapman = math.floor((na + 1) * (nb + 1) / (m + 1)) - 1
    assert int(out["chapman_total_est"]) == chapman
    assert int(out["coverage_e6"]) == int(_rha(len(A | B) / chapman * 1e6)[()])
    # estimator sanity: never below what we already observed... Chapman
    # can dip slightly below under heavy overlap, but must be positive
    assert chapman > 0


# ---------------------------------------------------------------------------
# Hamilton apportionment
# ---------------------------------------------------------------------------


def test_token_budget_allocations_sum_exactly(spark):
    out = _collect(spark, "corpus_token_budget_mix")
    assert int(out["alloc_tokens"].sum()) == 1_000_000
    docs = _docs()
    docs["tok"] = docs["text"].str.split(" ").str.len()
    strata = docs.groupby(["lang", "source"])["tok"].sum()
    T = int(strata.sum())
    # replay Hamilton: floor quotas + largest remainders
    rows = []
    for (lang, source), t in strata.items():
        q = 1_000_000 * int(t)
        rows.append((lang, source, int(t), q // T, q - (q // T) * T))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    R = 1_000_000 - sum(r[3] for r in rows)
    alloc = {
        (r[0], r[1]): r[3] + (1 if i < R else 0) for i, r in enumerate(rows)
    }
    for _, r in out.iterrows():
        assert int(r["alloc_tokens"]) == alloc[(r["lang"], r["source"])]
        assert int(r["tokens_available"]) == int(strata.loc[(r["lang"], r["source"])])
    # every allocation within 1 of its exact proportional quota
    for _, r in out.iterrows():
        exact = 1_000_000 * int(r["tokens_available"]) / T
        assert abs(int(r["alloc_tokens"]) - exact) < 1.0


# ---------------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_set_replay(spark):
    out = _collect(spark, "text_ngram_novelty").set_index("source")
    docs = _docs()
    sh = _shingle_sets(docs)
    df = {}
    for d, s in sh.items():
        for g in s:
            df[g] = df.get(g, 0) + 1
    per_source = {}
    for _, r in docs.iterrows():
        d = int(r["doc_id"])
        if not sh[d]:
            continue
        uniq = sum(1 for g in sh[d] if df[g] == 1)
        nov = int(_rha(uniq / len(sh[d]) * 1e6)[()])
        per_source.setdefault(r["source"], []).append(nov)
    for src, novs in per_source.items():
        r = out.loc[src]
        assert int(r["n_docs"]) == len(novs)
        assert int(r["mean_novelty_e6"]) == int(_rha(sum(novs) / len(novs))[()])
        assert int(r["min_novelty_e6"]) == min(novs)
        assert int(r["max_novelty_e6"]) == max(novs)
        assert int(r["n_low_novelty"]) == sum(1 for x in novs if x < 500000)


# ---------------------------------------------------------------------------
# dispersion
# ---------------------------------------------------------------------------


def test_burstiness_dispersion_matches_replay(spark):
    out = _collect(spark, "text_burstiness_dispersion")
    docs = _docs()
    cnt = {}
    src_tot = {}
    for _, r in docs.iterrows():
        for w in r["text"].split(" "):
            cnt[(w, r["source"])] = cnt.get((w, r["source"]), 0) + 1
            src_tot[r["source"]] = src_tot.get(r["source"], 0) + 1
    term_tot = {}
    for (w, s), c in cnt.items():
        term_tot[w] = term_tot.get(w, 0) + c
    T = sum(src_tot.values())
    top = sorted(term_tot.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(out) == 20
    for rk, (term, f_t) in enumerate(top, start=1):
        r = out[out["term"] == term].iloc[0]
        assert int(r["freq_rank"]) == rk and int(r["term_freq"]) == f_t
        num = sum(
            abs(cnt.get((term, s), 0) * T - ts * f_t) for s, ts in src_tot.items()
        )
        assert int(r["dp_e9"]) == int(_rha(num / (2.0 * f_t * T) * 1e9)[()])
        assert 0 <= int(r["dp_e9"]) <= 10**9


def test_stopword_disperses_more_evenly_than_rare_term(spark):
    """DP sanity: the most frequent term should sit well below the
    theoretical max and the list should show real spread."""
    out = _collect(spark, "text_burstiness_dispersion")
    assert int(out[out["freq_rank"] == 1].iloc[0]["dp_e9"]) < 500_000_000


# ---------------------------------------------------------------------------
# Cronbach's alpha
# ---------------------------------------------------------------------------


def test_cronbach_alpha_matches_replay(spark):
    out = _collect(spark, "stats_cronbach_alpha")
    ev = duckdb.sql(
        "SELECT event_type, user_id, COUNT(*) AS x "
        f"FROM '{SF_SMOKE_DIR}/events.parquet' GROUP BY 1, 2"
    ).df()
    mat = ev.pivot_table(
        index="user_id", columns="event_type", values="x", fill_value=0
    ).astype(np.int64)
    k = mat.shape[1]
    n = mat.shape[0]
    item_var_num = 0
    for c in mat.columns:
        x = mat[c].to_numpy()
        item_var_num += int(n * (x.astype(object) ** 2).sum() - int(x.sum()) ** 2)
    tot = mat.sum(axis=1).to_numpy()
    tot_var_num = int(n * (tot.astype(object) ** 2).sum() - int(tot.sum()) ** 2)
    alpha = k / (k - 1) * (1 - item_var_num / tot_var_num)
    assert len(out) == k
    assert (out["alpha_e9"] == int(_rha(alpha * 1e9)[()])).all()
    assert (out["k_items"] == k).all() and (out["n_users"] == n).all()
    for _, r in out.iterrows():
        x = mat[r["event_type"]].to_numpy()
        assert int(r["var_item_num"]) == int(
            n * (x.astype(object) ** 2).sum() - int(x.sum()) ** 2
        )


# ---------------------------------------------------------------------------
# ECE
# ---------------------------------------------------------------------------


def test_ece_matches_replay_and_bounds(spark):
    out = _collect(spark, "ml_expected_calibration_error").iloc[0]
    ev = duckdb.sql(
        "SELECT event_id, CAST(ROUND(value*1000) AS BIGINT) AS v_e3, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()
    v = ev["v_e3"].to_numpy()
    lo, hi = int(v.min()), int(v.max())
    b = np.minimum(np.floor((v - lo) * 10.0 / (hi - lo + 1)).astype(int), 9)
    half = ev["event_id"].to_numpy() % 2
    y = ev["y"].to_numpy()
    p = {}
    for kbin in np.unique(b[half == 0]):
        m = (half == 0) & (b == kbin)
        p[int(kbin)] = int(_rha(y[m].sum() / m.sum() * 1e9)[()])
    p0 = int(_rha(y[half == 0].sum() / (half == 0).sum() * 1e9)[()])
    wsum = 0
    mce = 0
    ntest = int((half == 1).sum())
    nb_bins = 0
    for kbin in np.unique(b[half == 1]):
        m = (half == 1) & (b == kbin)
        o = int(_rha(y[m].sum() / m.sum() * 1e9)[()])
        gap = abs(p.get(int(kbin), p0) - o)
        wsum += int(m.sum()) * gap
        mce = max(mce, gap)
        nb_bins += 1
    assert int(out["n_test"]) == ntest
    assert int(out["n_bins"]) == nb_bins
    assert int(out["ece_e9"]) == int(_rha(wsum / ntest)[()])
    assert int(out["mce_e9"]) == mce
    assert int(out["ece_e9"]) <= int(out["mce_e9"]) <= 10**9
