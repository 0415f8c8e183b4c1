"""Wave-13b operators: planted closed-form fixtures (HMM decode on
pure sequences, Croston on a perfectly regular demand train, k-truss
on a constructed clique-plus-pendant graph, MTLD on a cyclic token
stream with hand-derivable factor boundaries)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _events_frame(event_types, user_ids, ts=None):
    n = len(event_types)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Series(
                ts
                if ts is not None
                else [
                    pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i)
                    for i in range(n)
                ]
            ),
            "user_id": np.asarray(user_ids, dtype=np.int64),
            "event_type": event_types,
            "value": 1.0,
            "props": "{}",
        }
    )


def _lp(p):
    return round(math.log(p) * 1000)


# ---------------------------------------------------------------------------
# HMM Viterbi
# ---------------------------------------------------------------------------


def test_hmm_pure_sequences_decode_to_the_right_state(spark, tmp_path):
    """All-purchase users decode engaged on every event; all-error
    users decode casual throughout. Scores are hand-computable in
    exact integer arithmetic."""
    types = ["purchase"] * 6 + ["error"] * 6
    uids = [1] * 6 + [2] * 6
    _events_frame(types, uids).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "events_hmm_viterbi", str(tmp_path)).set_index("user_id")

    # user 1: enter engaged at step 1 (T01), stay (T11): never worth
    # leaving for purchase emissions.
    e1_p = _lp(0.35)
    expect1 = (_lp(0.20) + e1_p) + 5 * (_lp(0.70) + e1_p)
    assert out.loc[1, "final_state"] == "engaged"
    assert int(out.loc[1, "n_engaged"]) == 6
    assert int(out.loc[1, "map_ll_e3"]) == expect1

    # user 2: stay casual the whole way (T00 + casual error emission).
    e0_e = _lp(0.20)
    expect2 = 6 * (_lp(0.80) + e0_e)
    assert out.loc[2, "final_state"] == "casual"
    assert int(out.loc[2, "n_engaged"]) == 0
    assert int(out.loc[2, "map_ll_e3"]) == expect2


def test_hmm_smoke_invariants(spark):
    out = _collect(spark, "events_hmm_viterbi")
    ev = pd.read_parquet(f"{SF_SMOKE_DIR}/events.parquet")
    assert len(out) == ev["user_id"].nunique()
    assert (out["n_engaged"] <= out["n_events"]).all()
    assert (out["map_ll_e3"] < 0).all()
    assert set(out["final_state"]) <= {"casual", "engaged"}


# ---------------------------------------------------------------------------
# Croston
# ---------------------------------------------------------------------------


def test_croston_regular_train_is_exact(spark, tmp_path):
    """Demand 10 every 4 weeks, first demand 4 weeks after the series
    start: every interval is exactly 4, every size exactly 10, so the
    SES fixed points are exact: z = 10, p = 4, forecast = 0.9*10/4."""
    t0 = pd.Timestamp("2024-01-06")  # avoid epoch-week boundary effects
    rows = []
    # a second part pins the global series start at week offset 0
    rows.append((2, t0, 1.0))
    for i in range(8):
        rows.append((1, t0 + pd.Timedelta(weeks=3 + 4 * i), 10.0))
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(len(rows), dtype=np.int64),
            "l_partkey": np.asarray([r[0] for r in rows], dtype=np.int64),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.int32(1),
            "l_quantity": np.asarray([r[2] for r in rows], dtype=np.float64),
            "l_extendedprice": 1.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            # microseconds: TIMESTAMP(NANOS) would read as BIGINT under
            # the session-wide nanosAsLong conf (only events.ts gets the
            # catalog's div-1000 repair)
            "l_shipdate": pd.Series([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = _collect(spark, "demand_croston_sbc", str(tmp_path)).set_index(
        "l_partkey"
    )
    row = out.loc[1]
    assert int(row["n_demands"]) == 8
    assert int(row["z_e6"]) == 10_000_000
    assert int(row["p_e6"]) == 4_000_000
    assert int(row["forecast_e9"]) == 2_250_000_000
    assert bool(row["intermittent"])


def test_croston_smoke_invariants(spark):
    out = _collect(spark, "demand_croston_sbc")
    assert (out["p_e6"] >= 1_000_000).all()  # intervals are >= 1 week
    assert (out["z_e6"] > 0).all()
    assert (out["n_demands"] >= 1).all()
    # forecast = 0.9 z / p exactly (replay the epilogue)
    z = out["z_e6"].to_numpy() / 1e6
    p = out["p_e6"].to_numpy() / 1e6
    exp = np.where(
        p > 0,
        np.where(0.9 * z / p * 1e9 >= 0,
                 np.floor(0.9 * z / p * 1e9 + 0.5),
                 np.ceil(0.9 * z / p * 1e9 - 0.5)),
        0,
    ).astype(np.int64)
    got = out["forecast_e9"].to_numpy(dtype=np.int64)
    assert (np.abs(got - exp) <= 1).all()


# ---------------------------------------------------------------------------
# k-truss
# ---------------------------------------------------------------------------


def test_ktruss_clique_survives_pendant_peels(spark, tmp_path):
    """K4 on a tight cone (pairwise cosine ~.87-.98) plus one pendant
    vertex that clears the 0.25 threshold against exactly one clique
    member: the pendant edge has support 0 and peels in round 1; the
    six K4 edges each sit in exactly 2 triangles and survive with
    support 2."""
    angles = [0.0, 10.0, 20.0, 30.0, -80.0]  # degrees from x-axis
    vecs = [
        np.array([math.cos(math.radians(a)), math.sin(math.radians(a)), 0.0],
                 dtype=np.float32)
        for a in angles
    ]
    # pendant (index 4) vs clique: cos(80)=.17 <.25 to v0? adjust: we
    # want exactly one edge -> angle gaps: to v0 80 (cos .17 no)...
    # use -75: v0 gap 75 (cos .26 yes), v1 gap 85 (cos .087 no).
    vecs[4] = np.array(
        [math.cos(math.radians(-75.0)), math.sin(math.radians(-75.0)), 0.0],
        dtype=np.float32,
    )
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [v for v in vecs],
            "label": np.int32(0),
        }
    )
    emb.to_parquet(tmp_path / "embeddings.parquet", index=False)
    out = _collect(spark, "graph_ktruss", str(tmp_path))
    got = {(int(r.a_id), int(r.b_id)): int(r.support) for r in out.itertuples()}
    expected_edges = {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert set(got) == expected_edges
    assert all(s == 2 for s in got.values())


def test_ktruss_smoke_matches_probe(spark):
    """The sf-smoke truss output: every surviving edge's recomputed
    support is consistent (support counts triangles inside the final
    edge set, so an edge's support can be 0 only if the peel has not
    yet converged past it)."""
    out = _collect(spark, "graph_ktruss")
    assert (out["support"] >= 0).all()
    # every edge is oriented low -> high
    assert (out["a_id"] < out["b_id"]).all()


# ---------------------------------------------------------------------------
# MTLD
# ---------------------------------------------------------------------------


def _docs_frame(texts):
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "src0",
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )


def test_mtld_cyclic_and_distinct_closed_forms(spark, tmp_path):
    """'a b c d' x 5: factors complete at positions 6, 12, 18 (TTR
    4/6 < .72), the tail (2 tokens, TTR 1) contributes no partial ->
    MTLD = 20/3. All-distinct 20 tokens: TTR never drops, factors =
    0, partial = 0 -> MTLD = n_tokens by convention."""
    cyc = " ".join(["a", "b", "c", "d"] * 5)
    distinct = " ".join(f"w{i}" for i in range(20))
    _docs_frame([cyc, distinct]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = _collect(spark, "text_mtld", str(tmp_path)).set_index("doc_id")
    assert int(out.loc[0, "factors"]) == 3
    assert int(out.loc[0, "mtld_fwd_e6"]) == 6_666_667  # 20/3
    assert int(out.loc[1, "factors"]) == 0
    assert int(out.loc[1, "mtld_fwd_e6"]) == 20_000_000


def test_mtld_partial_factor_counts(spark, tmp_path):
    """'a b c d' x 5 + 'x y z': after the factor at 18, the open
    segment is (a b x y z)? No — positions 19..23 are a, b, x, y, z:
    all new within the segment (TTR 1) -> partial 0, factors 3,
    MTLD = 23/3. Then a repeating tail 'a a a a a' instead: TTR
    collapses -> a fourth factor completes inside the tail."""
    t1 = " ".join(["a", "b", "c", "d"] * 5 + ["x", "y", "z"])
    t2 = " ".join(["a", "b", "c", "d"] * 5 + ["a"] * 5)
    _docs_frame([t1, t2]).to_parquet(tmp_path / "documents.parquet", index=False)
    out = _collect(spark, "text_mtld", str(tmp_path)).set_index("doc_id")
    assert int(out.loc[0, "factors"]) == 3
    assert int(out.loc[0, "mtld_fwd_e6"]) == 7_666_667  # 23/3
    # set-based replay: factors complete at 6, 12, 18, 23, 25
    assert int(out.loc[1, "factors"]) == 5


def test_mtld_replay_smoke(spark):
    """Independent per-document python replay of the forward MTLD
    definition (sets, not the lastocc trick)."""
    out = _collect(spark, "text_mtld").set_index("doc_id")
    docs = pd.read_parquet(f"{SF_SMOKE_DIR}/documents.parquet")
    for _, d in docs.iterrows():
        toks = d["text"].split(" ")
        factors, seen, start = 0, set(), 0
        for i, t in enumerate(toks):
            seen.add(t)
            ttr = len(seen) / (i - start + 1)
            if ttr < 0.72:
                factors += 1
                seen, start = set(), i + 1
        if start <= len(toks) - 1:
            ttr = len(seen) / (len(toks) - start)
            partial = (1 - ttr) / 0.28
        else:
            partial = 0.0
        n = len(toks)
        mtld = n / (factors + partial) if factors + partial > 0 else n
        row = out.loc[d["doc_id"]]
        assert int(row["factors"]) == factors, d["doc_id"]
        assert abs(int(row["mtld_fwd_e6"]) - round(mtld * 1e6)) <= 1, d["doc_id"]
