"""Smoke test for tools/inflate_x10.py (r11 VERDICT item 6): build a
x2 slice of every table from the sf0.001 fixture and assert the
invariants the decade-up ritual rests on — row counts, key-salt
disjointness, shingle-disjointness of document replicas, and exact
norm/inner-product preservation of the embedding rolls. Without this,
the probe's reproducibility rests on the script not bit-rotting."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def inflated(tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("sfx2"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "inflate_x10", os.path.join(root, "tools", "inflate_x10.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    sys.argv = ["inflate_x10.py", SRC, dest, "2"]
    try:
        mod.main()
    finally:
        sys.argv = old_argv
    return dest


def test_row_counts_scale_by_factor(inflated):
    con = duckdb.connect()
    for t in ("events", "customer", "orders", "lineitem", "documents",
              "embeddings"):
        n_src = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{inflated}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == 2 * n_src, t
    for t in ("region", "nation", "supplier", "part"):
        n_src = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_out = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{inflated}/{t}.parquet')"
        ).fetchone()[0]
        assert n_out == n_src, t  # dims are passthrough
    con.close()


def test_key_salts_are_disjoint(inflated):
    """No key collides across replicas, and replica 0 is byte-identical
    to the source keys — the salt must shift, never remap."""
    con = duckdb.connect()
    for t, key in (("events", "event_id"), ("customer", "c_custkey"),
                   ("orders", "o_orderkey"), ("documents", "doc_id"),
                   ("embeddings", "vec_id")):
        n, nd = con.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT {key}) "
            f"FROM read_parquet('{inflated}/{t}.parquet')"
        ).fetchone()
        assert n == nd, t
    # replica separation on users: no user_id appears in both replicas
    overlap = con.sql(f"""
        WITH e AS (SELECT user_id,
                          event_id >= 100000000 AS rep
                   FROM read_parquet('{inflated}/events.parquet'))
        SELECT COUNT(*) FROM
          (SELECT user_id FROM e WHERE rep
           INTERSECT SELECT user_id FROM e WHERE NOT rep) x
    """).fetchone()[0]
    assert overlap == 0
    con.close()


def test_document_replicas_are_shingle_disjoint(inflated):
    """The token-salt residue rule: any 8-token shingle of a k=1 replica
    contains at least one salted token, so no 8-gram is shared between
    replica 0 and replica 1 of the same document (cluster COUNT grows
    with the factor while cluster SIZES stay constant)."""
    docs = pd.read_parquet(f"{inflated}/documents.parquet")
    base = docs[docs.doc_id < 100000].set_index("doc_id")
    rep = docs[docs.doc_id >= 100000].copy()
    rep["orig"] = rep.doc_id - 100000
    rep = rep.set_index("orig")

    def shingles(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i:i + 8]) for i in range(max(0, len(toks) - 7))
        }

    checked = 0
    for did in list(base.index[:50]):
        s0 = shingles(base.loc[did, "text"])
        s1 = shingles(rep.loc[did, "text"])
        if s0 and s1:
            assert not (s0 & s1), did
            checked += 1
    assert checked > 10
    # n_chars recomputed from the perturbed text
    assert (docs["n_chars"] == docs["text"].str.len()).all()


def test_embedding_rolls_preserve_geometry(inflated):
    """Per-replica dimension rolls are isometries: norms exact, and any
    within-replica inner product equals the corresponding base one."""
    emb = pd.read_parquet(f"{inflated}/embeddings.parquet")
    base = emb[emb.vec_id < 100000]
    rep = emb[emb.vec_id >= 100000]
    m0 = np.stack(base["embedding"].to_numpy())
    m1 = np.stack(rep["embedding"].to_numpy())
    assert m0.shape == m1.shape
    # rolled by exactly one dimension (element-level bit-exact)
    assert np.array_equal(np.roll(m0, 1, axis=1), m1)
    # norms/inner products preserved as REAL numbers — the roll permutes
    # summation order, so the float reductions agree to last-ulp scale,
    # not bit-exactly
    # (embeddings are float32 — ulp scale ~1e-7 relative)
    assert np.allclose(
        np.linalg.norm(m0, axis=1), np.linalg.norm(m1, axis=1),
        rtol=1e-6, atol=0,
    )
    k = min(20, len(m0))
    g0 = m0[:k] @ m0[:k].T
    g1 = m1[:k] @ m1[:k].T
    assert np.allclose(g0, g1, rtol=1e-5, atol=1e-6)


def test_determinism_two_runs_identical(inflated, tmp_path):
    """No RNG anywhere: a second run produces byte-identical documents
    (the table with the most intricate per-replica rule)."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "inflate_x10_b", os.path.join(root, "tools", "inflate_x10.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dest2 = str(tmp_path / "again")
    os.makedirs(dest2)
    old_argv = sys.argv
    sys.argv = ["inflate_x10.py", SRC, dest2, "2"]
    try:
        mod.main()
    finally:
        sys.argv = old_argv
    a = pd.read_parquet(f"{inflated}/documents.parquet")
    b = pd.read_parquet(f"{dest2}/documents.parquet")
    pd.testing.assert_frame_equal(a, b)
