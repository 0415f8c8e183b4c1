"""The round-9 pair-generation memo: reuse must be bit-identical,
keyed strictly by (session, sf_dir, kind, threshold) — a cache
collision across sf_dirs or thresholds would silently serve the wrong
graph to eight operators."""

from __future__ import annotations

from tests.conftest import SF_SMOKE_DIR

SF_001 = "/root/testdata/sf0.01"


def test_cosine_memo_hits_same_key(spark):
    from emr_with_custom_metrics_spark.llm.dedup import embedding_cosine_pairs

    a = embedding_cosine_pairs(spark, SF_SMOKE_DIR, threshold=0.3)
    b = embedding_cosine_pairs(spark, SF_SMOKE_DIR, threshold=0.3)
    assert a is b  # cache hit returns the SAME checkpointed frame


def test_cosine_memo_misses_across_threshold_and_sf(spark):
    from emr_with_custom_metrics_spark.llm.dedup import embedding_cosine_pairs

    base = embedding_cosine_pairs(spark, SF_SMOKE_DIR, threshold=0.3)
    other_thr = embedding_cosine_pairs(spark, SF_SMOKE_DIR, threshold=0.4)
    other_sf = embedding_cosine_pairs(spark, SF_001, threshold=0.3)
    assert base is not other_thr
    assert base is not other_sf
    # 0.4 edges are a strict subset of 0.3 edges
    n3, n4 = base.count(), other_thr.count()
    assert n4 <= n3
    only = other_thr.join(base, ["a_id", "b_id"], "left_anti").count()
    assert only == 0


def test_jaccard_memo_rows_match_uncached(spark):
    from emr_with_custom_metrics_spark.catalog import load_table
    from emr_with_custom_metrics_spark.llm.dedup import (
        _shingle_sets,
        jaccard_pairs,
        shingle_jaccard_pairs_cached,
    )

    cached = shingle_jaccard_pairs_cached(spark, SF_SMOKE_DIR, 0.5)
    fresh = jaccard_pairs(
        _shingle_sets(load_table(spark, SF_SMOKE_DIR, "documents")), 0.5
    )
    a = sorted(map(tuple, cached.collect()))
    b = sorted(map(tuple, fresh.collect()))
    assert a == b
