#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count-style action (the driver's
correctness gate covers values; this measures execution time end-to-end
including scan, shuffle, and any Python stages).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_with_custom_metrics_spark import registry  # noqa: E402
from emr_with_custom_metrics_spark.session import get_spark  # noqa: E402

# Headline set: scan-agg, multi-join, window, asof, streaming-batch,
# text/dedup/similarity — one per operator family, heaviest variant.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "sql_q6_forecast_revenue",
    "agg_stats",
    "window_rank_battery",
    "topk_per_group",
    "asof_purchase_last_click",
    "join_interval_time",
    "metrics_tumbling_avg",
    "session_windows",
    "timeseries_gapfill_ffill",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_topk_exact",
    "similarity_ivf_topk",
    "similarity_ann_lsh",
    "text_word_freq_topk",
    "text_tfidf_top_term",
    "multimodal_decode_meta",
    # round-2 additions (new rows; the 21 rows above stay diffable vs r01)
    "q7_nation_volume",
    "q19_disjunctive_pred",
    "scd2_customer_history",
    "bitmap_weekly_retention",
    "text_fingerprint_winnowing",
    "decontaminate_against_eval",
    "dedup_levenshtein_blocked",
    "knn_self_join_exact",
    "kmeans_embeddings",
    "pagerank_similarity_graph",
    "e2e_corpus_pipeline",
    "multimodal_decode_wav",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup.
    specs["a1_group_count"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-2: the second run amortizes JIT/py-worker warmup noise so
        # the recorded figure reflects the query, not the JVM's mood
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
