"""Decade-up probe for the wave-16a/16b/16c/16d operators (the standing round
ritual: every new operator gets one measured decade before the round
closes). Times each at sf0.1 and at the x10 fixture from
tools/inflate_x10.py, best-of-2, single 24 GB JVM, uncontended.

Usage: python tools/probe_wave16_x10.py [SF01_DIR] [X10_DIR]
"""

from __future__ import annotations

import sys
import time

SF01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
X10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1_r13"

ROWS = [
    "sketch_spacesaving_topk",
    "timeseries_kpss",
    "spc_ewma_chart",
    "sketch_bottomk_jaccard",
    "graph_conductance_labels",
    "stats_hoeffding_drift",
    "retrieval_dirichlet_lm",
    "corpus_source_concentration",
    "stats_atkinson_spend",
    "stats_mood_median",
    "text_oov_rate",
    "sketch_ams_f2",
    "text_chao1_richness",
    "stats_eb_shrinkage",
    "sample_weighted_reservoir",
    "dq_eval_leakage_screen",
    "join_bloom_prefilter_dim",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("wave16-x10-probe")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    from emr_with_custom_metrics_spark.registry import all_specs

    specs = all_specs()

    def run_once(name: str, sf_dir: str):
        t0 = time.time()
        try:
            n = specs[name].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — probe must survive
            return f"ERR {type(exc).__name__}", None
        return time.time() - t0, n

    results = []
    for name in ROWS:
        per_scale = []
        for sf_dir in (SF01, X10):
            a, n = run_once(name, sf_dir)
            if not isinstance(a, str):
                b, _ = run_once(name, sf_dir)
                if not isinstance(b, str):
                    a = min(a, b)
            per_scale.append((a, n))
            disp = a if isinstance(a, str) else f"{a:.2f}s"
            print(f"  .. {name} @ {sf_dir}: {disp} rows={n}", flush=True)
        results.append((name, per_scale))

    print("\n| row | sf0.1 | x10 | ratio | rows sf0.1 -> x10 |")
    print("|---|---|---|---|---|")
    for name, ((a, na), (b, nb)) in results:
        if isinstance(a, str) or isinstance(b, str):
            print(f"| {name} | {a} | {b} | — | {na} -> {nb} |")
        else:
            print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x | {na} -> {nb} |")
    spark.stop()


if __name__ == "__main__":
    main()
