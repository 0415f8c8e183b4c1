"""Fleet-wide SinglePartition-window audit (round-11 standing ritual).

Scans every registered query's PHYSICAL plan for `Exchange
SinglePartition` co-occurring with a Window — the shape that put
ml_confusion_multiclass at 6.1x for 10x data in the round-11 decade-up
probe (one task sorts everything). A flag is NOT automatically a bug:
the stats family's cumulative windows run over VALUE HISTOGRAMS, whose
cardinality saturates at the value-domain cap (measured on events:
6.6k distinct v_e3 at 10k rows -> 17.8k at 100k rows -> hard cap 1e5
for a [0,100] metric at e3), so those single partitions carry a
BOUNDED relation at any corpus size. The audit exists to make every
flag a REVIEWED flag:

  * bounded-by-value-domain (histogram cums) ........... acceptable
  * bounded-by-calendar (hourly/daily spines) .......... acceptable
  * bounded-by-vocab (term ranks; vocab ~ Heaps-sublinear) documented
  * bounded-by-model (top-k pools, decile tables) ...... acceptable
  * DATA-SIZED rows through one task ................... fix it
    (the histogram-order-statistic rewrite: cumulative counts pick the
    value, a window partitioned BY VALUE picks the id offset)

Usage: python tools/audit_single_partition.py [SF_DIR]
Prints the flagged set; diff against the reviewed snapshot in
SCALING.md §round-11 — NEW names need a review before shipping.
"""

from __future__ import annotations

import sys


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("single-partition-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # resolve the repo from THIS file's location, never a hardcoded
    # path: a worktree run with the old literal silently audited the
    # live tree instead (found while re-baselining in round 12)
    import os as _os

    sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from emr_with_custom_metrics_spark.registry import all_specs

    flagged = {}
    coarse = {}
    errors = []
    for name, spec in all_specs().items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            errors.append((name, type(exc).__name__))
            continue
        n_sp = plan.count("Exchange SinglePartition")
        if n_sp and "Window" in plan:
            coarse[name] = n_sp
        # The actionable shape is the CHAIN Window -> Sort -> Exchange
        # SinglePartition (one task sorts the window's whole input).
        # A bare single-partition exchange under a scalar HashAggregate
        # (global sums, scalar subqueries) is a one-row reduction and
        # was polluting the coarse count (round 12: the coarse rule
        # matched 56 queries, 40+ of them scalar-aggregate shapes).
        lines = [ln.strip() for ln in plan.splitlines()]
        n_chain = 0
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            above = " ".join(lines[max(0, i - 2):i])
            if "Sort [" in above and "Window [" in " ".join(
                lines[max(0, i - 3):i]
            ):
                n_chain += 1
        if n_chain:
            flagged[name] = n_chain
    for k, v in sorted(flagged.items()):
        print(f"FLAG {k}: {v}")
    print(
        "coarse-only (scalar-aggregate SinglePartition + unrelated "
        "Window; informational):",
        sorted(set(coarse) - set(flagged)),
    )
    if errors:
        print("errors:", errors)
    print(f"total flagged: {len(flagged)} / {len(all_specs())}")
    spark.stop()


if __name__ == "__main__":
    main()
