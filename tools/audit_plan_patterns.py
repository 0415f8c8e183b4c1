"""Fleet-wide physical-plan anti-pattern audit (round-15 standing
ritual, the companion of audit_single_partition.py).

Scans every registered query's PHYSICAL plan for the three shapes the
scale review hunts by hand:

  * CartesianProduct            — an unconditioned cross join of two
                                  data-sized sides (a broadcast cross
                                  join compiles to BroadcastNestedLoop,
                                  NOT CartesianProduct, so any hit here
                                  is both sides unpinned).
  * BroadcastNestedLoopJoin     — fine when one side is a scalar/small
                                  relation (the repo broadcasts those
                                  deliberately); the audit REPORTS them
                                  so every instance is a reviewed one.
  * BatchEvalPython / ArrowEval — row-at-a-time or Arrow Python UDF
                                  stages; the repo's contract is ONE
                                  intentional demo row
                                  (python_udf_scalar) plus the
                                  documented pandas/arrow tiers.

A flag is not automatically a bug — the point is that every flag is
REVIEWED: diff the printed sets against the snapshot in ROUND_NOTES
and review anything NEW before shipping.

Usage: python tools/audit_plan_patterns.py [SF_DIR]
"""

from __future__ import annotations

import sys


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-pattern-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    from emr_with_custom_metrics_spark.registry import all_specs

    cartesian, bnlj, pyudf, errs = [], [], [], []
    specs = all_specs()
    for i, (name, spec) in enumerate(specs.items()):
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 — audit must survive
            errs.append((name, type(exc).__name__))
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj.append(name)
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            pyudf.append(name)
        if i % 100 == 0:
            print(f".. {i}/{len(specs)}", flush=True)

    print(f"\nCartesianProduct ({len(cartesian)}): {sorted(cartesian)}")
    print(f"BroadcastNestedLoopJoin ({len(bnlj)}): {sorted(bnlj)}")
    print(f"Python-UDF stages ({len(pyudf)}): {sorted(pyudf)}")
    print(f"errors ({len(errs)}): {errs}")
    spark.stop()


if __name__ == "__main__":
    main()
