"""Fleet-wide physical-plan anti-pattern audit (round-14 standing
ritual, the companion of audit_single_partition.py) — now a mechanical
GATE (r14 VERDICT item 3): every flag must appear in the checked-in
classification table ``tools/plan_pattern_classification.json``, and
``tests/test_plan_pattern_gate.py`` fails the suite on any unclassified
new entrant.

Scans every registered query's PHYSICAL plan for the three shapes the
scale review hunts by hand:

  * CartesianProduct            — an unconditioned cross join of two
                                  data-sized sides (a broadcast cross
                                  join compiles to BroadcastNestedLoop,
                                  NOT CartesianProduct, so any hit here
                                  is both sides unpinned). Classified
                                  entries carry the reviewed BOUND of
                                  both sides.
  * BroadcastNestedLoopJoin     — fine when one side is a scalar/small
                                  relation (the repo broadcasts those
                                  deliberately); every instance must be
                                  a REVIEWED one (named in the table).
  * BatchEvalPython / ArrowEval — row-at-a-time or Arrow Python UDF
                                  stages; the repo's contract is ONE
                                  intentional demo row
                                  (python_udf_scalar) plus the two
                                  UDTF rows' BatchEvalPython.

A flag is not automatically a bug — the gate exists so a flag can only
ship after a human classified it with a reason, exactly like the
COVERAGE doc gate (tests/test_coverage_doc.py).

Usage: python tools/audit_plan_patterns.py [SF_DIR]
Exit: 0 when every flag is classified (stale table entries are
reported as warnings), 1 on unclassified entrants.
"""

from __future__ import annotations

import json
import os
import sys

CLASSIFICATION_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "plan_pattern_classification.json",
)


def scan(spark, sf_dir: str, specs: dict, progress: bool = False) -> dict:
    """Build every registered query's physical plan (no execution) and
    return {"cartesian": [...], "bnlj": [...], "python_udf": [...],
    "errors": [(name, exc), ...]} sorted by name."""
    cartesian, bnlj, pyudf, errs = [], [], [], []
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
        if progress and i % 100 == 0:
            print(f".. {i}/{len(specs)}", flush=True)
    return {
        "cartesian": sorted(cartesian),
        "bnlj": sorted(bnlj),
        "python_udf": sorted(pyudf),
        "errors": errs,
    }


def load_classification() -> dict:
    with open(CLASSIFICATION_PATH) as fh:
        return json.load(fh)


def diff_vs_classification(found: dict, table: dict) -> dict:
    """Unclassified entrants (gate failures) and stale table entries
    (warnings — a query was renamed/removed or its plan lost the
    pattern; prune the table)."""
    out: dict[str, dict] = {}
    for key in ("cartesian", "bnlj", "python_udf"):
        classified = set(table.get(key, {}))
        hits = set(found[key])
        out[key] = {
            "unclassified": sorted(hits - classified),
            "stale": sorted(classified - hits),
        }
    return out


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
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from emr_with_custom_metrics_spark.registry import all_specs

    found = scan(spark, sf_dir, all_specs(), progress=True)
    print(f"\nCartesianProduct ({len(found['cartesian'])}): {found['cartesian']}")
    print(f"BroadcastNestedLoopJoin ({len(found['bnlj'])}): {found['bnlj']}")
    print(f"Python-UDF stages ({len(found['python_udf'])}): {found['python_udf']}")
    print(f"errors ({len(found['errors'])}): {found['errors']}")

    rc = 0
    try:
        table = load_classification()
    except OSError:
        print(f"\nNO classification table at {CLASSIFICATION_PATH}")
        table = {}
        rc = 1
    diff = diff_vs_classification(found, table)
    for key, d in diff.items():
        if d["unclassified"]:
            print(f"UNCLASSIFIED {key}: {d['unclassified']}")
            rc = 1
        if d["stale"]:
            print(f"stale table entries ({key}): {d['stale']}")
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
