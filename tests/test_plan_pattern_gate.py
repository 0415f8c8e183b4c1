"""Drift-proof gate for the fleet-wide plan-pattern audit (r14 VERDICT
item 3, modeled on the COVERAGE gate in test_coverage_doc.py): every
CartesianProduct / BroadcastNestedLoopJoin / Python-UDF stage found in
any registered query's physical plan must appear in the checked-in
review ledger ``tools/plan_pattern_classification.json``. A new flag
can only ship after a human classifies it there with a reason — the
audit stops being a ritual someone remembers to run and becomes a test
that fails when skipped.

Builds all ~490 physical plans (no execution) at the smoke SF — the
suite's one deliberately heavy structural test (~3-5 min).
"""

from __future__ import annotations

import os
import sys

from .conftest import SF_SMOKE_DIR

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)


def test_every_plan_pattern_flag_is_classified(spark):
    import audit_plan_patterns as app

    from emr_with_custom_metrics_spark.registry import all_specs

    found = app.scan(spark, SF_SMOKE_DIR, all_specs())
    assert found["errors"] == [], found["errors"]

    table = app.load_classification()
    diff = app.diff_vs_classification(found, table)

    unclassified = {
        k: d["unclassified"] for k, d in diff.items() if d["unclassified"]
    }
    assert not unclassified, (
        "physical-plan flags with no entry in tools/"
        f"plan_pattern_classification.json — review and classify: "
        f"{unclassified}"
    )
    # Stale entries rot the ledger the other way (renamed/removed query
    # or a plan that LOST the pattern, which is itself worth seeing).
    stale = {k: d["stale"] for k, d in diff.items() if d["stale"]}
    assert not stale, f"stale classification entries — prune: {stale}"

    # The contract counts: any growth is visible in this diff forever.
    assert len(table["python_udf"]) == 3, (
        "the Python-UDF contract is ONE demo UDF + two UDTF rows; a "
        "4th entry needs the same scrutiny python_udf_scalar got"
    )
