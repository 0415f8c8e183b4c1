"""COVERAGE.md completeness gate (r13 VERDICT item 2).

Round 13 found the row-by-row cross-reference silently missing the six
wave-14d/14e operators while its ledger arithmetic jumped 462 -> 469
with only +1 accounted. This test makes the file structurally unable
to drift again: every name in the live registry must appear in
COVERAGE.md as a backticked token, and the per-wave ledger counts in
the section headers must sum to the registry size.
"""

from __future__ import annotations

import os
import re

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _coverage_text() -> str:
    with open(os.path.join(_ROOT, "COVERAGE.md")) as fh:
        return fh.read()


def test_every_registered_query_is_documented():
    from emr_with_custom_metrics_spark.registry import all_specs

    text = _coverage_text()
    documented = set(re.findall(r"`([a-z0-9_]+)`", text))
    missing = sorted(n for n in all_specs() if n not in documented)
    assert not missing, (
        f"{len(missing)} registered queries missing from COVERAGE.md: "
        f"{missing}"
    )


def test_wave_ledger_arithmetic_reaches_registry_size():
    """Each wave header states a running registry total; the LAST
    stated total must equal the live registry size, and totals must be
    strictly increasing (no 462 -> 469 jumps with unaccounted rows:
    each header's total must be the previous total plus its own +N)."""
    from emr_with_custom_metrics_spark.registry import all_specs

    text = _coverage_text()
    ledger = [
        (int(plus), int(total))
        for plus, total in re.findall(
            r"\((?:driver )?round \d+(?:\s+tail)?, \+(\d+) — registry (\d+)\)",
            text,
        )
    ]
    assert ledger, "no wave ledger headers found in COVERAGE.md"
    for (_, prev_total), (plus, total) in zip(ledger, ledger[1:]):
        assert prev_total + plus == total, (
            f"ledger gap: {prev_total} + {plus} != {total} — a wave "
            "section is missing or a header miscounts"
        )
    assert ledger[-1][1] == len(all_specs()), (
        f"COVERAGE.md ledger ends at {ledger[-1][1]} but the registry "
        f"holds {len(all_specs())} queries — document the new wave"
    )
