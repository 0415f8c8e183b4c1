"""Cross-query staged-relation bookkeeping.

Some relations are pure deterministic functions of (sf_dir, params) and
feed MANY registered queries in one process: llm/dedup's pair sets (the
cosine GEMM / shingle-Jaccard joins) and the Welch |z|/p-value relation
the multiple-testing family shares (operators/wave9c). Each is built
eagerly ONCE per (session, sf_dir), and two facts are recorded here so
bench.py can keep per-row times leg-comparable (r12 VERDICT item 3):

* ``BUILD_SECS[(kind, param)]`` — cumulative wall-clock spent
  MATERIALIZING each staged relation; bench.py subtracts any build that
  occurred inside a timed run and reports the total as its own
  ``pair_memo`` record line.
* ``RIDERS`` — registered queries that CONSUMED a staged relation,
  recorded at plan-construction time via ``registry.current_query()``
  so the transparency manifest is derived from actual calls, never a
  hand-maintained list (r10/r11 VERDICT).
"""

from __future__ import annotations

import time

BUILD_SECS: dict[tuple[str, float], float] = {}
RIDERS: set[str] = set()


def note_rider() -> None:
    from emr_with_custom_metrics_spark import registry

    q = registry.current_query()
    if q is not None:
        RIDERS.add(q)


class timed_build:
    """Context manager: add the block's wall-clock to BUILD_SECS[key]."""

    def __init__(self, kind: str, param: float) -> None:
        self.key = (kind, float(param))

    def __enter__(self) -> "timed_build":
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        BUILD_SECS[self.key] = BUILD_SECS.get(self.key, 0.0) + (
            time.perf_counter() - self.t0
        )
