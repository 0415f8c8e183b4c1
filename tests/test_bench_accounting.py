"""Round-13 bench-accounting pins (r12 VERDICT items 3 and 6).

* The pair-memo build is eager + self-timed: building a memo entry
  lands its wall-clock in PAIR_MEMO_BUILD_SECS, the source bench.py
  subtracts from the run it occurred in and reports as its own
  `pair_memo` record line.
* The idle gate refuses a leg (exit 3, before any Spark startup) when
  SPARK_GRAFT_REQUIRE_IDLE=1 and load1 exceeds the threshold, and the
  refusal line is parseable JSON naming the gate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pair_memo_build_is_timed(spark):
    from emr_with_custom_metrics_spark.llm.dedup import (
        PAIR_MEMO_BUILD_SECS,
        shingle_jaccard_pairs_cached,
    )

    # a threshold no registered query uses -> guaranteed fresh build
    thr = 0.731
    key = ("jaccard", thr)
    PAIR_MEMO_BUILD_SECS.pop(key, None)
    df = shingle_jaccard_pairs_cached(spark, "/root/testdata/sf0.001", thr)
    assert key in PAIR_MEMO_BUILD_SECS
    assert PAIR_MEMO_BUILD_SECS[key] > 0.0
    # eager build: consuming the frame must not re-enter the build path
    before = PAIR_MEMO_BUILD_SECS[key]
    df.count()
    assert PAIR_MEMO_BUILD_SECS[key] == before
    # second call is a cache hit — no additional build time
    shingle_jaccard_pairs_cached(spark, "/root/testdata/sf0.001", thr)
    assert PAIR_MEMO_BUILD_SECS[key] == before


def test_idle_gate_refuses_loaded_leg():
    """threshold 0.0 makes any live host non-idle; with REQUIRE_IDLE the
    leg must refuse with exit 3 and a JSON line, in well under Spark
    startup time (the gate runs before get_spark)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_REQUIRE_IDLE="1",
        SPARK_GRAFT_IDLE_LOAD1="0.0",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 3, proc.stdout + proc.stderr
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert "idle gate refused" in rec["error"]
    assert rec["idle_gate"]["idle"] is False
