#!/usr/bin/env python
"""Driver simulation: replay the external driver's correctness pass locally.

Walks ``__spark_entry__.queries()`` in driver order under a VANILLA
``local[4]`` session (non-UTC tz, no engine confs — mirrors the real
driver), runs each query at sf0.01 plus its DuckDB oracle, and prints a
per-query timing + match line so the round's ~50-query budget cut line can
be predicted before the official run.

Usage:  python tests/driver_sim.py [first_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    t_start = time.perf_counter()
    cum = 0.0
    n_green = n_red = 0
    for i, (name, fn) in enumerate(qs.items()):
        if i >= first_n:
            break
        t0 = time.perf_counter()
        status = "?"
        try:
            sp = fn(spark, SF_DIR).toPandas()
            if name in osql:
                od = con.sql(osql[name]).df()
                from tests.compare import assert_frames_match

                try:
                    assert_frames_match(sp, od, name)
                    status = "green"
                    n_green += 1
                except AssertionError as exc:
                    status = f"RED: {str(exc)[:120]}"
                    n_red += 1
            else:
                status = f"rows_only({len(sp)})"
                n_green += 1
        except Exception as exc:  # noqa: BLE001 - report, keep walking
            status = f"ERROR: {str(exc)[:120]}"
            n_red += 1
        dt = time.perf_counter() - t0
        cum = time.perf_counter() - t_start
        print(f"{i + 1:4d} {cum:7.1f}s {dt:6.2f}s {name:35s} {status}", flush=True)

    print(f"\ntotal {cum:.1f}s  green={n_green} red={n_red}")
    spark.stop()


if __name__ == "__main__":
    main()
