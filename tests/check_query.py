"""Check a single registered query against its oracle by name.

Usage: python tests/check_query.py name1 [name2 ...]
Same vanilla non-UTC session and DuckDB comparison as driver_sim.py.
"""

from __future__ import annotations

import os
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: check_query.py name [name ...]")

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("check-query")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failed = False
    for name in names:
        t0 = time.perf_counter()
        sp = qs[name](spark, SF_DIR).toPandas()
        if name in osql:
            od = con.sql(osql[name]).df()
            from tests.compare import assert_frames_match

            try:
                assert_frames_match(sp, od, name)
                status = f"green ({len(sp)} rows)"
            except AssertionError as exc:
                status = f"RED: {exc}"
                failed = True
        else:
            status = f"rows_only({len(sp)})"
        print(f"{name}: {status}  [{time.perf_counter() - t0:.2f}s]", flush=True)

    spark.stop()
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
