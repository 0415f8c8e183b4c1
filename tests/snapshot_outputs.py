"""Snapshot every registered query's output at sf0.01 to a pickle dir.

Used by the round-8 ROUND-on-double sweep to machine-verify that the
integer-domain rewrite preserves output values exactly (queries whose
values change need fresh driver rows; queries whose values are identical
keep their existing CORRECTNESS ledger rows as valid evidence).

Usage: python tests/snapshot_outputs.py OUTDIR [name ...]
"""

from __future__ import annotations

import os
import pickle
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("snapshot-outputs")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    t_all = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}.pkl")
        if os.path.exists(path):
            continue
        t0 = time.perf_counter()
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            with open(path, "wb") as fh:
                pickle.dump(pdf, fh)
            print(f"{name}: {len(pdf)} rows [{time.perf_counter() - t0:.2f}s]",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            with open(path + ".err", "w") as fh:
                fh.write(repr(exc))
            print(f"{name}: ERROR {exc!r}", flush=True)
    print(f"TOTAL {time.perf_counter() - t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
