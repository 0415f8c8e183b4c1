"""One-off gate for the round-13 ADVICE fixes: prove the restructured
oracle texts answer byte-identically to the pre-fix texts (HEAD) on the
real tables at sf0.001 and sf0.01, per fix class:

* timeseries_ar_order_fit  — identical frames (pick restructure is a
  pure re-expression; the DuckDB two-capture hazard never fired on
  these tables, so old == new here proves no accidental change)
* stats_cochran_q          — identical frames (sc2 double-accum exact
  at these scales)
* events_interevent_burstiness — identical frames (clamp inactive)
* stats_ljung_box_resid    — identical modulo the NEW `degenerate`
  column (no degenerate metric exists at these SFs, so old rows ==
  new rows dropped of the flag)

Usage: python tools/gate_advice_r13.py  (run from repo root)
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = ("events",)


def _load_old(relpath: str, modname: str):
    """Import the HEAD version of a module with register() neutered."""
    src = subprocess.run(
        ["git", "-C", ROOT, "show", f"HEAD:{relpath}"],
        check=True, capture_output=True, text=True,
    ).stdout
    path = f"/tmp/{modname}.py"
    with open(path, "w") as fh:
        fh.write(src)
    import emr_with_custom_metrics_spark.registry as reg

    real = reg.register
    reg.register = lambda name, oracle=None, doc="": (lambda fn: fn)
    try:
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        reg.register = real
    return mod


def _run(con, sql: str) -> pd.DataFrame:
    df = con.sql(sql).df()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def main() -> None:
    from emr_with_custom_metrics_spark.operators import wave13a, wave13c, wave13d
    from emr_with_custom_metrics_spark.operators.wave11a import (
        _KW_CRIT,
        chi2_lookup_guard,
    )

    old13c = _load_old(
        "emr_with_custom_metrics_spark/operators/wave13c.py", "old_wave13c"
    )
    old13a = _load_old(
        "emr_with_custom_metrics_spark/operators/wave13a.py", "old_wave13a"
    )
    old13d = _load_old(
        "emr_with_custom_metrics_spark/operators/wave13d.py", "old_wave13d"
    )

    pairs = {
        "timeseries_ar_order_fit": (
            old13c._arfit_sql("duck"), wave13c._arfit_sql("duck"), None
        ),
        "stats_cochran_q": (
            old13d._COCHRAN_TMPL.format(
                crit=_KW_CRIT, guard=chi2_lookup_guard("duck")
            ),
            wave13d._COCHRAN_TMPL.format(
                crit=_KW_CRIT, guard=chi2_lookup_guard("duck")
            ),
            None,
        ),
        "events_interevent_burstiness": (
            old13d._BURSTY_TMPL.format(
                epoch_us="epoch_us(ts)", us_prev_expr="(us - pus) // 1000000"
            ),
            wave13d._BURSTY_TMPL.format(
                epoch_us="epoch_us(ts)", us_prev_expr="(us - pus) // 1000000"
            ),
            None,
        ),
        "stats_ljung_box_resid": (
            old13a._LB_DUCK, wave13a._LB_DUCK, "degenerate"
        ),
    }

    bad = 0
    for sf in ("sf0.001", "sf0.01"):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/{sf}/{t}.parquet')"
            )
        for name, (old_sql, new_sql, extra) in pairs.items():
            o = _run(con, old_sql)
            n = _run(con, new_sql)
            if extra is not None:
                assert extra in n.columns, (name, "missing new column")
                flagged = int(n[extra].sum())
                n = n.drop(columns=[extra])
                note = f" (+{extra}, {flagged} flagged)"
            else:
                note = ""
            same = list(o.columns) == list(n.columns) and o.equals(n)
            print(f"{sf} {name}: {'IDENTICAL' if same else 'DIFFER'}"
                  f" ({len(o)} vs {len(n)} rows){note}")
            if not same:
                bad += 1
                print(o.head(10))
                print(n.head(10))
        con.close()
    if bad:
        raise SystemExit(f"{bad} mismatches")
    print("gate: all byte-identical")


if __name__ == "__main__":
    main()
