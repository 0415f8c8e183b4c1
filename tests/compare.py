"""Result-set comparison mirroring the driver's correctness gate:
row-count + column names + order-insensitive value equality."""

from __future__ import annotations

import numpy as np
import pandas as pd

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-9


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            # dates / decimals / bytes → canonical string
            df[c] = s.map(lambda v: None if v is None else str(v))
    sort_keys = [df[c].map(lambda v: "" if v is None else str(v)) for c in df.columns]
    order = np.lexsort([k.to_numpy() for k in reversed(sort_keys)])
    return df.iloc[order].reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-strict gate (VERDICT r02 #3): the driver's value-hash does NOT
        # coerce, so an int64 Spark column vs a float64 oracle column (the
        # DuckDB-HUGEINT→pandas-float64 class) hash-mismatches there even when
        # the values are numerically identical. Fail here too.
        int_vs_float = (
            pd.api.types.is_integer_dtype(av) and pd.api.types.is_float_dtype(bv)
        ) or (pd.api.types.is_float_dtype(av) and pd.api.types.is_integer_dtype(bv))
        assert not int_vs_float, (
            f"{name}: column {c} dtype class mismatch spark={av.dtype} vs "
            f"oracle={bv.dtype} — the driver's hash will fail on this even if "
            f"values agree (likely an uncast DuckDB HUGEINT aggregate; add "
            f"CAST(... AS BIGINT) to the oracle or cast the Spark side)"
        )
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype("float64").to_numpy()
            bf = bv.astype("float64").to_numpy()
            ok = np.isclose(af, bf, rtol=FLOAT_RTOL, atol=FLOAT_ATOL, equal_nan=True)
            assert ok.all(), (
                f"{name}: column {c} first float mismatches: "
                f"{[(x, y) for x, y, o in zip(af[:2000], bf[:2000], ok[:2000]) if not o][:5]}"
            )
        else:
            mism = av.fillna("∅") != bv.fillna("∅")
            assert not mism.any(), (
                f"{name}: column {c} mismatches, e.g. "
                f"{list(zip(av[mism][:5], bv[mism][:5]))}"
            )
