"""The local mirror of the driver's t2 gate: every registered query with an
oracle must hash-match DuckDB at sf0.01; rows-only queries must at least
run and return a stable schema."""

from __future__ import annotations

import pytest

from emr_with_custom_metrics_spark import registry
from tests.conftest import SF_DIR

SPECS = registry.all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    from tests.compare import assert_frames_match

    spec = SPECS[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    oracle_pdf = duck.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
