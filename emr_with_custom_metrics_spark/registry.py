"""Query registry: the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2 registers here as a named query — a callable
``(spark, sf_dir) -> DataFrame`` — optionally paired with the ANSI-SQL string
DuckDB runs as the correctness oracle (driver contract,
``__spark_entry__.py:22-39``). Ops whose semantics aren't SQL-expressible
(LSH candidate generation, stateful cooldown) register with ``oracle=None``
and get the driver's weaker rows-only check.

Column-name parity rule (driver hashes after sorting columns by name): every
computed/aggregate column is aliased identically in the DataFrame code and
the oracle SQL. Float aggregates are rounded on BOTH sides so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def _pin_utc(fn: QueryFn) -> QueryFn:
    """Run every query with session tz = UTC so event-time functions
    (year/window/unix_timestamp) hash-match the tz-naive DuckDB oracle even
    when the caller's session was built with a local timezone."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=_pin_utc(fn), oracle=oracle, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def QUERIES() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def ORACLES() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import has the side effect)."""
    global _LOADED
    if _LOADED:
        return
    import emr_with_custom_metrics_spark.operators.relational  # noqa: F401
    import emr_with_custom_metrics_spark.operators.extended  # noqa: F401
    import emr_with_custom_metrics_spark.operators.joins  # noqa: F401
    import emr_with_custom_metrics_spark.operators.windows  # noqa: F401
    import emr_with_custom_metrics_spark.operators.setops  # noqa: F401
    import emr_with_custom_metrics_spark.operators.asof  # noqa: F401
    import emr_with_custom_metrics_spark.functions.scalar  # noqa: F401
    import emr_with_custom_metrics_spark.functions.collections  # noqa: F401
    import emr_with_custom_metrics_spark.functions.vector  # noqa: F401
    import emr_with_custom_metrics_spark.sources.reference_pipeline  # noqa: F401
    import emr_with_custom_metrics_spark.streaming.metrics  # noqa: F401
    import emr_with_custom_metrics_spark.llm.text  # noqa: F401
    import emr_with_custom_metrics_spark.llm.dedup  # noqa: F401
    import emr_with_custom_metrics_spark.llm.similarity  # noqa: F401
    import emr_with_custom_metrics_spark.llm.multimodal  # noqa: F401
    _LOADED = True
