"""Differential fuzzing: random predicate/aggregate expressions evaluated by
BOTH engines over the same parquet — catches semantic drift the hand-written
queries never exercise (operator precedence, null handling, string collation,
numeric comparison edges)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
STR_VALS = ["F", "O", "P", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", ""]
NUM_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicates(draw) -> str:
    """A random SQL predicate valid in both Spark SQL and DuckDB."""

    def atom():
        if draw(st.booleans()):
            col = draw(st.sampled_from(NUM_COLS))
            op = draw(st.sampled_from(NUM_OPS))
            val = draw(
                st.one_of(
                    st.integers(min_value=-10, max_value=200_000),
                    st.floats(
                        min_value=-1e5, max_value=3e5, allow_nan=False, allow_infinity=False
                    ).map(lambda x: round(x, 2)),
                )
            )
            return f"({col} {op} {val})"
        col = draw(st.sampled_from(STR_COLS))
        if draw(st.booleans()):
            op = draw(st.sampled_from(["=", "<>", "<", ">"]))
            return f"({col} {op} '{draw(st.sampled_from(STR_VALS))}')"
        vals = draw(st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3))
        quoted = ", ".join(f"'{v}'" for v in vals)
        return f"({col} IN ({quoted}))"

    expr = atom()
    for _ in range(draw(st.integers(min_value=0, max_value=3))):
        conj = draw(st.sampled_from(["AND", "OR"]))
        rhs = atom()
        if draw(st.booleans()):
            rhs = f"(NOT {rhs})"
        expr = f"({expr} {conj} {rhs})"
    return expr


@pytest.fixture(scope="module")
def orders_view(spark):
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(spark, SF_DIR, ("orders",))
    return spark


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_random_predicate_counts_match(orders_view, duck, pred):
    spark_n = orders_view.sql(f"SELECT COUNT(*) AS n FROM orders WHERE {pred}").collect()[0]["n"]
    duck_n = duck.sql(f"SELECT COUNT(*) AS n FROM orders WHERE {pred}").df()["n"][0]
    assert spark_n == duck_n, pred


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(["JOIN", "LEFT JOIN"]),
    pred=predicates(),
    group=st.sampled_from(["c_mktsegment", "c_nationkey"]),
)
def test_random_join_aggregates_match(orders_view, duck, how, pred, group):
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(orders_view, SF_DIR, ("orders", "customer"))
    duck.execute(
        "CREATE OR REPLACE VIEW customer AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/customer.parquet')"
    )
    q = (
        f"SELECT {group} AS g, COUNT(o_orderkey) AS n, "
        f"ROUND(SUM(o_totalprice), 2) AS s "
        f"FROM customer {how} (SELECT * FROM orders WHERE {pred}) o "
        f"ON c_custkey = o.o_custkey GROUP BY {group}"
    )
    sp = {r["g"]: (r["n"], r["s"]) for r in orders_view.sql(q).collect()}
    dk = {row.g: (row.n, row.s) for row in duck.sql(q).df().itertuples()}
    assert set(sp) == set(dk), q
    for g, (n, s) in sp.items():
        dn, ds = dk[g]
        ds = None if ds != ds else ds  # pandas NaN ← SQL NULL
        assert n == dn, (q, g)
        assert (s is None and ds is None) or abs(s - ds) < 1e-6, (q, g, s, ds)


@st.composite
def scalar_exprs(draw) -> str:
    """A random scalar expression over customer columns, valid and
    semantics-identical in Spark SQL and DuckDB."""
    kind = draw(st.sampled_from(["string", "math", "date"]))
    if kind == "string":
        base = draw(st.sampled_from(["c_name", "c_mktsegment"]))
        expr = base
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            op = draw(st.sampled_from(["upper", "lower", "reverse", "trim", "substr", "concat"]))
            if op == "substr":
                start = draw(st.integers(min_value=1, max_value=8))
                ln = draw(st.integers(min_value=1, max_value=10))
                expr = f"SUBSTRING({expr}, {start}, {ln})"
            elif op == "concat":
                expr = f"CONCAT({expr}, '#', {base})"
            else:
                expr = f"{op.upper()}({expr})"
        return expr
    if kind == "math":
        base = draw(st.sampled_from(["c_acctbal", "c_custkey", "c_nationkey"]))
        expr = base
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            op = draw(st.sampled_from(["abs", "round2", "plus", "times", "floorv", "ceilv"]))
            if op == "round2":
                expr = f"ROUND({expr}, 2)"
            elif op == "plus":
                expr = f"({expr} + {draw(st.integers(min_value=-100, max_value=100))})"
            elif op == "times":
                expr = f"({expr} * {draw(st.integers(min_value=-5, max_value=5))})"
            elif op == "floorv":
                expr = f"FLOOR({expr})"
            elif op == "ceilv":
                expr = f"CEIL({expr})"
            else:
                expr = f"ABS({expr})"
        # integer results can overflow differently; clamp into double space
        return f"CAST({expr} AS DOUBLE)"
    # date: orders not in this view — derive dates from keys deterministically
    n = draw(st.integers(min_value=0, max_value=20000))
    part = draw(st.sampled_from(["YEAR", "MONTH", "DAY"]))
    return f"CAST({part}(DATE '1995-01-01' + INTERVAL {n} DAY) AS INTEGER)"


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=scalar_exprs())
def test_random_scalar_expressions_match(orders_view, duck, expr):
    q = f"SELECT c_custkey AS k, {expr} AS e FROM customer WHERE c_custkey <= 50"
    import math

    duck.execute(
        "CREATE OR REPLACE VIEW customer AS "
        "SELECT * FROM read_parquet('/root/testdata/sf0.01/customer.parquet')"
    )
    orders_view.sql(
        "SELECT 1"
    )  # session alive
    from emr_with_custom_metrics_spark.catalog import register_views

    register_views(orders_view, SF_DIR, ("customer",))
    sp = {r["k"]: r["e"] for r in orders_view.sql(q).collect()}
    dk = {row.k: row.e for row in duck.sql(q).df().itertuples()}
    assert set(sp) == set(dk)
    for k, v in sp.items():
        w = dk[k]
        if isinstance(v, float) or isinstance(w, float):
            assert (v is None and w is None) or math.isclose(v, w, rel_tol=1e-9, abs_tol=1e-9), (
                q, k, v, w,
            )
        else:
            assert v == w, (q, k, v, w)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    part=st.sampled_from(STR_COLS),
    fn=st.sampled_from(["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "NTILE(3)"]),
    direction=st.sampled_from(["ASC", "DESC"]),
    pred=predicates(),
)
def test_random_window_functions_match(orders_view, duck, part, fn, direction, pred):
    q = (
        f"SELECT o_orderkey AS k, CAST({fn} OVER ("
        f"PARTITION BY {part} ORDER BY o_totalprice {direction}, o_orderkey) AS BIGINT) AS r "
        f"FROM orders WHERE {pred}"
    )
    sp = {r["k"]: r["r"] for r in orders_view.sql(q).collect()}
    dk = {row.k: row.r for row in duck.sql(q).df().itertuples()}
    assert sp == dk, q


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicates(),
    group=st.sampled_from(STR_COLS),
    agg_col=st.sampled_from(["o_totalprice", "o_orderkey"]),
)
def test_random_grouped_aggregates_match(orders_view, duck, pred, group, agg_col):
    q = (
        f"SELECT {group} AS g, COUNT(*) AS n, "
        f"ROUND(SUM({agg_col}), 2) AS s, "
        f"ROUND(MIN({agg_col}), 2) AS lo, ROUND(MAX({agg_col}), 2) AS hi "
        f"FROM orders WHERE {pred} GROUP BY {group}"
    )
    sp = {r["g"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in orders_view.sql(q).collect()}
    dk = {
        row.g: (row.n, row.s, row.lo, row.hi)
        for row in duck.sql(q).df().itertuples()
    }
    assert set(sp) == set(dk), q
    for g, (n, s, lo, hi) in sp.items():
        dn, ds, dlo, dhi = dk[g]
        assert n == dn, (q, g)
        for a, b in ((s, ds), (lo, dlo), (hi, dhi)):
            assert (a is None and b is None) or abs(a - b) < 1e-6, (q, g, a, b)


@st.composite
def window_exprs(draw) -> str:
    """A random window function call, semantics-identical in both engines:
    deterministic because ordering is by the UNIQUE o_orderkey."""
    part = draw(st.sampled_from(["o_orderstatus", "o_orderpriority", ""]))
    over = (
        f"OVER (PARTITION BY {part} ORDER BY o_orderkey)"
        if part
        else "OVER (ORDER BY o_orderkey)"
    )
    kind = draw(st.sampled_from(["rank", "offset", "frame"]))
    if kind == "rank":
        fn = draw(st.sampled_from(["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "NTILE(4)"]))
        return f"CAST({fn} {over} AS DOUBLE)"
    if kind == "offset":
        fn = draw(st.sampled_from(["LAG", "LEAD"]))
        off = draw(st.integers(min_value=1, max_value=3))
        return f"{fn}(o_totalprice, {off}) {over}"
    lo = draw(st.integers(min_value=0, max_value=5))
    agg = draw(st.sampled_from(["SUM", "MIN", "MAX", "COUNT"]))
    frame = f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW"
    if part:
        over_f = f"OVER (PARTITION BY {part} ORDER BY o_orderkey {frame})"
    else:
        over_f = f"OVER (ORDER BY o_orderkey {frame})"
    return f"CAST({agg}(o_totalprice) {over_f} AS DOUBLE)"


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wexpr=window_exprs())
def test_random_window_functions_match(orders_view, duck, wexpr):
    """Checksum the window column per status group: any drift in frame
    semantics, null handling at partition edges, or tie-breaking shows up
    as a checksum mismatch (ordering key is unique → deterministic)."""
    q = (
        "SELECT o_orderstatus AS g, SUM(w) AS cs, COUNT(w) AS n FROM ("
        f"  SELECT o_orderstatus, {wexpr} AS w FROM orders WHERE o_orderkey < 8000"
        ") GROUP BY o_orderstatus"
    )
    sp = {r["g"]: (r["cs"], r["n"]) for r in orders_view.sql(q).collect()}
    dk = {row.g: (row.cs, row.n) for row in duck.sql(q).df().itertuples()}
    assert set(sp) == set(dk), q
    for g, (cs, n) in sp.items():
        dcs, dn = dk[g]
        assert n == dn, (q, g, n, dn)
        # relative tolerance: the checksum sums thousands of ~1e5-magnitude
        # doubles, so engines legitimately differ by summation order — an
        # exact (or SQL-rounded) compare flips on .5 ULP boundaries.
        tol = 1e-9 * max(1.0, abs(cs or 0.0), abs(dcs or 0.0))
        assert (cs is None and dcs is None) or abs(cs - dcs) <= tol, (q, g, cs, dcs)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
    ),
    pred_a=predicates(),
    pred_b=predicates(),
)
def test_random_set_operations_match(orders_view, duck, op, pred_a, pred_b):
    """Set-op semantics diffed against DuckDB: bag vs set variants, NULL
    equality (set ops treat NULLs as equal — unlike predicates), and
    duplicate multiplicity under ALL. Projection keeps a few columns so
    row identity is non-trivial but hashable.

    Fuzzer-found dialect trap (kept out of the projection on purpose):
    CAST(double AS INT) TRUNCATES in Spark but ROUNDS-to-nearest in
    DuckDB — 123.9 becomes 123 vs 124, changing row identity. FLOOR is
    identical in both; any oracled query casting a fractional double to
    an integer type must floor/round explicitly first."""
    proj = "o_orderstatus, o_orderpriority, CAST(FLOOR(o_totalprice) AS BIGINT) AS p"
    q = (
        f"SELECT COUNT(*) AS n, COALESCE(SUM(p), 0) AS s FROM ("
        f"SELECT {proj} FROM orders WHERE {pred_a} "
        f"{op} "
        f"SELECT {proj} FROM orders WHERE {pred_b}) t"
    )
    sp = orders_view.sql(q).collect()[0]
    row = duck.sql(q).df()
    assert sp["n"] == row["n"][0], (q, sp["n"], row["n"][0])
    assert int(sp["s"]) == int(row["s"][0]), (q, sp["s"], row["s"][0])


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    combo=st.sampled_from(
        [
            "GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
            "GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))",
            "ROLLUP (o_orderstatus, o_orderpriority)",
            "CUBE (o_orderstatus, o_orderpriority)",
        ]
    ),
    pred=predicates(),
)
def test_random_grouping_sets_match(orders_view, duck, combo, pred):
    """Grouping-set semantics diffed against DuckDB: super-aggregate NULL
    markers, GROUPING() bit values, and per-set counts must agree for
    random predicates × set shapes.

    Fuzzer-found divergence (excluded below, documented here): on an
    EMPTY input, DuckDB emits the global () grouping-set row (COUNT=0)
    per the SQL standard; Spark emits no rows at all. Any oracled
    grouping-sets/ROLLUP/CUBE query whose WHERE can empty out would
    hash-mismatch — keep such filters out of oracled super-aggregates."""
    from hypothesis import assume

    n_in = duck.sql(f"SELECT COUNT(*) AS n FROM orders WHERE {pred}").df()["n"][0]
    assume(n_in > 0)
    q = (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(GROUPING(o_orderstatus) AS INT) AS g1, "
        "CAST(GROUPING(o_orderpriority) AS INT) AS g2, "
        "COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s "
        f"FROM orders WHERE {pred} GROUP BY {combo}"
    )
    sp = {
        (r["o_orderstatus"], r["o_orderpriority"], r["g1"], r["g2"]): (r["n"], r["s"])
        for r in orders_view.sql(q).collect()
    }
    dk = {
        (row.o_orderstatus if row.o_orderstatus == row.o_orderstatus else None,
         row.o_orderpriority if row.o_orderpriority == row.o_orderpriority else None,
         row.g1, row.g2): (row.n, row.s)
        for row in duck.sql(q).df().itertuples()
    }
    assert set(sp) == set(dk), (q, set(sp) ^ set(dk))
    for k, (n, s) in sp.items():
        dn, ds = dk[k]
        assert n == dn, (q, k)
        assert (s is None and ds is None) or abs(s - ds) < 1e-6, (q, k, s, ds)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_type=st.sampled_from(["view", "click", "signup"]),
    right_type=st.sampled_from(["purchase", "error"]),
    pred=predicates(),
)
def test_random_asof_joins_match_duckdb_native(orders_view, duck, left_type, right_type, pred):
    """The union+window as-of operator diffed against DuckDB's NATIVE
    ASOF LEFT JOIN over random event-type splits (predicates randomize the
    left side's density). Ties and no-earlier-row NULLs must agree."""
    from pyspark.sql import functions as F

    from emr_with_custom_metrics_spark.catalog import load_table, register_views
    from emr_with_custom_metrics_spark.operators.asof import asof_join

    register_views(orders_view, SF_DIR, ("events",))
    duck.execute(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    ev = load_table(orders_view, SF_DIR, "events")
    left = ev.where(F.col("event_type") == left_type).select(
        "user_id", "ts", "event_id"
    )
    right = ev.where(F.col("event_type") == right_type).select(
        "user_id", "ts", F.col("value").alias("r_value")
    )
    got = {
        (r["event_id"], None if r["r_value"] is None else round(r["r_value"], 6))
        for r in asof_join(left, right, key="user_id", ts="ts",
                           right_value_cols=["r_value"]).collect()
    }
    q = f"""
        WITH l AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = '{left_type}'),
             r AS (SELECT user_id, ts, value AS r_value FROM events
                   WHERE event_type = '{right_type}')
        SELECT l.event_id, ROUND(r.r_value, 6) AS r_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """
    import math
    want = {
        (row.event_id, None if (isinstance(row.r_value, float) and math.isnan(row.r_value)) else round(row.r_value, 6))
        for row in duck.sql(q).df().itertuples()
    }
    assert got == want, (left_type, right_type, len(got ^ want), list(got ^ want)[:5])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    q10=st.integers(min_value=0, max_value=10),
    group=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    pred=predicates(),
)
def test_random_exact_percentiles_match(orders_view, duck, q10, group, pred):
    """Exact percentile interpolation diffed against QUANTILE_CONT for
    random quantiles/groups/predicates — both engines implement linear
    interpolation on the sorted sample; boundary quantiles (0, 1) and
    single-row groups are the edge cases worth fuzzing."""
    qv = q10 / 10.0
    q = (
        f"SELECT {group} AS g, COUNT(*) AS n, "
        f"ROUND(PERCENTILE_CONT({qv}) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p "
        f"FROM orders WHERE {pred} GROUP BY {group}"
    )
    sp = {r["g"]: (r["n"], r["p"]) for r in orders_view.sql(q).collect()}
    dk = {row.g: (row.n, row.p) for row in duck.sql(q).df().itertuples()}
    assert set(sp) == set(dk), q
    for g, (n, p) in sp.items():
        dn, dp = dk[g]
        assert n == dn, (q, g)
        tol = 1e-6 * max(1.0, abs(p or 0.0))
        assert (p is None and dp is None) or abs(p - dp) <= tol, (q, g, p, dp)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gap_min=st.integers(min_value=1, max_value=120),
    etype=st.sampled_from(["view", "click", "purchase", "error", "signup"]),
)
def test_random_session_windows_match_lag_emulation(orders_view, duck, gap_min, etype):
    """session_window(gap) diffed against the portable lag/cumsum
    emulation at random gaps: a new session starts when the time since
    the previous event is >= gap (Spark's session extends to last+gap,
    boundary EXCLUSIVE — the fuzzer pins that semantic)."""
    from pyspark.sql import functions as F

    from emr_with_custom_metrics_spark.catalog import load_table, register_views

    register_views(orders_view, SF_DIR, ("events",))
    duck.execute(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    ev = load_table(orders_view, SF_DIR, "events").where(F.col("event_type") == etype)
    got = {
        (r["user_id"], r["session_start"]): r["n"]
        for r in ev.groupBy(
            F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .select("user_id", F.unix_timestamp("w.start").alias("session_start"), "n")
        .collect()
    }
    q = f"""
        WITH t AS (
            SELECT user_id, ts,
                   CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= {gap_min * 60}
                        OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM events WHERE event_type = '{etype}'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM t
        )
        SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS n
        FROM s GROUP BY user_id, sid
    """
    want = {
        (row.user_id, row.session_start): row.n for row in duck.sql(q).df().itertuples()
    }
    assert got == want, (gap_min, etype, len(set(got) ^ set(want)),
                         list(set(got) ^ set(want))[:5])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1))
def test_ewma_fold_matches_pandas_ewm(spark, seed):
    """The HOF-fold EWMA (timeseries_ewma's kernel) against pandas'
    independent ewm(adjust=False) implementation on random series — a
    third engine agreeing pins the recurrence semantics, not just the
    Spark/DuckDB pair's shared template."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    vals = rng.uniform(-100, 100, n).round(4).tolist()
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    got = (
        df.agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("pts"))
        .select(
            F.expr(
                """aggregate(transform(pts, s -> s.v), CAST(NULL AS DOUBLE),
                             (acc, x) -> CASE WHEN acc IS NULL THEN x
                                         ELSE CAST(0.3 AS DOUBLE) * x
                                            + CAST(0.7 AS DOUBLE) * acc END)"""
            ).alias("ewma")
        )
        .collect()[0]["ewma"]
    )
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert abs(got - want) < 1e-9 * max(1.0, abs(want))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1))
def test_geo_grid_join_complete_on_random_points(spark, seed):
    """The 3x3-neighborhood grid join loses no within-radius pair for ANY
    point configuration — random points, brute force as ground truth
    (generalizes the fixed-table equality test in test_llm_quality)."""
    import numpy as np
    from pyspark.sql import functions as F

    from emr_with_custom_metrics_spark.operators.geo import CELL_DEG

    rng = np.random.default_rng(seed)
    na, nb = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    pa = [(int(i), float(rng.uniform(-60, 60)), float(rng.uniform(-120, 120)))
          for i in range(na)]
    pb = [(int(i), float(rng.uniform(-60, 60)), float(rng.uniform(-120, 120)))
          for i in range(nb)]
    A = spark.createDataFrame(pa, "aid int, lat double, lon double")
    B = spark.createDataFrame(pb, "bid int, s_lat double, s_lon double")
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")) * (F.col("lon") - F.col("s_lon"))
    B9 = (
        B.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select("bid", "s_lat", "s_lon",
                (F.floor(F.col("s_lat") / CELL_DEG) + F.col("dx")).alias("cx"),
                (F.floor(F.col("s_lon") / CELL_DEG) + F.col("dy")).alias("cy"))
    )
    Ac = A.withColumn("cx", F.floor(F.col("lat") / CELL_DEG)).withColumn(
        "cy", F.floor(F.col("lon") / CELL_DEG))
    grid = {
        (r["aid"], r["bid"])
        for r in Ac.join(B9, ["cx", "cy"]).withColumn("d2", d2)
        .where(F.col("d2") <= CELL_DEG * CELL_DEG).select("aid", "bid")
        .distinct().collect()
    }
    brute = {
        (r["aid"], r["bid"])
        for r in A.crossJoin(B).withColumn("d2", d2)
        .where(F.col("d2") <= CELL_DEG * CELL_DEG).select("aid", "bid").collect()
    }
    assert grid == brute


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1))
def test_substring_spans_match_bruteforce(spark, seed):
    """The windowed-hash span dedup (dedup_substring_spans' pipeline) vs a
    direct Python brute force on random small corpora with planted shared
    phrases — an independent third implementation pinning the window,
    duplicate, and interval-merge semantics (k=3 to make collisions
    likely at toy scale)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k = 3
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]
    phrase = [rng.choice(vocab) for _ in range(4)]
    docs = []
    for i in range(rng.randint(3, 8)):
        toks = [rng.choice(vocab) for _ in range(rng.randint(k, 15))]
        if rng.random() < 0.6:  # plant the shared phrase in most docs
            p = rng.randint(0, len(toks))
            toks = toks[:p] + phrase + toks[p:]
        docs.append((i, toks))

    # brute force: window multiset, dup windows, merged coverage per doc
    from collections import Counter

    cnt = Counter()
    for _, toks in docs:
        for s in range(len(toks) - k + 1):
            cnt[tuple(toks[s : s + k])] += 1
    want = {}
    for i, toks in docs:
        pos = [s for s in range(len(toks) - k + 1)
               if cnt[tuple(toks[s : s + k])] > 1]
        spans, covered = 0, 0
        prev_end = None
        for s in pos:
            if prev_end is None or s > prev_end + 1:
                spans += 1
                covered += k
                prev_end = s + k - 1
            else:
                covered += (s + k - 1) - prev_end
                prev_end = s + k - 1
        want[i] = (len(toks), spans, covered)

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
    )
    toks = F.split("text", " ")
    wins = F.expr(
        f"transform(sequence(0, size(split(text, ' ')) - {k}), "
        f"i -> struct(i AS pos, md5(concat_ws(' ', slice(split(text, ' '), i + 1, {k}))) AS h))"
    )
    w = (
        df.where(F.size(toks) >= k)
        .select("doc_id", F.explode(wins).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )
    dup = (
        w.withColumn("cnt", F.count("*").over(Window.partitionBy("h")))
        .where(F.col("cnt") > 1)
        .select("doc_id", "pos")
    )
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    lag_pos = F.lag("pos").over(by_doc)
    sp = dup.withColumn(
        "brk", F.when(lag_pos.isNull() | (F.col("pos") > lag_pos + k), 1).otherwise(0)
    ).withColumn("grp", F.sum("brk").over(by_doc))
    spans = sp.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + k - 1).alias("e")
    )
    got_rows = (
        spans.groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"),
             F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"))
        .collect()
    )
    got = {r["doc_id"]: (r["n_spans"], r["dup_tokens"]) for r in got_rows}
    for i, (n_toks, spans_want, covered_want) in want.items():
        assert got.get(i, (0, 0)) == (spans_want, covered_want), (
            seed, i, docs[i], got.get(i), (spans_want, covered_want))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 2**31 - 1))
def test_rolling_median_matches_pandas(spark, seed):
    """The sorted-frame rolling median (window_rolling_median's kernel) vs
    pandas rolling(11, min_periods=1).median() on random series."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 80))
    vals = rng.uniform(-50, 50, n).round(3).tolist()
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    w = Window.orderBy("i").rowsBetween(-10, 0)
    frame = F.array_sort(F.collect_list("v").over(w))
    sz = F.size(frame)
    mid_hi = F.element_at(frame, (sz / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, ((sz + 1) / 2).cast("int"))
    got = [
        r["m"]
        for r in df.select("i", ((mid_lo + mid_hi) / 2.0).alias("m"))
        .orderBy("i")
        .collect()
    ]
    want = pd.Series(vals).rolling(11, min_periods=1).median().tolist()
    assert np.allclose(got, want), (seed, n)
