"""Execution-metrics harvest: the engine-side CUSTOM METRICS surface.

The reference system's whole purpose is publishing operational metrics
(scripts/custom-metrics.sh polls a YARN HTTP endpoint and puts
CloudWatch gauges). The engine-side analogue for QUERY work is Spark's
executed-plan metric accumulators — rows scanned, files read, shuffle
bytes, peak memory, AQE coalescing decisions — which every action
already collects for free. This module harvests them after an action
and bridges them onto the same ``MetricPointSink`` publishing path the
M5 reference-parity sink uses, so one publisher receives BOTH the
cluster gauges (reference surface) and per-query execution gauges
(engine surface).

AQE-aware: the walk descends through ``AdaptiveSparkPlan`` into the
FINAL plan and through materialized ``QueryStageExec`` wrappers, so
post-reoptimization metrics (AQEShuffleRead's coalesced partition
counts — the runtime re-plan evidence) are captured, not the initial
static plan.

Complements ``plans/observability.observe_quality`` (DataFrame.observe:
user-defined aggregates riding the plan); this harvests the PHYSICAL
layer Spark maintains on every node regardless.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

# summary keys -> (node metric name, how to combine across nodes)
_SUMMARY = {
    "rows_scanned": ("numOutputRows", "scan_only_sum"),
    "files_read": ("numFiles", "sum"),
    "files_size_bytes": ("filesSize", "sum"),
    "shuffle_bytes_written": ("shuffleBytesWritten", "sum"),
    "shuffle_records_written": ("shuffleRecordsWritten", "sum"),
    "peak_memory_bytes": ("peakMemory", "max"),
    "coalesced_partitions": ("numCoalescedPartitions", "sum"),
}


def _walk(node, depth: int, out: list[dict]) -> None:
    vals: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    out.append({"depth": depth, "node": node.nodeName(), "metrics": vals})
    for i in range(node.children().length()):
        _walk(node.children().apply(i), depth + 1, out)
    if node.nodeName().endswith("QueryStage"):
        # materialized AQE stage: the real subtree hangs off .plan()
        _walk(node.plan(), depth + 1, out)


def collect_execution_metrics(df: DataFrame, run_action: bool = True) -> dict:
    """Execute ``df`` (collect) and harvest every node's metric
    accumulators from the FINAL (post-AQE) physical plan.

    Returns ``{"nodes": [{depth, node, metrics}...], "summary": {...}}``.
    Pass ``run_action=False`` if an action already ran on this exact
    DataFrame (the accumulators persist on its QueryExecution)."""
    if run_action:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()
    nodes: list[dict] = []
    _walk(plan, 0, nodes)

    summary: dict[str, int] = {}
    for key, (metric, mode) in _SUMMARY.items():
        vals = [
            n["metrics"][metric]
            for n in nodes
            if metric in n["metrics"]
            and (mode != "scan_only_sum" or n["node"].startswith("Scan"))
        ]
        if vals:
            summary[key] = max(vals) if mode == "max" else sum(vals)
    summary["output_rows"] = next(
        (
            n["metrics"]["numOutputRows"]
            for n in nodes
            if "numOutputRows" in n["metrics"]
        ),
        0,
    )
    return {"nodes": nodes, "summary": summary}


def to_query_metric_points(
    query_name: str, metrics: dict, ts: str
) -> list[dict[str, Any]]:
    """Bridge the summary onto the M5 metric-point shape (namespace /
    metric / value / dimensions) so ``MetricPointSink.publish`` — the
    reference-parity CloudWatch seam — receives per-query execution
    gauges alongside the cluster gauges."""
    return [
        {
            "namespace": "SparkGraft/QueryExecution",
            "metric": key,
            "value": float(val),
            "ts": ts,
            "dimensions": {"query": query_name},
        }
        for key, val in metrics["summary"].items()
    ]
