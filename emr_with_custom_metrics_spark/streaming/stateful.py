"""Arbitrary stateful streaming via applyInPandasWithState.

The reference's only state is the CloudWatch-held alarm cooldown (op R5,
SURVEY.md §2A "R5"); everything else stateful was out of reach of its
cron+bash design. Here the engine exposes Spark's checkpointed state store
through ``applyInPandasWithState`` (Spark ≥3.4) — per-key state that
survives across micro-batches and restarts, partitioned by key across the
cluster (each executor holds only its keys' state: the 100 TB shape).

Two canonical operators:
* running per-key counters/sums (monitoring aggregates without windows),
* cooldown suppression keyed by rule — the distributed version of the
  driver-side dict in streaming/pipeline.CooldownSink.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUTPUT_SCHEMA = "event_type string, n_events bigint, sum_value double"
RUNNING_STATE_SCHEMA = "n bigint, s double"


def running_totals_by_type(events: DataFrame) -> DataFrame:
    """Cumulative (count, sum) per event_type, emitted once per micro-batch.
    State is two scalars per key — constant memory regardless of stream
    length."""
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COOLDOWN_OUTPUT_SCHEMA = "rule string, bucket_start bigint, avg_value double"
COOLDOWN_STATE_SCHEMA = "last_fire bigint"


def cooldown_fires(alarms: DataFrame, cooldown_seconds: int = 300) -> DataFrame:
    """R5 as distributed state: per rule, emit an alarm bucket only if it is
    beyond the cooldown horizon of the previously fired bucket. The state is
    one BIGINT per rule key, held in the checkpointed state store."""
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (last,) = state.get if state.exists else (-(10**18),)
        fired_rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for _, row in batch.sort_values("bucket_start").iterrows():
            t = int(row["bucket_start"])
            if t > last + cooldown_seconds:
                last = t
                fired_rows.append(row)
        state.update((last,))
        if fired_rows:
            out = pd.DataFrame(fired_rows)
            yield out[["rule", "bucket_start", "avg_value"]]

    return alarms.groupBy("rule").applyInPandasWithState(
        update,
        outputStructType=COOLDOWN_OUTPUT_SCHEMA,
        stateStructType=COOLDOWN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUTPUT_SCHEMA = "doc_key string, doc_id bigint, n_seen bigint"
DEDUP_STATE_SCHEMA = "first_doc_id bigint, n bigint"


def seen_keys_dedup(documents: DataFrame, key_col: str = "doc_key") -> DataFrame:
    """Continuous ingest-dedup ([EXT], the streaming face of dedup_exact):
    per content key, pass through ONLY the first-ever occurrence across all
    micro-batches; later copies bump a per-key counter in the checkpointed
    state store. State is two BIGINTs per distinct key, partitioned across
    the cluster by key hash — the bounded-state shape for dedup-at-ingest
    on an unbounded stream (pair with a TTL/eviction policy when the key
    space itself is unbounded).

    NOTE on API choice: Spark 4's ``transformWithStateInPandas`` is the
    successor API (native TTL per value, timers, multiple state variables)
    but its Python runner needs a working ``google.protobuf`` which this
    container lacks (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION
    ImportError) — so this uses ``applyInPandasWithState``, which runs
    everywhere Spark ≥3.4 does. The tests document the gap.
    """
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            first_id, n = state.get
            state.update((int(first_id), int(n) + len(batch)))
            return  # duplicate key: swallow, count
        first = batch.sort_values("doc_id").iloc[0]
        state.update((int(first["doc_id"]), len(batch)))
        yield pd.DataFrame(
            {
                "doc_key": [key[0]],
                "doc_id": [int(first["doc_id"])],
                "n_seen": [len(batch)],
            }
        )

    return documents.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWS_OUTPUT_SCHEMA = "event_type string, n_events bigint, sum_value double"


def running_totals_tws(events: DataFrame) -> DataFrame:
    """The same cumulative per-key totals as ``running_totals_by_type``, on
    Spark 4's transformWithStateInPandas — the successor API to
    applyInPandasWithState (SPARK-49564): named state variables on an
    explicit handle (composable ValueState/ListState/MapState instead of
    one monolithic state row), timers, and TTL. Requires the RocksDB state
    store provider (the only backend the operator supports — which is also
    the right backend at 100 TB: state lives on executor local disk with
    changelog checkpointing, not on the JVM heap). Equivalence with the
    applyInPandasWithState formulation is asserted in
    tests/test_scale_utilities.py — environment-gated: the API's
    Python<->JVM state protocol needs the protobuf package, absent in this
    container, so the test documents the skip the way the JDBC surface
    does."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            got = self._totals.get()
            n, s = (int(got[0]), float(got[1])) if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
