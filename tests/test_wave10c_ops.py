"""Behavior tests for wave 10c (Kleinberg burst detection): a
python-side replay of the cost+DP pipeline on the real corpus, plus a
synthetic series with a planted burst that the automaton must segment
exactly — including the hysteresis property (brief dips inside a burst
do not split it) that distinguishes Kleinberg from thresholding.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

from emr_with_custom_metrics_spark.operators.wave10c import (
    _BURST_MULT,
    _GAMMA_E6,
    _viterbi,
)
from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _dp_outputs(y: np.ndarray) -> dict:
    """Independent replay: e6-quantized Poisson costs + integer Viterbi."""
    mu = y.sum() / len(y)
    c0 = [
        int(math.floor((mu - yi * math.log(mu)) * 1e6 + 0.5))
        if (mu - yi * math.log(mu)) >= 0
        else -int(math.floor(-(mu - yi * math.log(mu)) * 1e6 + 0.5))
        for yi in y
    ]
    r1 = _BURST_MULT * mu
    c1 = [
        int(math.floor((r1 - yi * math.log(r1)) * 1e6 + 0.5))
        if (r1 - yi * math.log(r1)) >= 0
        else -int(math.floor(-(r1 - yi * math.log(r1)) * 1e6 + 0.5))
        for yi in y
    ]
    d0, d1 = c0[0], c1[0] + _GAMMA_E6
    p0, p1 = "0", "1"
    for t in range(1, len(y)):
        nd0 = c0[t] + min(d0, d1)
        nd1 = c1[t] + min(d0 + _GAMMA_E6, d1)
        np0 = (p0 if d0 <= d1 else p1) + "0"
        np1 = (p1 if d1 <= d0 + _GAMMA_E6 else p0) + "1"
        d0, d1, p0, p1 = nd0, nd1, np0, np1
    path, total = (p0, d0) if d0 <= d1 else (p1, d1)
    runs = [len(r) for r in path.split("0") if r]
    return {
        "path": path,
        "burst_hours": path.count("1"),
        "n_bursts": len(runs),
        "max_burst_len": max(runs) if runs else 0,
        "first_burst_idx": path.find("1"),
        "total_cost": total,
    }


def test_burst_matches_python_replay_on_corpus(spark):
    out = _collect(spark, "timeseries_burst_kleinberg").set_index(
        "event_type")
    ev = duckdb.sql(
        "SELECT event_type, CAST(FLOOR(epoch(ts)/3600) AS BIGINT) AS h "
        f"FROM '{SF_SMOKE_DIR}/events.parquet'"
    ).df()
    hmin, hmax = int(ev["h"].min()), int(ev["h"].max())
    for et, r in out.iterrows():
        g = ev[ev["event_type"] == et].groupby("h").size()
        y = np.array([g.get(h, 0) for h in range(hmin, hmax + 1)],
                     dtype=np.int64)
        want = _dp_outputs(y)
        assert int(r["n_hours"]) == len(y)
        assert int(r["burst_hours"]) == want["burst_hours"]
        assert int(r["n_bursts"]) == want["n_bursts"]
        assert int(r["max_burst_len"]) == want["max_burst_len"]
        assert int(r["first_burst_idx"]) == want["first_burst_idx"]
        assert int(r["total_cost"]) == want["total_cost"]


def test_burst_segments_planted_burst(spark, tmp_path):
    """Base rate 5/hour for 96 hours, except hours 40..49 at 30/hour:
    the automaton must report exactly one burst spanning those 10 hours
    — and a single-hour dip inside the burst must NOT split it (the
    hysteresis the 5-nat entry penalty buys)."""
    import pandas as pd

    rows = []
    eid = 0
    for h in range(96):
        rate = 30 if 40 <= h <= 49 else 5
        if h == 45:
            rate = 13  # dip inside the burst: hysteresis must bridge it
        for _ in range(rate):
            rows.append((eid, (h * 3600 + 60) * 1_000_000, 1, "m", 1.0,
                         "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(pdf, preserve_index=False).set_column(
        1, "ts", pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("us")))
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = _collect(spark, "timeseries_burst_kleinberg",
                   sf_dir=str(tmp_path))
    r = out.iloc[0]
    assert int(r["n_bursts"]) == 1
    assert int(r["first_burst_idx"]) == 40
    assert int(r["burst_hours"]) == 10
    assert int(r["max_burst_len"]) == 10


def test_viterbi_tie_breaks_prefer_staying(spark):
    """Equal-cost states: path0 takes the 0-predecessor, path1 stays in
    1 — the pinned rule both engines must share."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_type": ["m"] * 3,
            "i": [0, 1, 2],
            "y": [0, 0, 0],
            "cost0": [0, 0, 0],
            "cost1": [-_GAMMA_E6, 0, 0],
        }
    )
    r = _viterbi(pdf).iloc[0]
    # d0(0)=0, d1(0)=-gamma+gamma=0: tie at every step; optimal path
    # keeps state 0 because final tie prefers d0
    assert int(r["burst_hours"]) == 0
    assert int(r["n_bursts"]) == 0
