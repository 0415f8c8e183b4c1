"""Wave-13d operators: planted closed-form fixtures (perfect
discordance for Cochran's Q, strict per-block orderings for Page's L,
constant / two-scale alternating gap trains for burstiness)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def _frame(rows):
    """rows: list of (ts, user_id, event_type, value)."""
    return pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.Series([r[0] for r in rows]),
            "user_id": np.asarray([r[1] for r in rows], dtype=np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.asarray([r[3] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )


# ---------------------------------------------------------------------------
# Cochran's Q
# ---------------------------------------------------------------------------


def test_cochran_q_perfect_discordance_closed_form(spark, tmp_path):
    """Every user succeeds on exactly ONE (the same) metric: Q
    collapses to (k-1)*b exactly — any spurious factor in the moment
    algebra breaks the integer identity."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    b = 20
    for u in range(b):
        rows.append((t0 + pd.Timedelta(minutes=u), u, "purchase", 150.0))
        for m in ("view", "click", "error", "signup"):
            rows.append((t0 + pd.Timedelta(minutes=u, seconds=len(rows) % 50),
                         u, m, 1.0))
    _frame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_cochran_q", str(tmp_path)).set_index(
        "event_type"
    )
    assert len(out) == 5
    assert (out["q_e6"] == 4 * b * 1_000_000).all()  # (k-1)*b
    assert bool(out["reject_equal_rates"].all())
    assert int(out.loc["purchase", "n_success"]) == b
    assert int(out.loc["view", "n_success"]) == 0
    assert not out["degenerate"].any()


def test_cochran_q_all_concordant_is_degenerate(spark, tmp_path):
    """Every user succeeds on every metric: denominator 0 — the row
    must appear flagged, never silently drop or divide."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(10):
        for m in ("view", "click", "purchase", "signup", "error"):
            rows.append((t0 + pd.Timedelta(minutes=u, seconds=len(rows) % 50),
                         u, m, 150.0))
    _frame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_cochran_q", str(tmp_path))
    assert len(out) == 5
    assert bool(out["degenerate"].all())
    assert (out["q_e6"] == 0).all()
    assert not out["reject_equal_rates"].any()


def test_cochran_q_replay_smoke(spark):
    out = _collect(spark, "stats_cochran_q")
    ev = pd.read_parquet(f"{SF_SMOKE_DIR}/events.parquet")
    x = (
        ev.assign(x=(ev["value"] >= 100).astype(int))
        .groupby(["user_id", "event_type"])["x"]
        .max()
        .unstack(fill_value=0)
    )
    k = x.shape[1]
    c = x.sum(axis=0).astype(np.int64)
    r = x.sum(axis=1).astype(np.int64)
    n = int(c.sum())
    denom = k * n - int((r**2).sum())
    q = (k - 1) * (k * float((c**2).sum()) - float(n) * n) / denom
    assert (out["q_e6"] == int(_rha(q * 1e6)[()])).all()
    got_c = out.set_index("event_type")["n_success"]
    for m in c.index:
        assert int(got_c.loc[m]) == int(c.loc[m])


# ---------------------------------------------------------------------------
# Page's L
# ---------------------------------------------------------------------------


def _page_frame(orders, b=15):
    """orders: per-user counts per tercile, e.g. (1, 2, 3)."""
    t0 = pd.Timestamp("2024-01-01")
    hours = {0: 5, 1: 15, 2: 25}
    rows = []
    for u in range(b):
        for g, cnt in enumerate(orders):
            for j in range(cnt):
                rows.append((t0 + pd.Timedelta(hours=hours[g], seconds=u * 10 + j),
                             u, "view", 1.0))
    return _frame(rows)


def test_page_trend_strict_increase_closed_form(spark, tmp_path):
    """Counts strictly increase across terciles in every block:
    L2 = 28b (maximum), z = 4b/sqrt(8b) — exact."""
    b = 15
    _page_frame((1, 2, 3), b).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_page_trend", str(tmp_path))
    row = out.iloc[0]
    assert int(row["n_blocks"]) == b
    assert int(row["l2"]) == 28 * b
    z = (28 * b - 24.0 * b) / math.sqrt(8.0 * b)
    assert int(row["z_e6"]) == int(_rha(z * 1e6)[()])
    assert bool(row["increasing_trend"])


def test_page_trend_strict_decrease_rejects_nothing(spark, tmp_path):
    b = 15
    _page_frame((3, 2, 1), b).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_page_trend", str(tmp_path))
    row = out.iloc[0]
    assert int(row["l2"]) == 20 * b  # minimum
    assert int(row["z_e6"]) < 0
    assert not bool(row["increasing_trend"])


def test_page_trend_smoke_bounds(spark):
    out = _collect(spark, "stats_page_trend")
    row = out.iloc[0]
    b = int(row["n_blocks"])
    # L2 is bounded by the min/max orderings
    assert 20 * b <= int(row["l2"]) <= 28 * b
    assert int(row["e_l2"]) == 24 * b


# ---------------------------------------------------------------------------
# Inter-event burstiness
# ---------------------------------------------------------------------------


def test_burstiness_regular_train_is_minus_one(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01")
    rows = [(t0 + pd.Timedelta(seconds=60 * i), 0, "m", 1.0) for i in range(50)]
    _frame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "events_interevent_burstiness", str(tmp_path))
    row = out.iloc[0]
    assert int(row["n_gaps"]) == 49
    assert int(row["mean_gap_s"]) == 60
    assert int(row["burstiness_e9"]) == -1_000_000_000
    assert int(row["cv_e9"]) == 0


def test_burstiness_two_scale_train_closed_form(spark, tmp_path):
    """Alternating 1 s / 9 s gaps: sqrt(n*S2 - S1^2) = 8m vs S1 = 10m,
    so B = -1/9 exactly (up to the final e9 rounding)."""
    t0 = pd.Timestamp("2024-01-01")
    ts, t = [], t0
    for i in range(40):
        ts.append(t)
        t = t + pd.Timedelta(seconds=1 if i % 2 == 0 else 9)
    rows = [(x, 0, "m", 1.0) for x in ts]
    _frame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "events_interevent_burstiness", str(tmp_path))
    row = out.iloc[0]
    assert int(row["n_gaps"]) == 39  # odd: 20 ones, 19 nines
    # replay exactly with the odd-count moments
    n, s1, s2 = 39, 20 * 1 + 19 * 9, 20 * 1 + 19 * 81
    root = math.sqrt(n * s2 - s1 * s1)
    assert int(row["burstiness_e9"]) == int(
        _rha((root - s1) / (root + s1) * 1e9)[()]
    )
    assert int(row["cv_e9"]) == int(_rha(root / s1 * 1e9)[()])


def test_burstiness_replay_smoke(spark):
    out = _collect(spark, "events_interevent_burstiness").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE_DIR}/events.parquet")
    ev["us"] = ev["ts"].astype("int64")
    for m, grp in ev.groupby("event_type"):
        g = grp.sort_values(["us", "event_id"])["us"].to_numpy()
        gaps = (g[1:] - g[:-1]) // 1_000_000
        n, s1, s2 = len(gaps), int(gaps.sum()), int((gaps**2).sum())
        root = math.sqrt(n * s2 - s1 * s1)
        row = out.loc[m]
        assert int(row["n_gaps"]) == n
        assert int(row["burstiness_e9"]) == int(
            _rha((root - s1) / (root + s1) * 1e9)[()]
        ), m
