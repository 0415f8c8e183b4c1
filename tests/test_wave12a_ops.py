"""Wave-12a operators: numpy replays on the smoke fixture plus planted
discriminator fixtures (each test replays the engine's exact quantized
arithmetic — scipy is not in this container)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE_DIR


def _collect(spark, name, sf_dir=SF_SMOKE_DIR):
    from emr_with_custom_metrics_spark.registry import all_specs

    return all_specs()[name].fn(spark, sf_dir).toPandas()


def _rha(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64
    )


def _events(sf_dir=SF_SMOKE_DIR):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # pandas reads the TIMESTAMP(NANOS) column as datetime64[us]
    ev["us"] = ev["ts"].astype("int64")
    ev["v_e3"] = _rha(ev["value"].to_numpy() * 1000)
    return ev


def _events_frame(values, event_types, ts=None, user_ids=None):
    n = len(values)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts if ts is not None else (
                pd.Timestamp("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="s")
            ),
            "user_id": np.asarray(
                user_ids if user_ids is not None else np.arange(n),
                dtype=np.int64,
            ),
            "event_type": event_types,
            "value": np.asarray(values, dtype=np.float64),
            "props": "{}",
        }
    )


# ---------------------------------------------------------------------------
# Friedman
# ---------------------------------------------------------------------------


def test_friedman_matches_replay(spark):
    out = _collect(spark, "stats_friedman_test").set_index("event_type")
    ev = _events()
    ev["day"] = ev["us"] // (86400 * 1_000_000)
    cells = (
        ev.groupby(["event_type", "day"]).size().unstack(fill_value=0)
    )
    k, b = cells.shape[0], cells.shape[1]
    r2 = np.zeros_like(cells.to_numpy())
    c = cells.to_numpy()
    for j in range(b):
        col = c[:, j]
        for i in range(k):
            r2[i, j] = 2 * (col < col[i]).sum() + (col == col[i]).sum() + 1
    a4 = int((r2.astype(object) ** 2).sum())
    rs = r2.sum(axis=1)
    b4 = int((rs.astype(object) ** 2).sum())
    num = (k - 1) * (b4 - b**2 * k * (k + 1) ** 2)
    den = a4 - b * k * (k + 1) ** 2
    q = int(_rha(num / den * 1e6)[()])
    for i, m in enumerate(cells.index):
        assert int(out.loc[m, "rank_sum_x2"]) == int(rs[i]), m
        assert int(out.loc[m, "friedman_q_e6"]) == q, m
        assert int(out.loc[m, "n_blocks"]) == b


def test_friedman_planted_dominant_metric(spark, tmp_path):
    """One metric strictly dominates every block: Q near its maximum,
    reject."""
    rows_v, rows_t, ts = [], [], []
    t0 = pd.Timestamp("2024-01-01")
    for day in range(12):
        for m, name in enumerate(["a", "b", "c"]):
            for i in range((m + 1) * (10 + day % 3)):
                rows_v.append(1.0)
                rows_t.append(name)
                ts.append(t0 + pd.Timedelta(days=day, seconds=len(ts) % 3600))
    _events_frame(rows_v, rows_t, ts=pd.Series(ts)).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_friedman_test", str(tmp_path))
    assert bool(out["reject_h0"].all())
    # k=3, no ties, perfect ordering: Q = b(k-1) -> Q/b(k-1) = 1
    assert int(out["friedman_q_e6"].iloc[0]) == 24_000_000  # b(k-1)=24


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra
# ---------------------------------------------------------------------------


def test_jonckheere_matches_bruteforce(spark):
    out = _collect(spark, "stats_jonckheere_trend").set_index("event_type")
    ev = _events()
    mn, mx = ev["us"].min(), ev["us"].max()
    ev["g"] = np.minimum(2, ((ev["us"] - mn) * 3.0 // (mx - mn + 1)).astype(int))
    for m, grp in ev.groupby("event_type"):
        j2 = 0
        groups = [grp[grp.g == g]["v_e3"].to_numpy() for g in (0, 1, 2)]
        for a in range(3):
            for b in range(a + 1, 3):
                xa, yb = groups[a], groups[b]
                j2 += 2 * int((xa[:, None] < yb[None, :]).sum())
                j2 += int((xa[:, None] == yb[None, :]).sum())
        ns = np.array([len(g) for g in groups], dtype=np.int64)
        nn = int(ns.sum())
        e2 = (nn * nn - int((ns.astype(object) ** 2).sum())) // 2
        var72 = nn * nn * (2 * nn + 3) - int(
            (ns.astype(object) ** 2 * (2 * ns + 3)).sum()
        )
        z = (j2 - e2) / 2.0 / math.sqrt(var72 / 72.0)
        assert int(out.loc[m, "jt_stat_x2"]) == j2, m
        assert int(out.loc[m, "e_x2"]) == e2, m
        assert int(out.loc[m, "z_e6"]) == int(_rha(z * 1e6)[()]), m


def test_jonckheere_planted_trend(spark, tmp_path):
    """Values rise strictly with time: z large positive, trend flagged;
    a time-shuffled copy of the same values is not."""
    n = 600
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.arange(n) * 3600, unit="s"
    )
    up = _events_frame(np.arange(n) * 0.01, ["m"] * n, ts=pd.Series(ts))
    up.to_parquet(tmp_path / "events.parquet", index=False)
    out = _collect(spark, "stats_jonckheere_trend", str(tmp_path))
    assert bool(out["monotone_trend"].iloc[0])
    assert int(out["z_e6"].iloc[0]) > 10_000_000  # z > 10
    flat = _events_frame(
        (np.arange(n) * 7919 % 601) * 0.01, ["m"] * n, ts=pd.Series(ts)
    )
    flat.to_parquet(tmp_path / "events.parquet", index=False)
    out2 = _collect(spark, "stats_jonckheere_trend", str(tmp_path))
    assert abs(int(out2["z_e6"].iloc[0])) < 1_959_964


# ---------------------------------------------------------------------------
# Bartlett
# ---------------------------------------------------------------------------


def test_bartlett_matches_replay(spark):
    out = _collect(spark, "stats_bartlett_variance").set_index("event_type")
    ev = _events()
    gs = {
        m: g["v_e3"].to_numpy(dtype=np.int64)
        for m, g in ev.groupby("event_type")
        if len(g) > 1
    }
    k = len(gs)
    nn = sum(len(v) for v in gs.values())
    ss_pool_e3 = 0
    sum_nl = 0
    recip = 0
    for v in gs.values():
        n = len(v)
        s1, s2 = int(v.sum()), int((v.astype(object) ** 2).sum())
        ss = s2 - s1 * s1 / n
        ss_pool_e3 += int(_rha(ss * 1000)[()])
        lnv = max(ss / (n - 1), 1e-12)
        sum_nl += (n - 1) * int(_rha(math.log(lnv) * 1e9)[()])
        recip += int(_rha(1e12 / (n - 1))[()])
    ln_pool = int(_rha(math.log(ss_pool_e3 / 1000.0 / (nn - k)) * 1e9)[()])
    cc = 1.0 + (recip / 1e12 - 1.0 / (nn - k)) / (3.0 * (k - 1))
    x2 = int(_rha(((nn - k) * ln_pool - sum_nl) / 1000.0 / cc)[()])
    got = out["bartlett_x2_e6"].iloc[0]
    assert int(got) == x2
    assert (out["bartlett_x2_e6"] == got).all()  # family scalar


def test_bartlett_discriminates_variance_ratio(spark, tmp_path):
    rng = np.arange(4000)
    # equal spreads -> accept; 10x spread on one arm -> reject
    vals_eq = np.where(rng % 2 == 0, 10 + (rng % 7) * 0.1, 20 + (rng % 7) * 0.1)
    types = np.where(rng % 2 == 0, "a", "b")
    _events_frame(vals_eq, types).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_bartlett_variance", str(tmp_path))
    assert not bool(out["reject_homoscedastic"].any())
    vals_ne = np.where(rng % 2 == 0, 10 + (rng % 7) * 0.1, 20 + (rng % 7) * 1.0)
    _events_frame(vals_ne, types).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out2 = _collect(spark, "stats_bartlett_variance", str(tmp_path))
    assert bool(out2["reject_homoscedastic"].all())


# ---------------------------------------------------------------------------
# D'Agostino K^2
# ---------------------------------------------------------------------------


def _wide_to_double(x):
    """The engine's deterministic hi/mid/lo split conversion."""
    a = abs(x)
    hi = float(a // (1 << 60))
    mid = float((a % (1 << 60)) // (1 << 30))
    lo = float(a % (1 << 30))
    d = (hi * float(1 << 60) + mid * float(1 << 30)) + lo
    return -d if x < 0 else d


def _dk2_replay(v_e3):
    n = len(v_e3)
    md = int(_rha(int(v_e3.astype(object).sum()) / n)[()])
    w = v_e3.astype(object) - md
    s1, s2 = int(sum(w)), int(sum(x * x for x in w))
    s3 = int(sum(x * x * x for x in w))
    s4 = int(sum(x * x * x * x for x in w))
    s3d, s4d = _wide_to_double(s3), _wide_to_double(s4)
    a2 = float(n) * s2 - float(s1) * s1
    a3 = float(n) * n * s3d - 3.0 * n * float(s1) * s2 \
        + 2.0 * float(s1) * s1 * s1
    a4 = float(n) * n * n * s4d \
        - 4.0 * float(n) * n * float(s1) * s3d \
        + 6.0 * n * float(s1) * s1 * s2 - 3.0 * float(s1) * s1 * s1 * s1
    g1 = a3 / a2**1.5 if a2 > 0 else 0.0
    b2 = a4 / (a2 * a2) if a2 > 0 else 3.0
    y = g1 * math.sqrt((n + 1.0) * (n + 3) / (6.0 * (n - 2)))
    beta2 = 3.0 * (float(n) * n + 27 * n - 70) * (n + 1) * (n + 3) / (
        (n - 2.0) * (n + 5) * (n + 7) * (n + 9)
    )
    w2 = math.sqrt(2.0 * (beta2 - 1)) - 1
    if w2 > 1.000001:
        lnw = int(_rha(math.log(math.sqrt(w2)) * 1e9)[()]) / 1e9
        ya = y * math.sqrt((w2 - 1.0) / 2.0)
        lnt = int(_rha(math.log(ya + math.sqrt(ya * ya + 1.0)) * 1e9)[()]) / 1e9
        z1 = int(_rha(1.0 / math.sqrt(max(lnw, 1e-9)) * lnt * 1e6)[()])
    else:
        z1 = 0
    eb2 = 3.0 * (n - 1.0) / (n + 1)
    vb2 = 24.0 * n * (n - 2.0) * (n - 3) / ((n + 1.0) * (n + 1) * (n + 3) * (n + 5))
    sb1 = 6.0 * (float(n) * n - 5 * n + 2) / ((n + 7) * (n + 9.0)) * math.sqrt(
        6.0 * (n + 3) * (n + 5) / (float(n) * (n - 2) * (n - 3))
    )
    x = (b2 - eb2) / math.sqrt(vb2)
    aa = 6.0 + 8.0 / sb1 * (2.0 / sb1 + math.sqrt(1.0 + 4.0 / (sb1 * sb1)))
    if aa > 4 and (1.0 + x * math.sqrt(2.0 / (aa - 4))) != 0:
        r = (1.0 - 2.0 / aa) / (1.0 + x * math.sqrt(2.0 / (aa - 4)))
        cbrt = math.copysign(abs(r) ** (1.0 / 3.0), r)
        cbrt = int(_rha(cbrt * 1e9)[()]) / 1e9
        z2 = int(_rha(
            ((1.0 - 2.0 / (9.0 * aa)) - cbrt)
            / math.sqrt(2.0 / (9.0 * aa)) * 1e6
        )[()])
    else:
        z2 = 0
    return z1, z2


def test_dagostino_matches_replay(spark):
    out = _collect(spark, "stats_dagostino_k2").set_index("event_type")
    ev = _events()
    for m, g in ev.groupby("event_type"):
        if len(g) <= 20:
            continue
        z1, z2 = _dk2_replay(g["v_e3"].to_numpy(dtype=np.int64))
        assert int(out.loc[m, "skew_z_e6"]) == z1, m
        assert int(out.loc[m, "kurt_z_e6"]) == z2, m
        assert int(out.loc[m, "k2_e12"]) == z1 * z1 + z2 * z2, m
        assert bool(out.loc[m, "reject_normal"]) == (
            z1 * z1 + z2 * z2 > 5_991_465_000_000
        ), m


def test_dagostino_accepts_binomial_rejects_exponential(spark, tmp_path):
    """A symmetric binomial (near-normal) must NOT reject; a planted
    heavy-skew geometric-ish pile must."""
    # the EXACT Binomial(48, 1/2) histogram as a multiset: symmetric by
    # construction (zero skew), excess kurtosis -1/24 — a deterministic
    # near-normal sample with no RNG
    vals = []
    for k in range(49):
        cnt = round(3000 * math.comb(48, k) / 2**48)
        vals.extend([float(k)] * cnt)
    n = len(vals)
    _events_frame(np.array(vals), ["m"] * n).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "stats_dagostino_k2", str(tmp_path))
    assert not bool(out["reject_normal"].iloc[0])
    ids = np.arange(n, dtype=np.int64)
    skew = (ids % 11).astype(float) ** 3  # hard right skew
    _events_frame(skew, ["m"] * n).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out2 = _collect(spark, "stats_dagostino_k2", str(tmp_path))
    assert bool(out2["reject_normal"].iloc[0])


# ---------------------------------------------------------------------------
# Holm
# ---------------------------------------------------------------------------


def test_holm_boundary_matches_replay(spark):
    out = _collect(spark, "stats_holm_bonferroni")
    m = int(out["m"].iloc[0])
    out = out.sort_values("rnk")
    first_viol = 0
    for _, r in out.iterrows():
        if int(r["p_e9"]) * (m - int(r["rnk"]) + 1) > 50_000_000:
            first_viol = int(r["rnk"])
            break
    for _, r in out.iterrows():
        want = True if first_viol == 0 else int(r["rnk"]) < first_viol
        assert bool(r["rejected"]) == want, int(r["rnk"])
        assert int(r["holm_crit_e9"]) == int(
            _rha(50_000_000.0 / (m - int(r["rnk"]) + 1))[()]
        )


def test_holm_no_less_powerful_than_bonferroni_no_more_than_bh(spark):
    holm = _collect(spark, "stats_holm_bonferroni")
    m = int(holm["m"].iloc[0])
    bonf = {
        r["event_type"]
        for _, r in holm.iterrows()
        if int(r["p_e9"]) * m <= 50_000_000
    }
    holm_rej = {r["event_type"] for _, r in holm.iterrows() if r["rejected"]}
    assert bonf <= holm_rej
    bh = _collect(spark, "stats_fdr_bh")
    bh_rej = {r["event_type"] for _, r in bh.iterrows() if r["rejected"]}
    assert holm_rej <= bh_rej  # FWER control is never looser than FDR


# ---------------------------------------------------------------------------
# Krippendorff
# ---------------------------------------------------------------------------


def test_krippendorff_matches_replay(spark):
    out = _collect(spark, "ml_krippendorff_alpha").set_index("event_type")
    ev = _events()
    for m, g in ev.groupby("event_type"):
        v = g["v_e3"].to_numpy(dtype=np.int64)
        n = len(v)
        s1 = int(v.sum())
        vs = np.sort(v)
        med2 = int(vs[(n + 1) // 2 - 1]) + int(vs[(n + 2) // 2 - 1])
        mn, mx = int(v.min()), int(v.max())
        n1 = (
            (2 * v > med2).astype(int)
            + (v * n > s1).astype(int)
            + (2 * v > mn + mx).astype(int)
        )
        n1_tot = int(n1.sum())
        disagree = int(((3 - n1) * n1).sum())
        if 0 < n1_tot < 3 * n:
            alpha = 1.0 - (3.0 * n - 1) * disagree / (
                2.0 * (3.0 * n - n1_tot) * n1_tot
            )
            want = int(_rha(alpha * 1e9)[()])
        else:
            want = 10**9
        assert int(out.loc[m, "alpha_e9"]) == want, m
        assert int(out.loc[m, "pair_disagreements"]) == disagree, m


def test_krippendorff_perfect_and_degenerate(spark, tmp_path):
    """A symmetric two-point distribution makes all three screens agree
    exactly (alpha = 1e9); a constant metric hits the degenerate
    convention (all raters say 0 -> alpha = 1 by convention)."""
    n = 400
    vals = np.where(np.arange(n) % 2 == 0, 1.0, 9.0)
    _events_frame(vals, ["m"] * n).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out = _collect(spark, "ml_krippendorff_alpha", str(tmp_path))
    assert int(out["alpha_e9"].iloc[0]) == 10**9
    _events_frame(np.full(n, 5.0), ["m"] * n).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    out2 = _collect(spark, "ml_krippendorff_alpha", str(tmp_path))
    assert int(out2["alpha_e9"].iloc[0]) == 10**9


# ---------------------------------------------------------------------------
# cross-engine on planted fixtures (both engines run the same edge)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "stats_friedman_test",
        "stats_jonckheere_trend",
        "stats_bartlett_variance",
        "stats_dagostino_k2",
        "stats_holm_bonferroni",
        "ml_krippendorff_alpha",
    ],
)
def test_cross_engine_on_mixed_fixture(spark, tmp_path, name):
    import duckdb

    from emr_with_custom_metrics_spark.registry import all_specs

    rng = np.arange(2400)
    vals = np.where(rng % 3 == 0, (rng % 13) * 1.7, 5.0 + (rng % 5) * 0.25)
    types = np.array(["a", "b", "c"])[rng % 3]
    ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(rng * 977, unit="s")
    _events_frame(vals, types, ts=pd.Series(ts)).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    sp = all_specs()[name].fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    od = con.execute(all_specs()[name].oracle).df()
    con.close()
    cols = sorted(sp.columns)
    assert sorted(od.columns) == cols
    a = sp[cols].sort_values(cols).reset_index(drop=True)
    b = od[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), (name, c)
