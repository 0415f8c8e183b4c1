#!/usr/bin/env python
"""Per-row bench regression audit with the machine-day rule enforced.

ROUND_NOTES r14 proved by A/B-ing an UNCHANGED older tree that the
cross-DAY ambient band of this host is wider than the within-day ±7%
band: the same code measured ~20% slower on a different machine-day.
A per-row comparison across machine-days therefore reads ambient drift
as code regression. This tool mechanizes the rule (r14 VERDICT item 6):

* Both legs must be FULL bench records (the ``.bench_last_sf*.json``
  mirror bench.py writes — has a ``queries`` map and, since r15, a
  ``machine_day`` marker of boot_id + local date).
* If the markers differ (or either is missing), the tool REFUSES the
  per-row comparison (exit 2) unless ``--anchor`` supplies an A/B leg:
  a record produced by re-running the OLD tree on the NEW machine-day.
  With an anchor, rows are compared new-vs-anchor (same machine-day by
  construction; the tool checks) and the old leg is reported only as
  context.
* ``--force`` overrides for exploratory use; the output then carries a
  loud cross-day caveat.

Usage:
    python tools/audit_bench_regression.py OLD.json NEW.json \
        [--band 0.07] [--top 15] [--anchor ANCHOR.json] [--force]

Exit codes: 0 = compared, no row beyond band; 1 = rows beyond band
(listed); 2 = refused (cross machine-day without anchor).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        rec = json.load(fh)
    if "queries" not in rec:
        raise SystemExit(
            f"{path}: not a full bench record (no 'queries' map) — "
            "pass the .bench_last_sf*.json mirror, not the driver tail"
        )
    return rec


def _marker(rec: dict) -> str | None:
    md = rec.get("machine_day")
    return md.get("marker") if isinstance(md, dict) else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=0.07,
                    help="relative drift beyond which a row is flagged")
    ap.add_argument("--min-secs", type=float, default=0.25,
                    help="ignore rows faster than this in BOTH legs")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--anchor", help="A/B leg: the OLD tree re-run on "
                    "the NEW machine-day (required for cross-day audits)")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    base, base_label = old, args.old
    caveat = None

    m_old, m_new = _marker(old), _marker(new)
    cross_day = m_old is None or m_new is None or m_old != m_new
    if cross_day:
        if args.anchor:
            anchor = _load(args.anchor)
            m_anchor = _marker(anchor)
            if m_anchor is not None and m_new is not None and m_anchor != m_new:
                print(
                    f"REFUSED: anchor machine-day {m_anchor!r} != new leg "
                    f"{m_new!r} — the anchor must be taken on the NEW "
                    "machine-day",
                    file=sys.stderr,
                )
                sys.exit(2)
            base, base_label = anchor, f"{args.anchor} (A/B anchor)"
            caveat = (
                f"cross machine-day ({m_old!r} -> {m_new!r}); compared "
                f"against the A/B anchor instead of the old leg"
            )
        elif args.force:
            caveat = (
                f"FORCED cross machine-day comparison ({m_old!r} -> "
                f"{m_new!r}): drift below includes the ambient band and "
                "is NOT evidence of a code regression"
            )
        else:
            print(
                json.dumps(
                    {
                        "refused": True,
                        "reason": "cross machine-day per-row comparison "
                        "without an A/B anchor",
                        "old_marker": m_old,
                        "new_marker": m_new,
                        "fix": "re-run the old tree on today's machine "
                        "and pass it via --anchor, or use --force for "
                        "an explicitly-caveated look",
                    }
                )
            )
            sys.exit(2)

    qo, qn = base["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    drifted = []
    rels = []
    for name in shared:
        a, b = float(qo[name]), float(qn[name])
        if max(a, b) < args.min_secs:
            continue
        rel = (b - a) / a if a > 0 else float("inf")
        rels.append(rel)
        if abs(rel) > args.band:
            drifted.append((rel, name, a, b))
    drifted.sort(key=lambda t: -abs(t[0]))

    # Median drift is the ambient-vs-code discriminator (dr15 finding:
    # this host's ambient band moves tens of percent on ~HOURLY scales
    # — two same-code legs measured 15.6% apart at per-row median while
    # an interleaved 20-row A/B showed most rows identical across
    # trees). A large UNIFORM median with no concentrated worst rows
    # reads as ambient; a concentrated worst list over a small median
    # reads as a code regression. For a decisive verdict, interleave
    # anchor and candidate legs in TIME (old->new->old->new), not
    # merely on the same machine-day.
    rels.sort()
    median_drift = rels[len(rels) // 2] if rels else 0.0

    out = {
        "base": base_label,
        "new": args.new,
        "machine_day_ok": not cross_day or bool(args.anchor),
        "caveat": caveat,
        "band": args.band,
        "n_shared": len(shared),
        "n_only_old": len(set(qo) - set(qn)),
        "n_only_new": len(set(qn) - set(qo)),
        "total_base": round(sum(float(qo[n]) for n in shared), 1),
        "total_new": round(sum(float(qn[n]) for n in shared), 1),
        "n_beyond_band": len(drifted),
        "median_drift": round(median_drift, 3),
        "worst": [
            {"query": n, "base_s": a, "new_s": b, "drift": round(r, 3)}
            for r, n, a, b in drifted[: args.top]
        ],
    }
    print(json.dumps(out, indent=1))
    sys.exit(1 if drifted else 0)


if __name__ == "__main__":
    main()
