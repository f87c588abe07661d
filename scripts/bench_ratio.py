#!/usr/bin/env python3
"""Bench ratio report: a pass's per-query seconds vs TWO floors.

Floors (definitions recorded in BASELINE.md, round 18):
  - min    : the all-time minimum per query over `.bench_history.jsonl`
             (the historical "best-of" floor). One-sided: a single lucky
             host window is captured forever, so a handful of
             outlier-low minima build a permanent penalty into every
             later honest ratio (the c2_lsh_recall case — 3-in-81
             samples under 3.0 s pinned a 2.589 s floor against a
             3.1-5.7 s steady state).
  - robust : the median of the query's trailing 9 history samples (its
             recent clean-window behavior). Two-sided and
             freeze-resistant: a median ignores both lucky minima and
             freeze-inflated maxima, and "trailing" keeps it honest
             after a semantics change re-prices a query (the floor
             follows within 5 samples instead of pinning the old
             meaning forever).

Usage: scripts/bench_ratio.py [BENCH_METRICS.json] [.bench_history.jsonl]
Prints both totals/ratios and the worst per-query offenders vs each
floor. The official record quotes BOTH numbers; >2x checks use the
robust floor (the min floor stays reported for continuity with rounds
10-17).
"""
import json
import statistics
import sys

TRAILING = 9


def main() -> int:
    metrics_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_METRICS.json"
    history_path = sys.argv[2] if len(sys.argv) > 2 else ".bench_history.jsonl"

    with open(metrics_path) as f:
        metrics = json.load(f)
    qsec = metrics["queries"] if "queries" in metrics else metrics

    hist: dict[str, list[float]] = {}
    with open(history_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            hist.setdefault(rec["q"], []).append(float(rec["sec"]))

    rows = []
    for q, sec in sorted(qsec.items()):
        if isinstance(sec, dict):  # BENCH_METRICS per-query object form
            sec = float(sec.get("sec", sec.get("s", 0.0)))
        samples = hist.get(q, [])
        fmin = min(samples) if samples else None
        frob = statistics.median(samples[-TRAILING:]) if samples else None
        rows.append((q, float(sec), fmin, frob))

    covered = [r for r in rows if r[2] is not None]
    total = sum(r[1] for r in covered)
    tmin = sum(r[2] for r in covered)
    trob = sum(r[3] for r in covered)
    print(f"queries: {len(rows)} ({len(covered)} with history)")
    print(f"pass total      : {total:8.1f} s")
    print(f"min-floor total : {tmin:8.1f} s   ratio {total / tmin:.3f}")
    print(f"robust total    : {trob:8.1f} s   ratio {total / trob:.3f}")

    for name, idx in (("min", 2), ("robust", 3)):
        over = sorted((r for r in covered if r[1] > 2 * r[idx]),
                      key=lambda r: -(r[1] / r[idx]))
        print(f">2x {name} floor: {len(over)}")
        for q, sec, fmin, frob in over[:10]:
            f = fmin if idx == 2 else frob
            print(f"  {q}: {sec:.2f} s vs {f:.2f} s ({sec / f:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
