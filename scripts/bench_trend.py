"""Per-query bench trend across rounds: every BENCH_r*.json vs the
round-1 contract baseline.

Ten-plus rounds of BENCH artifacts exist, but a single round's total is
dominated by environment noise on this shared box (same-code spread
16.4-21.2 s in one afternoon — SCALE.md round-10 tally); slow DRIFT in
one query hides inside that band.  This script makes drift visible:
for each headline query it prints the wall-second ratio vs BENCH_r01
for every round that measured it, plus a trailing-3-round mean ratio,
and FLAGS queries whose trailing mean exceeds the threshold (default
1.5x) — a persistent regression signal that single-round noise can't
fake in either direction.

Usage: python scripts/bench_trend.py [--threshold 1.5] [--repo DIR]

Exit status 1 if any query is flagged (so a round close can gate on
it); 0 otherwise.  No Spark session — pure artifact reading.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def load_rounds(repo: str) -> dict[int, dict[str, float]]:
    """round number -> {query: wall seconds} for every BENCH_r*.json
    with a parsed per-query map (rc==0 runs only)."""
    rounds: dict[int, dict[str, float]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            d = json.load(f)
        parsed = d.get("parsed") or {}
        qs = parsed.get("queries")
        if d.get("rc") == 0 and isinstance(qs, dict) and qs:
            rounds[int(m.group(1))] = {k: float(v) for k, v in qs.items()}
    return rounds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--repo", default=os.path.dirname(os.path.dirname(__file__)) or "."
    )
    args = ap.parse_args()

    rounds = load_rounds(args.repo)
    if 1 not in rounds:
        print("no BENCH_r01.json baseline — nothing to compare", file=sys.stderr)
        return 2
    base = rounds[1]
    later = sorted(r for r in rounds if r > 1)
    # the union of queries ever benched; ratio only where both ends exist
    names = sorted({q for qs in rounds.values() for q in qs})

    header = ["query"] + [f"r{r}" for r in later] + ["trail3"]
    widths = [max(len(header[0]), max(len(n) for n in names))] + [6] * (
        len(later) + 1
    )
    print("  ".join(h.ljust(w) for h, w in zip(header, widths)))
    flagged = []
    for q in names:
        cells = [q.ljust(widths[0])]
        ratios_by_round = []
        for r in later:
            if q in rounds[r] and q in base and base[q] > 0:
                ratio = rounds[r][q] / base[q]
                ratios_by_round.append(ratio)
                cells.append(f"{ratio:.2f}".ljust(6))
            else:
                cells.append("-".ljust(6))
        trail = ratios_by_round[-3:]
        if trail and q in base:
            t = sum(trail) / len(trail)
            mark = " <-- FLAG" if t > args.threshold else ""
            cells.append(f"{t:.2f}{mark}")
            if t > args.threshold:
                flagged.append((q, t))
        else:
            cells.append("-")
        print("  ".join(cells))

    # total ratio over the INTERSECTION with r1's query set: the
    # headline set grew across rounds, so a whatever-was-benched total
    # would conflate drift with registry growth (per-query ratios
    # above are unaffected); n= shows how much of r1's set each round
    # still measures.
    r1_qs = set(base)
    totals = {
        r: (
            sum(v for q, v in qs.items() if q in r1_qs),
            sum(1 for q in qs if q in r1_qs),
        )
        for r, qs in rounds.items()
    }
    base_total = totals[1][0]
    print()
    print(
        "total wall vs r1 (r1-query intersection):  "
        + "  ".join(
            f"r{r}={totals[r][0] / base_total:.2f}(n={totals[r][1]})"
            for r in sorted(totals)
        )
    )
    if flagged:
        print()
        print(f"{len(flagged)} FLAGGED (trailing-3 mean > {args.threshold}x r1):")
        for q, t in flagged:
            print(f"  {q}: {t:.2f}x")
        return 1
    print(f"no query's trailing-3 mean exceeds {args.threshold}x r1")
    return 0


if __name__ == "__main__":
    sys.exit(main())
