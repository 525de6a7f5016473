#!/usr/bin/env python3
"""Attribute cross-round bench spread from bench_diag.json (wall/gc/cpu per
query per forked round, written by graft.Bench full runs).

For every query whose max/min wall spread exceeds the threshold (default 2x),
compare the outlier round's GC time and process-CPU time against the fastest
round's: if the gc delta covers most of the wall excess the disturbance is
collector pauses; if cpu grows with wall it is genuine compute (plan or data
skew — a real regression signal); if neither moves, the stall happened
OFF-JVM (scheduler/page-cache/IO) and the wall excess is machine noise the
min/median basis already absorbs.

HEURISTIC, not a proof: process CPU is summed across cores while the wall
excess is single-clock, and GC worker threads accrue process CPU too — so
the GC delta is subtracted from the CPU delta before bucketing (otherwise a
GC-heavy round with gc_frac just under 0.5 could misread as "cpu", i.e. a
claimed regression, purely from collector parallelism). Treat "cpu" as a
pointer to re-measure, not a verdict.

Usage: spread_report.py [bench_diag.json] [threshold]
"""
import json
import sys

args = [a for a in sys.argv[1:] if a != "--any-basis"]
any_basis = "--any-basis" in sys.argv[1:]
path = args[0] if len(args) > 0 else "bench_diag.json"
thresh = float(args[1]) if len(args) > 1 else 2.0

rec = json.load(open(path))
# Basis guard (r14, verdict item 7): r13 moved the bench from warm- to
# cold-cache and the char family's numbers legitimately moved — comparing
# across bases silently misreads that as a regression. Records are stamped
# with "basis" since r14; an unlabeled record predates the stamp and its
# basis is ambiguous, so refuse unless the caller explicitly accepts.
basis = rec.get("basis")
if basis is None and not any_basis:
    sys.exit(
        f"{path}: no 'basis' field (pre-r14 record — warm/cold ambiguous); "
        "numbers from it must not be diffed against labeled records. "
        "Pass --any-basis to analyze it anyway."
    )
print(f"basis: {basis or 'UNLABELED (accepted via --any-basis)'}")
d = rec["rounds_per_query"]
buckets = {"gc": [], "cpu": [], "offjvm": []}
for name, rounds in sorted(d.items()):
    walls = [r["wall"] for r in rounds]
    lo, hi = min(walls), max(walls)
    if lo <= 0 or hi / lo < thresh:
        continue
    fast = rounds[walls.index(lo)]
    slow = rounds[walls.index(hi)]
    excess_ms = (slow["wall"] - fast["wall"]) * 1000
    gc_delta = slow["gc_ms"] - fast["gc_ms"]
    cpu_delta = slow["cpu_ms"] - fast["cpu_ms"]
    # what fraction of the extra wall time the deltas explain; the CPU
    # fraction excludes the GC component (GC workers accrue process CPU on
    # every core — counting it twice biases toward the "cpu" verdict)
    # clamp gc_delta at zero before subtracting: when the slow round did
    # LESS GC than the fast one, subtracting the negative delta would
    # INFLATE cpu_frac and bias toward the "cpu" verdict — the opposite of
    # the double-counting the subtraction is there to remove
    gc_frac = gc_delta / excess_ms if excess_ms > 0 else 0.0
    cpu_frac = max(cpu_delta - max(gc_delta, 0), 0) / excess_ms if excess_ms > 0 else 0.0
    if gc_frac >= 0.5:
        kind = "gc"
    elif cpu_frac >= 0.5:
        kind = "cpu"
    else:
        kind = "offjvm"
    buckets[kind].append(name)
    print(
        f"{name}: spread {hi/lo:.1f}x ({lo:.2f}-{hi:.2f}s) "
        f"excess {excess_ms:.0f}ms gc_delta {gc_delta}ms ({gc_frac:.0%}) "
        f"cpu_delta {cpu_delta}ms ({cpu_frac:.0%}) -> {kind}"
    )

total = sum(len(v) for v in buckets.values())
print(
    f"\n{total} queries over {thresh}x spread: "
    f"{len(buckets['gc'])} gc-dominated, {len(buckets['cpu'])} cpu-dominated, "
    f"{len(buckets['offjvm'])} off-JVM stalls"
)
