#!/usr/bin/env python3
"""Extend a committed SCALING record with freshly measured size points and
refit the slopes — the r14 carry-forward: the 1x-30x points (and the char
family's 100x points) were measured in r13 on the same box, same cold-cache
basis, and NONE of the r14 engine diffs touch those queries' plans (r14
changed harness plumbing, tooling, and added the t14d query), so re-running
~2h of unchanged measurements would add noise, not information. The output
record says exactly which points are carried and which are fresh
("provenance" per query), so a reader can never mistake the mix for one
measurement session. Slopes are refit by the SAME least-squares log-log
model over min_sec as tools/scaling_report.py, over the union of points.

Usage: merge_scaling.py <out.json> <out_diag.json> <base.json> <base_diag.json>
                        <k:rec:diag> ... [--note=<why carrying is valid>]
(rec/diag are a subset bench's bench_only.json / bench_diag_only.json; the
note lands in the output's provenance sentence. Multiple fresh slices must
agree on runs — the merge refuses otherwise.)
"""
import json
import math
import sys

FIELDS = ["wall", "cpu_ms", "gc_ms", "shuffle_read", "shuffle_write",
          "spill_mem", "spill_disk", "task_cpu_ms", "task_gc_ms"]

out_path, out_diag_path, base_path, base_diag_path = sys.argv[1:5]
base = json.load(open(base_path))
base_diag = json.load(open(base_diag_path))

fresh = {}  # query -> {size_str: (min, median, exec)}
fresh_diag = {}  # query -> {size_str: diag row}
fresh_sizes = {}  # size_str -> sf dir
runs_by_slice = {}  # k -> runs (r15 advice: one slice's runs must not
# stamp another slice's points in the provenance string; with multiple
# k:rec:diag args the slices must agree or the merge refuses)
for arg in sys.argv[5:]:
    if arg.startswith("--note="):
        continue
    k, rec_path, diag_path = arg.split(":", 2)
    rec = json.load(open(rec_path))
    diag = json.load(open(diag_path))
    runs_by_slice[k] = rec.get("runs")
    key = str(float(k))
    fresh_sizes[key] = rec["sf"]
    failed = set(rec.get("errors", {}))
    for name, wall_min in rec["queries_min"].items():
        # a query that THREW still posts a (near-zero, partial) wall time —
        # merging it would write a time-to-failure into the committed record
        # as a measured point and deflate the refit slope. Skip and say so.
        if name in failed:
            print(f"{name}: FAILED at {k}x ({rec['errors'][name][:80]}) — "
                  "point NOT merged", file=sys.stderr)
            continue
        fresh.setdefault(name, {})[key] = (
            wall_min, rec["queries"][name],
            rec.get("queries_exec", {}).get(name))
    for name, rounds in diag["rounds_per_query"].items():
        ok = [r for r in rounds if r.get("wall", -1) > 0]
        if ok:
            best = min(ok, key=lambda r: r["wall"])
            # the diag record keys sizes by the RAW k string ("100"), the
            # scaling record by str(float(k)) ("100.0") — match each base
            fresh_diag.setdefault(name, {})[k] = {
                f: best.get(f, 0) for f in FIELDS}


def refit(min_sec):
    pts = sorted((float(k), v) for k, v in min_sec.items())
    lx = [math.log(k) for k, _ in pts]
    ly = [math.log(v) for _, v in pts]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    denom = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / denom


for name, by_size in fresh.items():
    row = base["queries"].get(name)
    if row is None:
        # r16: a query new to the scaling net joins with an ALL-FRESH row,
        # provided the fresh points alone anchor a fit (>= 2 sizes incl. 1x)
        if len(by_size) >= 2 and "1.0" in by_size:
            row = {"min_sec": {}, "median_sec": {}, "exec_sec": {}}
            base["queries"][name] = row
            base_diag["queries"].setdefault(name, {})
        else:
            print(f"{name}: not in base record and fresh points lack a 1x "
                  "anchor — skipped", file=sys.stderr)
            continue
    # a fresh point RE-measuring an already-carried size supersedes the
    # carried one — it must not be listed under both (r15 advice). When
    # the merge CHAINS onto its own output within one round (base == out,
    # the r16 pattern), sizes an earlier invocation measured fresh stay
    # labeled fresh — relabeling them 'carried' would misattribute this
    # round's measurements to a prior round (r16 review finding).
    prev_fresh = (set(row.get("provenance", {}).get("fresh_sizes", []))
                  if base_path == out_path else set())
    fresh_all = sorted(prev_fresh | set(by_size), key=float)
    carried = sorted((k for k in row["min_sec"] if k not in fresh_all),
                     key=float)
    for key, (mn, med, exe) in by_size.items():
        row["min_sec"][key] = round(mn, 3)
        row["median_sec"][key] = round(med, 3)
        row["exec_sec"][key] = round(exe, 3) if exe is not None else None
    row["slope"] = round(refit(row["min_sec"]), 3)
    row["provenance"] = {
        "carried_sizes": carried,
        "fresh_sizes": fresh_all,
    }
    d = base_diag["queries"].get(name)
    if d is not None and name in fresh_diag:
        d.update(fresh_diag[name])

distinct_runs = sorted({v for v in runs_by_slice.values()},
                       key=lambda v: (v is None, v))
if len(distinct_runs) > 1:
    sys.exit(f"fresh slices disagree on runs ({runs_by_slice}) — one "
             "provenance sentence cannot describe both; merge them in "
             "separate invocations")
runs_fresh = distinct_runs[0] if distinct_runs else None

base["sizes"].update(fresh_sizes)
base["superlinear"] = sorted(
    [n for n, r in base["queries"].items() if r["slope"] > 1.15],
    key=lambda n: -base["queries"][n]["slope"])
note = next((a.split("=", 1)[1] for a in sys.argv[5:]
             if a.startswith("--note=")), None)
sentence = (
    f"base points carried from {base_path}"
    + (f" ({note})" if note else " (see that record's own provenance)")
    + f"; fresh points measured at runs={runs_fresh} on the same box and "
    f"cold-cache basis. Per-query carried/fresh split in each row's "
    f"'provenance'.")
# chained same-file merges APPEND their note — replacing it would discard
# the earlier invocations' basis explanation (r16 review finding)
base["provenance"] = (
    base["provenance"] + " THEN: " + sentence
    if base_path == out_path and "provenance" in base else sentence)
base_diag["sizes"] = sorted({float(k) for k in base["sizes"]})
base_diag["provenance"] = base["provenance"]
json.dump(base, open(out_path, "w"), indent=1)
json.dump(base_diag, open(out_diag_path, "w"), indent=1)
for name in sorted(fresh):
    r = base["queries"].get(name)
    if r:
        print(f"{name:25s} slope={r['slope']:6.3f}  " + " ".join(
            f"{float(k):g}x:{t:.2f}s" for k, t in
            sorted(r["min_sec"].items(), key=lambda kv: float(kv[0]))))
print(f"superlinear: {base['superlinear']}")
