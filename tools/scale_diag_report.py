#!/usr/bin/env python3
"""Compose the committed pressure-evidence record behind the scaling-slope
attribution: for each query at each measured size, the diag fields of the
MIN-WALL forked round (the same round scaling_report's min_sec comes from)
— wall, cpu_ms, gc_ms, shuffle bytes, spill bytes. SCALE.md's regime
attribution (collision-growth shuffle exponents, spill onset) quotes these
numbers; keeping them only in /tmp left the round's central claim
unverifiable from the repo.

Usage: scale_diag_report.py <out.json> <k:diag_file> <k:diag_file> ...
(diag files are the bench's bench_diag_only.json per size)
"""
import json
import sys

# task_cpu_ms/task_gc_ms (r13): executor-side task-metric sums — in
# cluster-mode runs the only real CPU/GC numbers (cpu_ms/gc_ms are
# driver-process beans there)
FIELDS = ["wall", "cpu_ms", "gc_ms", "shuffle_read", "shuffle_write",
          "spill_mem", "spill_disk", "task_cpu_ms", "task_gc_ms"]

out_path = sys.argv[1]
per_query: dict[str, dict[str, dict]] = {}
sizes = []
for arg in sys.argv[2:]:
    k, path = arg.split(":", 1)
    sizes.append(float(k))
    with open(path) as f:
        diag = json.load(f)
    for q, rounds in diag["rounds_per_query"].items():
        # failed rounds carry wall:-1.0 (all fields -1) — min() over the raw
        # list would pick the failed round (same fix as shuffle_sweep_report)
        ok = [r for r in rounds if r.get("wall", -1) > 0]
        if not ok:
            continue
        best = min(ok, key=lambda r: r["wall"])
        per_query.setdefault(q, {})[k] = {f: best.get(f, 0) for f in FIELDS}

record = {
    "basis": "diag fields of the min-wall forked round per query per size "
             "(see tools/scaling_report.py for the min rationale); bytes "
             "fields are task-metric sums across the round",
    "sizes": sorted(sizes),
    "queries": {q: per_query[q] for q in sorted(per_query)},
}
with open(out_path, "w") as f:
    json.dump(record, f, indent=1, sort_keys=False)
print(f"wrote {out_path}: {len(per_query)} queries at {sorted(sizes)}")
