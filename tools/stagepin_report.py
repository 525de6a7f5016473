#!/usr/bin/env python3
"""Compose stagepin100.json from the paired stage-pin bench records: the
char family at the 100x slice with the OPERATOR-LEVEL stage pin
(Corpus.charSpanPin — REPARTITION_BY_NUM exchanges on the set-build and
merge-join stages, sized by the measured ~40 MB/partition rule) in its
default AUTO mode vs forced OFF (SPARK_GRAFT_SPAN_PARTITIONS=0), at two
parallelism bases: the committed local[32] bench basis and the
throughput-shaped local[4] (a real cluster's per-executor core budget).

Each cell: min wall across the forked rounds plus that round's diag
(spill/shuffle/task CPU), and the ForkedRounds guard outcome per record —
the same evidence shape as shufflesweep100.json.

Usage: stagepin_report.py <out.json> <label:rec:diag> [<label:rec:diag> ...]
                          [--metric=<name>] [--detail=<basis sentence>]
(--metric/--detail override the char-family defaults so the same composer
emits the token-family arms record with its own metadata.)
"""
import json
import sys

out_path = sys.argv[1]
metric = next((a.split("=", 1)[1] for a in sys.argv[2:]
               if a.startswith("--metric=")), None)
detail = next((a.split("=", 1)[1] for a in sys.argv[2:]
               if a.startswith("--detail=")), None)
cells = {}
guard = {}
runs = {}
for arg in sys.argv[2:]:
    if arg.startswith("--"):
        continue
    label, rec_path, diag_path = arg.split(":")
    rec = json.load(open(rec_path))
    diag = json.load(open(diag_path))
    runs[label] = rec.get("runs")
    guard[label] = {
        "rounds_discarded": rec.get("rounds_discarded", 0),
        "discarded_totals": rec.get("discarded_totals", []),
        "residual_broken_round": rec.get("residual_broken_round", False),
        "round_totals": rec.get("round_totals", []),
    }
    for name, wall_min in rec["queries_min"].items():
        rounds = diag["rounds_per_query"].get(name, [])
        ok = [r for r in rounds if r.get("wall", -1) > 0]
        best = min(ok, key=lambda r: r["wall"]) if ok else {}
        cells.setdefault(name, {})[label] = {
            "wall_min": wall_min,
            "wall_median": rec["queries"].get(name),
            "spill_disk": best.get("spill_disk"),
            "spill_mem": best.get("spill_mem"),
            "shuffle_write": best.get("shuffle_write"),
            "task_cpu_ms": best.get("task_cpu_ms"),
            "task_gc_ms": best.get("task_gc_ms"),
        }

record = {
    "metric": metric or "char_span_stage_pin_100x",
    "sf": "/tmp/graft_scale/x100",
    "basis": "cold-cache",
    "basis_detail": detail or (
        "operator stage pin (Corpus.charSpanPin, REPARTITION_BY_NUM on the "
        "set-build + merge-join exchanges, sized bytes/40MB from plan "
        "statistics) AUTO vs OFF (SPARK_GRAFT_SPAN_PARTITIONS=0), plus the "
        "sess128 attribution arm (SPARK_GRAFT_SHUFFLE_PARTITIONS=128: "
        "session-wide pin, stage pin auto-disabled — uniform partitions "
        "WITH the map-side partial agg kept, isolating uniformity from "
        "the stage pin's repartition-first shape); forked rounds under "
        "the ForkedRounds disturbance guard, min-wall round quoted with "
        "its own diag; all cells same-day same-box pairs; cores32 = the "
        "committed local[32] bench basis, cores4 = local[4], the "
        "per-executor core budget of the clustermem100 executor topology"),
    "runs_per_cell": runs,
    "guard_per_cell": guard,
    "queries": cells,
}
with open(out_path, "w") as f:
    json.dump(record, f, indent=1)
print(f"wrote {out_path}")
for name, by_label in cells.items():
    for label, c in by_label.items():
        print(f"{name:24s} {label:16s} wall_min={c['wall_min']}")
