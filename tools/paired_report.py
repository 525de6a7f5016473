#!/usr/bin/env python3
"""Merge the three arms of tools/paired_bench.sh into one paired record.

Usage: paired_report.py out.json old_sha new_sha old1.json new.json old2.json

Per query, on the suite's standard MIN-WALL basis (the quoting basis of
every other committed record), three readings:

  - `ratio_vs_best_old` — new vs min(A1, A2): a CONSERVATIVE bound for
    claiming improvements (new beat the best of two same-code sittings);
    read regressions from it with care, because when box state trends
    WITHIN the sitting (the r17 maiden run: A2 fastest on every query —
    the box sped up monotonically over ~25 min) the best old arm absorbs
    all favourable drift and same-plan code reads 1.1-1.4x "slower".
  - `ratio_adjacent` — new vs A1, the arm measured immediately before it:
    the drift-minimizing point estimate.
  - `drift` — the A1-vs-A2 same-code relative gap. Any |ratio - 1| inside
    it is noise by the record's own evidence; only deltas clearing it on
    BOTH ratio bases are attributable to the code change.

Cross-round medians per arm are retained alongside the mins so a reader
can check round-structure effects.
"""
import json
import sys


def main() -> None:
    out, old_sha, new_sha, old1_p, new_p, old2_p = sys.argv[1:7]
    old1 = json.load(open(old1_p))
    new = json.load(open(new_p))
    old2 = json.load(open(old2_p))

    def mins(rec):
        # min-wall per query; fall back to medians for legacy records
        return rec.get("queries_min") or rec["queries"]

    o1m, o2m, bm = mins(old1), mins(old2), mins(new)
    queries = {}
    for q in sorted(new.get("queries", {})):
        if q not in o1m or q not in o2m:
            queries[q] = {"new_min": bm.get(q), "note": "query absent at old ref"}
            continue
        a1, a2, b = o1m[q], o2m[q], bm[q]
        best_old = min(a1, a2)
        queries[q] = {
            "old_a1_min": a1,
            "old_a2_min": a2,
            "new_min": b,
            "old_a1_median": old1["queries"].get(q),
            "old_a2_median": old2["queries"].get(q),
            "new_median": new["queries"].get(q),
            "ratio_vs_best_old": round(b / best_old, 4) if best_old else None,
            "ratio_adjacent": round(b / a1, 4) if a1 else None,
            "drift": round(abs(a1 - a2) / min(a1, a2), 4) if min(a1, a2) else None,
        }
    with_r = [r for r in queries.values() if "drift" in r]
    a2_faster = sum(1 for r in with_r if r["old_a2_min"] < r["old_a1_min"])
    rec = {
        "metric": "paired_same_day_bench",
        "old_sha": old_sha,
        "new_sha": new_sha,
        "sf": new.get("sf"),
        "runs_per_arm": new.get("runs"),
        "arm_order": ["old_a1", "new", "old_a2"],
        "basis": "cold-cache",
        "basis_detail": (
            "interleaved A1->B->A2 in one sitting on one box, min-wall per "
            "arm; ratio_vs_best_old = new/min(A1,A2) (conservative for "
            "improvement claims), ratio_adjacent = new/A1 (drift-minimizing "
            "point estimate), drift = the same-code A1-vs-A2 relative gap "
            "that bounds attributable deltas"
        ),
        "box_trend": (
            f"A2 faster than A1 on {a2_faster}/{len(with_r)} queries — "
            + ("box state trended WITHIN the sitting; prefer ratio_adjacent"
               if with_r and a2_faster >= 0.8 * len(with_r)
               else "no monotone within-sitting trend")
        ),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    for q, r in queries.items():
        if "drift" in r:
            print(f"{q}: old_min {min(r['old_a1_min'], r['old_a2_min']):.3f}s "
                  f"new_min {r['new_min']:.3f}s "
                  f"vs_best {r['ratio_vs_best_old']} adj {r['ratio_adjacent']} "
                  f"(drift {r['drift']})")
        else:
            print(f"{q}: new {r['new_min']:.3f}s ({r['note']})")
    print(rec["box_trend"])


if __name__ == "__main__":
    main()
