#!/usr/bin/env python3
"""Merge the three arms of tools/paired_bench.sh into one paired record.

Usage: paired_report.py out.json old_sha new_sha old1.json new.json old2.json

Per query: the old baseline is the MIN of the two old arms' cross-round
medians (the cleaner of two same-code measurements — any gap between them
is box drift, not code), `ratio` is new/old, and `drift` is the A1-vs-A2
relative gap. A |ratio - 1| inside the drift band is noise by the record's
own evidence; only deltas clearing it are attributable to the code change.
"""
import json
import sys


def main() -> None:
    out, old_sha, new_sha, old1_p, new_p, old2_p = sys.argv[1:7]
    old1 = json.load(open(old1_p))
    new = json.load(open(new_p))
    old2 = json.load(open(old2_p))
    queries = {}
    for q in sorted(new.get("queries", {})):
        a1, a2 = old1["queries"].get(q), old2["queries"].get(q)
        b = new["queries"][q]
        if a1 is None or a2 is None:
            queries[q] = {"new": b, "note": "query absent at old ref"}
            continue
        old = min(a1, a2)
        queries[q] = {
            "old_a1": a1,
            "old_a2": a2,
            "old": old,
            "new": b,
            "ratio": round(b / old, 4) if old else None,
            "drift": round(abs(a1 - a2) / min(a1, a2), 4) if min(a1, a2) else None,
        }
    rec = {
        "metric": "paired_same_day_bench",
        "old_sha": old_sha,
        "new_sha": new_sha,
        "sf": new.get("sf"),
        "runs_per_arm": new.get("runs"),
        "arm_order": ["old_a1", "new", "old_a2"],
        "detail": (
            "interleaved A1->B->A2 in one sitting on one box; 'old' is the "
            "min of the two old arms' cross-round medians, 'drift' the "
            "same-code A1-vs-A2 relative gap that bounds attributable deltas"
        ),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    for q, r in queries.items():
        if "ratio" in r:
            print(f"{q}: old {r['old']:.3f}s new {r['new']:.3f}s "
                  f"ratio {r['ratio']} (drift {r['drift']})")
        else:
            print(f"{q}: new {r['new']:.3f}s ({r['note']})")


if __name__ == "__main__":
    main()
