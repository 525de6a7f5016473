#!/bin/bash
# Same-day PAIRED A/B bench between two commits (r17, verdict task 5).
#
# The r15->r16 handoff showed why cross-session bench totals mislead: the
# builder's 69.70 s and the driver's 89.35 s measured the SAME code on the
# same box hours apart (box-state drift), and a round of headline deltas
# chased it. Round-over-round claims should instead cite a PAIRED record:
# both commits benched in one sitting.
#
# Arm schedule: A1 -> B1 -> A2 -> B2 (each rev measured FIRST and LAST).
# The maiden 3-arm run (A1->B->A2) showed a monotone within-sitting box
# trend putting the single B arm at a systematic disadvantage against
# min(A1,A2); with two arms per side, min-vs-min cancels any monotone
# trend instead of merely detecting it, and each side carries its own
# same-code drift band.
#
# Usage: tools/paired_bench.sh <old-ref> <queries-csv> <sf-dir> <out.json> [runs]
#   old-ref      git rev the NEW head is compared against (e.g. last
#                round-close commit)
#   queries-csv  SPARK_GRAFT_ONLY value: the round's plan-changed queries
#   sf-dir       bench input dir
#   out.json     paired record path (repo-relative)
#   runs         forked rounds per arm (default 3)
#
# The old rev builds in a detached worktree under /tmp (its own sbt target,
# never touching the repo's); each arm is a normal forked-rounds Bench
# subset run, serialized so no two Spark workloads contend.
set -e
OLD_REF="$1"; QUERIES="$2"; SF_DIR="$3"; OUT="$4"; RUNS="${5:-3}"
REPO=$(cd "$(dirname "$0")/.." && pwd)
WT=/tmp/graft_paired_old
cd "$REPO"
OLD_SHA=$(git rev-parse "$OLD_REF")
NEW_SHA=$(git rev-parse HEAD)

git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --detach "$WT" "$OLD_SHA" >/dev/null

run_arm() { # dir record logfile
  (cd "$1" &&
    SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_RUNS="$RUNS" \
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_RECORD="$2" \
    sbt -batch "runMain graft.Bench" > "$3" 2>&1)
  # retain the arm's diag (spill/shuffle/CPU per round) — Bench overwrites
  # bench_diag_only.json per run and the worktree is removed at the end, so
  # without this copy a surprising arm delta cannot be attributed post-hoc
  cp "$1"/bench_diag_only.json "${2%.json}_diag.json" 2>/dev/null || true
}

echo "== paired bench: old=$OLD_SHA new=$NEW_SHA queries=$QUERIES =="
echo "== arm A1 (old) =="; run_arm "$WT"   /tmp/paired_old1.json /tmp/paired_old1.log
echo "== arm B1 (new) =="; run_arm "$REPO" /tmp/paired_new1.json /tmp/paired_new1.log
echo "== arm A2 (old) =="; run_arm "$WT"   /tmp/paired_old2.json /tmp/paired_old2.log
echo "== arm B2 (new) =="; run_arm "$REPO" /tmp/paired_new2.json /tmp/paired_new2.log

python3 "$REPO/tools/paired_report.py" "$OUT" \
  "$OLD_SHA" "$NEW_SHA" \
  /tmp/paired_old1.json /tmp/paired_new1.json \
  /tmp/paired_old2.json /tmp/paired_new2.json

git worktree remove --force "$WT"
rm -f "$REPO"/bench_diag_only.json "$WT"/bench_diag_only.json 2>/dev/null || true
echo "paired record written to $OUT"
