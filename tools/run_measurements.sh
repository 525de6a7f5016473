#!/bin/bash
# Round-16 serialized measurement pipeline — each step runs alone so no two
# Spark workloads contend (concurrent runs poison both measurements).
#
# r16 shape: PROMISES-FIRST ordering (r14/r15 precedent). This round's
# promises (verdict tasks 1/2/6/7 + the new-query records):
#   - the TOKEN-family stage pin measured in a stagepin-style arms record
#     at 100x (t23/t24: off vs auto vs forced-32) — the auto arm doubles
#     as the family's 100x scaling point (same default-session basis);
#   - t14e joins the scaling net 1x..100x (all points fresh — the query
#     had none), plus fresh 100x re-measures for t14c/t21 so SCALE.md's
#     flat-wall attributions re-quote from r16 diag (task 7);
#   - clustermem100_pin8: the char trio at 100x on EIGHT 4-core 2 GiB
#     executors with the stage pin in its default AUTO mode — does the
#     one-box zero-spill result survive real serialized exchanges (task 6);
#   - x30 output identity across (local auto-pin, local pin-off,
#     cluster-pin8 auto-pin) for t25 AND t23 — partitioning and topology
#     must never change results;
#   - bench_full at sf0.1 (now 135 queries: t14f/t14g joined) + spread;
#   - clusterverify at 135.
#
# What is NOT re-run (unchanged code + inputs, r13-r15 precedent):
# statesweep, batchsweep, memsweep, statesweep_capped, clustermem/n8/n16
# (StreamBench/MemSweep paths untouched), streambench + streambench_smoke
# + clusterstream (no streaming-path diff this round), clusterbench (top-40
# slice; r16 engine diffs touch only corpus-family plans ABOVE sf0.1),
# shufflesweep100/stagepin100/advisory100 (their code paths and the char
# constants they measured are unchanged). LATE-r16 CAVEAT on the
# clusterbench carry: the unified engage rule (landed after this script
# ran) DOES change the char trio's and t23/t24's sf0.1 plans, so the
# carried clusterbench.json top-40 slice predates HEAD's plans for those
# five queries — re-measure it next round or on demand.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32

echo "== step 1: scale slices (reused only behind a completion sentinel) =="
mkdir -p /tmp/graft_scale
for K in 3 10 30 100; do
  if [ ! -f "/tmp/graft_scale/x$K/_SUCCESS" ]; then
    rm -rf "/tmp/graft_scale/x$K"
    mkdir -p "/tmp/graft_scale/x$K"
    python3 tools/make_scale.py /root/testdata/sf0.1 "/tmp/graft_scale/x$K" "$K" \
      > "/tmp/m_scale$K.log" 2>&1
    touch "/tmp/graft_scale/x$K/_SUCCESS"
  fi
done

echo "== step 2: token-family stage-pin arms at 100x (t23/t24) =="
# three arms, 3 forked rounds each, AS RUN EARLY-r16 (before the engage
# rule landed): OFF (SPAN=0, the adaptive plan), AUTO (which at that
# commit used the char-style below-cores floor, so it measured the OFF
# plan — byte-identical shuffle, see tokenpin100.json's historical
# note), and FORCED-32 (one uniform partition per core — isolating the
# repartition-first shape where nothing spills). NOTE at HEAD: the
# unified engage rule makes a re-run's AUTO arm plan exactly as the
# FORCED-32 arm (max(cores, sized)=32 past the 16 MiB knee) — the
# committed record is the pre-rule evidence that motivated the rule.
for ARM in off auto f32; do
  case $ARM in
    off) PIN_ENV="SPARK_GRAFT_SPAN_PARTITIONS=0" ;;
    auto) PIN_ENV="" ;;
    f32) PIN_ENV="SPARK_GRAFT_SPAN_PARTITIONS=32" ;;
  esac
  env $PIN_ENV \
    SPARK_GRAFT_ONLY="t23_repeated_spans,t24_span_redaction" \
    SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 \
    SPARK_GRAFT_ROUND_TIMEOUT_MIN=60 \
    SPARK_GRAFT_RECORD="/tmp/m_tokpin_$ARM.json" \
    sbt -batch "runMain graft.Bench" > "/tmp/m_tokpin_$ARM.log" 2>&1
  cp bench_diag_only.json "/tmp/m_tokpin_diag_$ARM.json"
done
python3 tools/stagepin_report.py tokenpin100.json \
  cores32_off:/tmp/m_tokpin_off.json:/tmp/m_tokpin_diag_off.json \
  cores32_auto:/tmp/m_tokpin_auto.json:/tmp/m_tokpin_diag_auto.json \
  cores32_f32:/tmp/m_tokpin_f32.json:/tmp/m_tokpin_diag_f32.json \
  "--metric=token_span_stage_pin_100x" \
  "--detail=token-family stage pin (Corpus.tokenSpanPin, the measured ~5x expansion constant) at the 100x slice, t23/t24, 3 forked rounds per arm under the ForkedRounds disturbance guard, min-wall round quoted with its own diag, same-day same-box: cores32_off = SPARK_GRAFT_SPAN_PARTITIONS=0 (the pre-r16 adaptive plan), cores32_auto = the pre-rule default (the then-current below-cores floor kept auto OFF; at HEAD the unified engage rule plans auto as the f32 arm), cores32_f32 = forced 32 (one uniform REPARTITION_BY_NUM partition per core, isolating the repartition-first shape where nothing spills)"
rm -f bench_diag_only.json

echo "== step 3: t14e scaling points 1x..30x (+ t23/t24 at 30x) =="
SPARK_GRAFT_ONLY="t14e_bpe_encode" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_RECORD=/tmp/m_sc1.json \
  sbt -batch "runMain graft.Bench" > /tmp/m_sc1.log 2>&1
cp bench_diag_only.json /tmp/m_sc1_diag.json
SPARK_GRAFT_ONLY="t14e_bpe_encode" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x3 \
  SPARK_GRAFT_RECORD=/tmp/m_sc3.json \
  sbt -batch "runMain graft.Bench" > /tmp/m_sc3.log 2>&1
cp bench_diag_only.json /tmp/m_sc3_diag.json
SPARK_GRAFT_ONLY="t14e_bpe_encode" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x10 \
  SPARK_GRAFT_RECORD=/tmp/m_sc10.json \
  sbt -batch "runMain graft.Bench" > /tmp/m_sc10.log 2>&1
cp bench_diag_only.json /tmp/m_sc10_diag.json
SPARK_GRAFT_ONLY="t14e_bpe_encode,t23_repeated_spans,t24_span_redaction" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x30 \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=60 \
  SPARK_GRAFT_RECORD=/tmp/m_sc30.json \
  sbt -batch "runMain graft.Bench" > /tmp/m_sc30.log 2>&1
cp bench_diag_only.json /tmp/m_sc30_diag.json

echo "== step 4: 100x scaling points (t14e fresh; t14c/t21 re-measures) =="
SPARK_GRAFT_ONLY="t14e_bpe_encode,t14c_bpe_vocab,t21_bigram_ppl" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=120 \
  SPARK_GRAFT_RECORD=/tmp/m_sc100.json \
  sbt -batch "runMain graft.Bench" > /tmp/m_sc100.log 2>&1
cp bench_diag_only.json /tmp/m_sc100_diag.json
# t23/t24's 100x points: initially merged from step 2's AUTO arm; after
# the engage rule landed they were re-merged from the forced-32 knee
# cells, which ARE the rule's default plan at 10x/30x/100x (see the
# record's provenance chain).
python3 tools/merge_scaling.py SCALING_r16.json SCALING_r16_diag.json \
  SCALING_r15.json SCALING_r15_diag.json \
  1:/tmp/m_sc1.json:/tmp/m_sc1_diag.json \
  3:/tmp/m_sc3.json:/tmp/m_sc3_diag.json \
  10:/tmp/m_sc10.json:/tmp/m_sc10_diag.json \
  30:/tmp/m_sc30.json:/tmp/m_sc30_diag.json \
  100:/tmp/m_sc100.json:/tmp/m_sc100_diag.json \
  "--note=r16 engine diffs touch only the span-stage pin (off below the 16 MiB knee; at HEAD the engage rule DOES pin t23/t24 and the char trio at the big slices — their points are superseded by later re-merges from the knee cells, see the committed provenance chain), the marked-BPE escape (t14e re-measured fresh at every size), and the pin's sentinel guard (file-backed scans unaffected); all other carried points' plans are untouched. t14e is NEW to the net — every point fresh. t14c/t21 100x points re-measured fresh under the r16 box state for the task-7 re-attribution" \
  2> /tmp/m_merge_scaling.err
python3 tools/merge_scaling.py SCALING_r16.json SCALING_r16_diag.json \
  SCALING_r16.json SCALING_r16_diag.json \
  100:/tmp/m_tokpin_auto.json:/tmp/m_tokpin_diag_auto.json \
  "--note=t23/t24 100x points from the tokenpin100 AUTO arm (superseded later the same round by the engage rule's own records — see the committed provenance)" \
  2>> /tmp/m_merge_scaling.err
rm -f bench_diag_only.json

echo "== step 5: clustermem100_pin8 — the pinned char trio on 8x4-core 2 GiB executors =="
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[8,4,2304]' \
  SPARK_GRAFT_EXEC_MEM=2g \
  SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=120 \
  SPARK_GRAFT_RECORD=clustermem100_pin8.json \
  sbt -batch "runMain graft.Bench" > /tmp/m_pin8.log 2>&1
cp bench_diag_only.json clustermem100_pin8_diag.json
rm -f bench_diag_only.json

echo "== step 6: x30 output identity across pin modes and topologies =="
# three dumps of t25 (char, pin ENGAGES at x30: ~39-41 partitions) and
# t23 (token: engaged at the core count under the HEAD rule — 4 local /
# 32 on the cluster) — local default, local pin-off, and the step-5
# cluster topology with the default auto pin; results must be
# row-identical regardless of partitioning or executor topology.
SPARK_GRAFT_ONLY="t25_char_spans,t23_repeated_spans" \
  sbt -batch "runMain graft.Verify /tmp/graft_scale/x30 /tmp/id_local_auto" \
  > /tmp/m_id1.log 2>&1
SPARK_GRAFT_ONLY="t25_char_spans,t23_repeated_spans" SPARK_GRAFT_SPAN_PARTITIONS=0 \
  sbt -batch "runMain graft.Verify /tmp/graft_scale/x30 /tmp/id_local_off" \
  > /tmp/m_id2.log 2>&1
SPARK_GRAFT_ONLY="t25_char_spans,t23_repeated_spans" \
  SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[8,4,2304]' \
  SPARK_GRAFT_EXEC_MEM=2g \
  sbt -batch "runMain graft.Verify /tmp/graft_scale/x30 /tmp/id_cluster_auto" \
  > /tmp/m_id3.log 2>&1
python3 - > scaleidentity.json <<'EOF'
import duckdb, json
con = duckdb.connect()
out = {"metric": "x30_identity_pin_modes_and_topologies",
       "arms": ["local_auto", "local_off", "cluster_pin8_auto"], "queries": {}}
for q in ("t25_char_spans", "t23_repeated_spans"):
    hashes, rows = {}, {}
    for arm, d in (("local_auto", "/tmp/id_local_auto"),
                   ("local_off", "/tmp/id_local_off"),
                   ("cluster_pin8_auto", "/tmp/id_cluster_auto")):
        n, h = con.execute(
            f"SELECT count(*), md5(string_agg(r, '|' ORDER BY r)) FROM "
            f"(SELECT concat_ws(',', COLUMNS(*)) AS r FROM '{d}/{q}/*.parquet')"
        ).fetchone()
        hashes[arm], rows[arm] = h, n
    out["queries"][q] = {"rows": rows, "hash": hashes,
                         "identical": len(set(hashes.values())) == 1}
print(json.dumps(out, indent=1))
EOF
python3 -c "import json; d=json.load(open('scaleidentity.json')); assert all(q['identical'] for q in d['queries'].values()), d"

echo "== step 7: full forked bench (5 rounds, 135 queries) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/m_bench_full.log 2>&1
python3 tools/spread_report.py > /tmp/m_spread.log 2>&1 || true

echo "== step 8: multi-JVM cluster verify (135 queries) =="
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_cluster" \
  > /tmp/m_clusterverify.log 2>&1
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_cluster \
  --json clusterverify.json >> /tmp/m_clusterverify.log 2>&1

echo "ALL MEASUREMENTS DONE"
