#!/bin/bash
# Round-15 serialized measurement pipeline — each step runs alone so no two
# Spark workloads contend (concurrent runs poison both measurements).
#
# r15 shape: PROMISES-FIRST ordering (r14 precedent) — the round's mandated
# records run before re-measured baselines, so a timeout strands polish,
# not promises. This round's promises:
#   - the bytes-aware initial-partition rule's WIN, measured: fresh 100x
#     points for the char family under the sized (unpinned) session
#     (verdict item 1), plus t14c/t20's first 100x points (item 6);
#   - the 5-point shuffle sweep re-emitted at the bench-standard 3 forked
#     rounds with the ForkedRounds guard fields IN the record (item 4);
#   - bench_full at sf0.1 showing no regression (the sizing rule returns
#     exactly the core count there, so none is expected) — now 133 queries
#     (t14e joined);
#   - clusterverify at 133; clusterstream with the new grid (LOCF ticker)
#     row (item 8).
#
# Basis note for SCALING: the r15 sizing rule changes the UNPINNED session
# only where the SF dir's bytes exceed one 40 MB partition per core — x30
# (~71 initial partitions) and x100 (~235). Every 30x and 100x point is
# therefore re-measured fresh this round; 1x/3x/10x points are carried
# (the rule returns the identical core-count conf there, and no r15 engine
# diff touches those queries' plans).
#
# What is NOT re-run (unchanged code + inputs, r13/r14 precedent):
# statesweep, batchsweep, memsweep, statesweep_capped, clustermem*
# (StreamBench/MemSweep paths untouched this round), streambench +
# streambench_smoke (StatefulPaths row set unchanged — grid lives outside
# it precisely so the carried record stays valid), clusterbench (runs at
# sf0.1 where the sizing rule returns the identical conf; top-40 slice
# unchanged).
set -e
cd /root/repo
# Bench rows run at local[32] (the driver contract); the stream benches keep
# the r9 basis of local[4] — comparability over core count.
export SPARK_GRAFT_CPUS=32

echo "== step 1: scale slices (reused only behind a completion sentinel) =="
# a bare directory-existence check would silently reuse a PARTIAL slice
# from an interrupted make_scale run (r15 review finding) — the _SUCCESS
# sentinel is touched only after the build exits cleanly, and a
# sentinel-less dir is torn down and rebuilt
mkdir -p /tmp/graft_scale
for K in 30 100; do
  if [ ! -f "/tmp/graft_scale/x$K/_SUCCESS" ]; then
    rm -rf "/tmp/graft_scale/x$K"
    mkdir -p "/tmp/graft_scale/x$K"
    python3 tools/make_scale.py /root/testdata/sf0.1 "/tmp/graft_scale/x$K" "$K" \
      > "/tmp/m_scale$K.log" 2>&1
    touch "/tmp/graft_scale/x$K/_SUCCESS"
  fi
done

echo "== step 2: 100x scaling points under the SIZED session (the rule's win) =="
# verdict items 1+6: the char family re-measured at 100x under the new
# bytes-aware initial-partition count (unpinned — AQE coalescing on), plus
# first-ever 100x points for t14c/t20 and re-measures for the other
# carried-100x rows (t21/t14b/t10/x_v12) so every 100x point in
# SCALING_r15 shares one session basis.
SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction,t21_bigram_ppl,t14b_bpe_packing,t14c_bpe_vocab,t20_bigram_pmi,t10_neardup_clusters,x_v12_ivfpq_index" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=120 \
  sbt -batch "runMain graft.Bench" > /tmp/m_scalebench_100.log 2>&1
cp bench_only.json /tmp/m_scale_rec_100.json
cp bench_diag_only.json /tmp/m_scale_diag_100.json
rm -f bench_only.json bench_diag_only.json

echo "== step 3: 30x scaling points under the SIZED session =="
# same basis argument at 30x (~71 initial partitions vs the old 32): all
# 11 queries holding 30x points re-measure fresh.
SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction,t21_bigram_ppl,t14b_bpe_packing,t14c_bpe_vocab,t20_bigram_pmi,t10_neardup_clusters,x_v12_ivfpq_index,j5_star_join_revenue,d4_feature_corr" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x30 \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=60 \
  sbt -batch "runMain graft.Bench" > /tmp/m_scalebench_30.log 2>&1
cp bench_only.json /tmp/m_scale_rec_30.json
cp bench_diag_only.json /tmp/m_scale_diag_30.json
rm -f bench_only.json bench_diag_only.json
python3 tools/merge_scaling.py SCALING_r15.json SCALING_r15_diag.json \
  SCALING_r14.json SCALING_r14_diag.json \
  30:/tmp/m_scale_rec_30.json:/tmp/m_scale_diag_30.json \
  100:/tmp/m_scale_rec_100.json:/tmp/m_scale_diag_100.json \
  "--note=1x/3x/10x carried: the r15 bytes-aware sizing rule returns the identical core-count conf at those sizes and no r15 engine diff touches these queries' plans; ALL 30x/100x points re-measured fresh under the sized session (x30 -> ~71 initial partitions, x100 -> ~235)"

echo "== step 4: shuffle-partition sweep at 100x, 3 forked rounds =="
# verdict item 4: the five-point sweep re-emitted at the bench-standard 3
# rounds; shuffle_sweep_report.py now carries the ForkedRounds guard
# fields (rounds_discarded / discarded_totals / residual flag) per point
# and stamps the machine-readable cold-cache basis token. Pinning still
# disables AQE coalescing AND the sizing heuristic (pinned wins).
for P in 32 64 128 256 512; do
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$P \
    SPARK_GRAFT_ONLY="t25_char_spans" \
    SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 \
    SPARK_GRAFT_ROUND_TIMEOUT_MIN=120 \
    SPARK_GRAFT_RECORD="/tmp/m_shufsweep_$P.json" \
    sbt -batch "runMain graft.Bench" > "/tmp/m_shufsweep_$P.log" 2>&1
  cp bench_diag_only.json "/tmp/m_shufsweep_diag_$P.json"
done
python3 tools/shuffle_sweep_report.py shufflesweep100.json 32 64 128 256 512
rm -f bench_diag_only.json

echo "== step 5: full forked bench (5 rounds, 133 queries) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/m_bench_full.log 2>&1

echo "== step 6: multi-JVM cluster verify (133 queries) =="
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_cluster" \
  > /tmp/m_clusterverify.log 2>&1
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_cluster \
  --json clusterverify.json >> /tmp/m_clusterverify.log 2>&1

echo "== step 7: stateful streaming under multi-JVM executors (+grid row) =="
# re-run (verdict item 8): the fixed-cadence LOCF ticker joins the
# identity matrix — 5 paths x both state backends x two topologies.
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.ClusterStream" \
  > /tmp/m_clusterstream.log 2>&1

echo "ALL MEASUREMENTS DONE"
