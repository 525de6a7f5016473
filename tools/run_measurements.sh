#!/bin/bash
# Round-10 serialized measurement pipeline (r13 shape) — each step runs alone
# so no two Spark workloads contend (concurrent runs poison both measurements).
#
# r13 changes: the bench's timed rounds now run on a COLD Spark cache
# (warmup-materialized DISK_ONLY sets are cleared before every timed pass),
# so char-family numbers move vs r12 BY DESIGN — the timed cost now includes
# the priced set's persist write + count job, the honest single-shot basis.
# statesweep + batchsweep + memsweep are NOT re-run this round: their code
# paths and inputs are untouched since r12 (the sweeps run each query in a
# cold child JVM with no warmup pass, so the cache-basis fix does not apply
# to them; the t8 bytesPerRow refactor evaluates to the same 160 bytes).
# Everything whose basis DID change (bench, scaling, streambench, capped
# statesweep — new 512k point — and every cluster record) is re-measured.
set -e
cd /root/repo
# Bench rows run at local[32] (the driver contract); the stream benches keep
# the r9 basis of local[4] — comparability over core count.
export SPARK_GRAFT_CPUS=32

echo "== step 1: full forked bench (5 rounds) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/m_bench_full.log 2>&1

echo "== step 2: rebuild scale slices =="
rm -rf /tmp/graft_scale
mkdir -p /tmp/graft_scale/x3 /tmp/graft_scale/x10 /tmp/graft_scale/x30 \
  /tmp/graft_scale/x100
python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/graft_scale/x3 3 \
  > /tmp/m_scale3.log 2>&1
python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/graft_scale/x10 10 \
  > /tmp/m_scale10.log 2>&1
python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/graft_scale/x30 30 \
  > /tmp/m_scale30.log 2>&1
# x100 (~2.3 GB) added r12: far enough out to catch the collision-regime
# saturation and the single-box spill onset the 30x record could not see
python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/graft_scale/x100 100 \
  > /tmp/m_scale100.log 2>&1

echo "== step 3: scaling subset benches =="
# t20 added r13 so the 30x extension set has 1x/3x/10x anchors for its slope
Q="a1_trade_batch_stats,a5_rolling_stats,a5b_rolling_stats_bucketed,a7_prediction_rollup,d4_feature_corr,j1_asof_outcomes,j1c_asof_merge_exec,j5_star_join_revenue,t10_neardup_clusters,t14b_bpe_packing,t14c_bpe_vocab,t20_bigram_pmi,t21_bigram_ppl,t23_repeated_spans,t24_span_redaction,t25_char_spans,t26_winnowed_spans,t27_char_redaction,t3_lsh_neardup_pairs,v15_semantic_dedup,w9_ewma_macd,w9b_ewma_macd_bucketed,x_v11_ivfpq,x_v12_ivfpq_index,x_v13_index_rerank,x_v4_ann_ivf"
for sz in "1:/root/testdata/sf0.1" "3:/tmp/graft_scale/x3" "10:/tmp/graft_scale/x10"; do
  k="${sz%%:*}"; dir="${sz#*:}"
  # scale the child-round watchdog with the slice size: a legitimately slow
  # x10 round past the 20-min default would be destroyForcibly'd and set -e
  # would silently abort the whole pipeline
  SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR="$dir" \
    SPARK_GRAFT_ROUND_TIMEOUT_MIN=$((20 + 6 * k)) \
    sbt -batch "runMain graft.Bench" > "/tmp/m_scalebench_$k.log" 2>&1
  cp bench_only.json "/tmp/m_scale_rec_$k.json"
  # r12: subset runs also emit per-query pressure metrics (spill/shuffle
  # bytes) — kept per size for scaling-tail attribution
  cp bench_diag_only.json "/tmp/m_scale_diag_$k.json"
done
# 30x extension past the char family (r13, verdict item 3): the 8 heaviest /
# most regime-prone non-char queries join t25/t26/t27 at 30x — r12's lesson
# is that regimes (collision, spill) announce themselves only past 10x.
Q30="t21_bigram_ppl,t14b_bpe_packing,t14c_bpe_vocab,t20_bigram_pmi,d4_feature_corr,j5_star_join_revenue,x_v12_ivfpq_index,t10_neardup_clusters,t25_char_spans,t26_winnowed_spans,t27_char_redaction"
SPARK_GRAFT_ONLY="$Q30" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR="/tmp/graft_scale/x30" \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=60 \
  sbt -batch "runMain graft.Bench" > /tmp/m_scalebench_30.log 2>&1
cp bench_only.json /tmp/m_scale_rec_30.json
cp bench_diag_only.json /tmp/m_scale_diag_30.json
# 100x stays char-only (the one family whose spill onset lives there)
SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction" \
  SPARK_GRAFT_RUNS=3 SPARK_GRAFT_SF_DIR="/tmp/graft_scale/x100" \
  SPARK_GRAFT_ROUND_TIMEOUT_MIN=120 \
  sbt -batch "runMain graft.Bench" > /tmp/m_scalebench_100.log 2>&1
cp bench_only.json /tmp/m_scale_rec_100.json
cp bench_diag_only.json /tmp/m_scale_diag_100.json
python3 tools/scaling_report.py SCALING_r13.json \
  1:/tmp/m_scale_rec_1.json 3:/tmp/m_scale_rec_3.json 10:/tmp/m_scale_rec_10.json \
  30:/tmp/m_scale_rec_30.json 100:/tmp/m_scale_rec_100.json
# commit the pressure evidence behind the slope attribution (min-wall round
# per query per size: wall/cpu/gc/shuffle/spill) — SCALE.md quotes it
python3 tools/scale_diag_report.py SCALING_r13_diag.json \
  1:/tmp/m_scale_diag_1.json 3:/tmp/m_scale_diag_3.json 10:/tmp/m_scale_diag_10.json \
  30:/tmp/m_scale_diag_30.json 100:/tmp/m_scale_diag_100.json
rm -f bench_only.json bench_diag_only.json

echo "== step 4: streambench throughput (forked rounds, r13) =="
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.StreamBench" \
  > /tmp/m_streambench.log 2>&1

echo "== step 5: capped-heap statesweep (262k/512k/1M x heap/rocksdb, -Xmx2g) =="
# CPUS=4 pins the children to the statesweep basis (the global 32 export
# would leak through the forked child env). 524288 added r13 to bisect the
# on-heap OOM boundary.
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_STATE_CAPPED=1 sbt -batch "runMain graft.StreamBench" \
  > /tmp/m_statecapped.log 2>&1

echo "== step 7: multi-JVM cluster verify + bench (top 40) =="
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_cluster" \
  > /tmp/m_clusterverify.log 2>&1
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_cluster \
  --json clusterverify.json >> /tmp/m_clusterverify.log 2>&1
# slice widened r13 (verdict item 5): the top 40 by THIS round's committed
# bench_full medians, derived from the step-1 record so a ranking shift can
# never strand the list, plus the char family (shuffle-richest) if it fell
# out. 2 forked rounds — enough for a band; correctness for all 131 is the
# clusterverify gate above.
TOP40=$(python3 -c "
import json
d = json.load(open('bench_full.json'))
qs = [k for k, _ in sorted(d['queries'].items(), key=lambda kv: -kv[1])[:40]]
for must in ['t25_char_spans', 't26_winnowed_spans', 't27_char_redaction']:
    if must not in qs:
        qs.append(must)
print(','.join(qs))")
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
  SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_RUNS=2 \
  SPARK_GRAFT_RECORD=clusterbench.json SPARK_GRAFT_ROUND_TIMEOUT_MIN=40 \
  SPARK_GRAFT_ONLY="$TOP40" \
  sbt -batch "runMain graft.Bench" > /tmp/m_clusterbench.log 2>&1
# the diag is the committed evidence for executor-side CPU/GC in cluster
# mode (r13, verdict item 6): task_cpu_ms/task_gc_ms are summed from task
# metrics, so they price the EXECUTORS, not the driver
cp bench_diag_only.json clusterbench_diag.json
rm -f bench_diag_only.json

echo "== step 8: capped-executor multi-JVM composition (char family, x10) =="
# the two axes composed: capped REMOTE executors must drive the size-aware
# join's guarded decision (its budget reads spark.executor.memory) — and two
# 2 GiB executors should hold what memsweep's one 2 GiB JVM spilled
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,4,2304]' \
  SPARK_GRAFT_EXEC_MEM=2g SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x10 SPARK_GRAFT_RUNS=3 \
  SPARK_GRAFT_RECORD=clustermem.json SPARK_GRAFT_ROUND_TIMEOUT_MIN=45 \
  SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction" \
  sbt -batch "runMain graft.Bench" > /tmp/m_clustermem.log 2>&1
# keep the x10 diag before the 100x loop overwrites bench_diag_only.json
cp bench_diag_only.json clustermem_diag.json
# same composition at the 100x point, where even local[32]'s 128 GiB JVM
# spills: capped executors parallelize the spill across independent memory
# managers. RUNS raised 2 -> 3 (r13, verdict item 4): the r12 records'
# round variance at 100x (t27 median 54.0 vs min 42.3) was too wide for a
# 2-round headline number.
for ncfg in "4:16:clustermem100.json" "8:32:clustermem100_n8.json"; do
  n="${ncfg%%:*}"; rest="${ncfg#*:}"; cores="${rest%%:*}"; rec="${rest#*:}"
  SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER="local-cluster[$n,4,2304]" \
    SPARK_GRAFT_EXEC_MEM=2g SPARK_GRAFT_CPUS="$cores" \
    SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 SPARK_GRAFT_RUNS=3 \
    SPARK_GRAFT_RECORD="$rec" SPARK_GRAFT_ROUND_TIMEOUT_MIN=90 \
    SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction" \
    sbt -batch "runMain graft.Bench" > "/tmp/m_clustermem100_$n.log" 2>&1
  cp bench_diag_only.json "${rec%.json}_diag.json"
done
rm -f bench_diag_only.json

echo "== step 9: stateful streaming under multi-JVM executors (r13) =="
# four stateful paths x both state backends, local[4] vs local-cluster,
# output-identity fingerprints + rates -> clusterstream.json. CPUS=4 pins
# the local baseline to the streambench basis (the global 32 export would
# both skew the comparison and smoke-name the record).
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.ClusterStream" \
  > /tmp/m_clusterstream.log 2>&1

echo "== step 10: shuffle-partition sweep at 100x (t25, the spiller) =="
# TODO #1 / verdict item 4: per-partition working set = shuffle bytes /
# partition count; sweeping the PINNED count (AQE coalescing off — see
# Bench.buildSession) locates the no-spill knee on one box, the single-box
# stand-in for adding executors. t25 only: t26 winnowed has no spill to
# sweep, and t27 shares t25's detection plan (the spilling stage); under
# the r13 cold-cache basis each 100x pass costs ~2x the r12 number, so the
# sweep runs the canonical spiller at three log-spaced counts. 2 forked
# rounds per point for the diag record (spill/shuffle bytes live in
# bench_diag_only.json).
for P in 32 128 512; do
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$P \
    SPARK_GRAFT_ONLY="t25_char_spans" \
    SPARK_GRAFT_RUNS=2 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x100 \
    SPARK_GRAFT_ROUND_TIMEOUT_MIN=120 \
    SPARK_GRAFT_RECORD="/tmp/m_shufsweep_$P.json" \
    sbt -batch "runMain graft.Bench" > "/tmp/m_shufsweep_$P.log" 2>&1
  cp bench_diag_only.json "/tmp/m_shufsweep_diag_$P.json"
done
python3 tools/shuffle_sweep_report.py shufflesweep100.json 32 128 512
rm -f bench_diag_only.json

echo "== step 11: streambench disturbance-guard validation =="
# the r11 bench validation pattern, now for the streaming harness: a
# near-1.0 factor makes natural round jitter trip the discard path, so the
# committed smoke record demonstrates the guard discarding + re-forking
# (rounds_discarded > 0) without needing a deliberately-loaded box
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_STREAM_N=100000 SPARK_GRAFT_DISTURB_FACTOR=1.02 \
  sbt -batch "runMain graft.StreamBench" > /tmp/m_streamguard.log 2>&1

echo "ALL MEASUREMENTS DONE"
