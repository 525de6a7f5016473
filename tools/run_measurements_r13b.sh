#!/bin/bash
# r13 follow-on: the post-scaling steps of tools/run_measurements.sh,
# reordered so the highest-value records (streambench bands, clusterstream
# identity, the 512k state point) land first — the cold-cache basis made
# the 100x steps pricier than r12, and committing artifacts step-by-step
# beats an all-or-nothing tail. Run AFTER step 3 (scaling) of the main
# script has written SCALING_r13.json.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32

echo "== step 4: streambench throughput (forked rounds, r13) =="
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.StreamBench" \
  > /tmp/m_streambench.log 2>&1

echo "== step 9: stateful streaming under multi-JVM executors (r13) =="
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.ClusterStream" \
  > /tmp/m_clusterstream.log 2>&1

echo "== step 5: capped-heap statesweep (262k/512k/1M x heap/rocksdb, -Xmx2g) =="
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
cp bench_diag_only.json clusterbench_diag.json
rm -f bench_diag_only.json

echo "== step 8b: capped-executor multi-JVM at 100x (3 rounds) =="
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

echo "== step 8a: capped-executor multi-JVM composition (char family, x10) =="
SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,4,2304]' \
  SPARK_GRAFT_EXEC_MEM=2g SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x10 SPARK_GRAFT_RUNS=3 \
  SPARK_GRAFT_RECORD=clustermem.json SPARK_GRAFT_ROUND_TIMEOUT_MIN=45 \
  SPARK_GRAFT_ONLY="t25_char_spans,t26_winnowed_spans,t27_char_redaction" \
  sbt -batch "runMain graft.Bench" > /tmp/m_clustermem.log 2>&1
rm -f bench_diag_only.json

echo "== step 10: shuffle-partition sweep at 100x (t25) =="
# t25 only: under the r13 cold-cache basis each 100x pass costs ~2x the
# r12 number, so the sweep runs the canonical spiller (t27 shares t25's
# detection plan + splice; t26 winnowed has no spill to sweep)
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
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_STREAM_N=100000 SPARK_GRAFT_DISTURB_FACTOR=1.02 \
  sbt -batch "runMain graft.StreamBench" > /tmp/m_streamguard.log 2>&1

echo "ALL MEASUREMENTS DONE"
