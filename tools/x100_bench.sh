#!/bin/bash
# Round-14 tightened ×100 wall-cell protocol (r13 verdict item 5): the
# single-shot cells moved 3.26×→4.21× (grow) between rounds with no plan
# change — page-cache state, not regression. De-noise: after the fresh
# build, one RUNS=1 pass warms the cache, then the QUOTED pass is
# RUNS=3 (per-query median of 3 in one JVM — the same methodology as the
# ×1 number of record), making a real scale regression distinguishable
# from machine state. Runs serially on an otherwise idle box.
set -euo pipefail
cd /root/repo
OUT=/tmp/x100r14
rm -rf $OUT /tmp/x100r14_x1 /tmp/x100r14_grow /tmp/x100r14_hot
mkdir -p $OUT

sbt -batch \
  "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/x100r14_x1 1 grow" \
  "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/x100r14_grow 100 grow" \
  "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/x100r14_hot 100 hot" \
  2>&1 | tail -2

for world in x1 grow hot; do
  # pass 1: cache warmer (recorded for the cold-vs-warm note)
  SPARK_GRAFT_SF_DIR=/tmp/x100r14_$world SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_OUT=$OUT/${world}_warmup.json \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
  # pass 2 (QUOTED): per-query median-of-3, warm cache
  SPARK_GRAFT_SF_DIR=/tmp/x100r14_$world SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_OUT=$OUT/${world}_median3.json \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
done
# Streaming cell (r18 verdict item 5): the five replay rows are excluded
# from the matrix above (pure harness wall at full ×100 feed volume) and
# instead measured on a SAMPLED FEED — 1-in-10 by session key via
# SampleStreamWorld, which preserves the ×100 world's per-key rate
# structure (hot: every kept user at full ×100 event rate; grow: ×10 key
# cardinality in flight) at a bounded number of replayed rows. Quoted
# pass matches the matrix protocol: RUNS=3 per-query median in one JVM.
STREAMQ="ev10_stream_hourly_replay,ev11_stream_sessions_replay,ev12_stream_dedup_replay,ev13_stream_click_join_replay,t41_stream_ingest_gate"
for world in grow hot; do
  rm -rf /tmp/x100r14_${world}_s10
  sbt -batch "runMain graft.tools.SampleStreamWorld /tmp/x100r14_$world /tmp/x100r14_${world}_s10 10" 2>&1 | tail -3
  SPARK_GRAFT_SF_DIR=/tmp/x100r14_${world}_s10 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY=$STREAMQ SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_OUT=$OUT/${world}_stream_s10.json \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
done

echo "=== results ==="
for f in $OUT/*.json; do
  echo "$f: $(python3 -c "import json,sys;d=json.load(open('$f'));print(d['value'],'sec, failed',d['failed'])")"
done
