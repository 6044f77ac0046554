#!/bin/bash
# Round-10 evidence chain: bring every committed scale artifact up to
# HEAD with the honest (noop-sink) bench — the r9 verdict's top item.
# Spark timing steps are serialized (no two Spark jobs share the box);
# DuckDB prechecks may overlap the NEXT Spark step only where no timing
# claim is being made.
#
# Produces: FALLBACK_sf1.txt, BENCH_sf1.json, BENCH_sf10.json,
#           CORRECTNESS_sf1.txt, CORRECTNESS_sf10.txt
set -x
cd /root/repo

# A: codegen honesty sweep at sf1 (the r9 FallbackSweep caught a real
# silent-interpretation bug only visible at scale-shaped plans).
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.FallbackSweep data/sf1" \
  2>/dev/null | grep -E '^(OK|FALLBACK)' > FALLBACK_sf1.txt
echo A_DONE >> /tmp/chain.status

# B: sf1 bench artifact (full registry, noop-sink action, 1 timed pass)
SPARK_GRAFT_SF_DIR=data/sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1.log 2>&1
echo B_DONE >> /tmp/chain.status

# C: sf1 correctness dump
rm -rf /tmp/verify_sf1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_sf1" \
  > /tmp/verify_sf1.log 2>&1
echo C_DONE >> /tmp/chain.status

# C2 (background, no timing claims downstream until D): sf1 compare
( python3 scripts/precheck_scale.py data/sf1 /tmp/verify_sf1 1800 \
    > /tmp/correctness_sf1.txt 2>&1
  cp /tmp/correctness_sf1.txt CORRECTNESS_sf1.txt
  echo C2_DONE >> /tmp/chain.status ) &
C2_PID=$!

# D: sf10 bench artifact — the 100x rehearsal. Wait for the sf1
# precheck first: the bench is a TIMING claim and must own the box.
wait $C2_PID
SPARK_GRAFT_SF_DIR=data/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf10.log 2>&1
echo D_DONE >> /tmp/chain.status

# E: sf10 correctness dump
rm -rf /tmp/verify_sf10
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf10 /tmp/verify_sf10" \
  > /tmp/verify_sf10.log 2>&1
echo E_DONE >> /tmp/chain.status

# E2: sf10 DuckDB compare, 2-way sharded -> CORRECTNESS_sf10.txt
# (per-worker memory bounded; spill dirs are per-pid since r10)
PRECHECK_DUCKDB_MEM=40GiB python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10 1800 0 2 \
  > /tmp/correctness_sf10_s0.txt 2>&1 &
PRECHECK_DUCKDB_MEM=40GiB python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10 1800 1 2 \
  > /tmp/correctness_sf10_s1.txt 2>&1 &
wait
cat /tmp/correctness_sf10_s0.txt /tmp/correctness_sf10_s1.txt > CORRECTNESS_sf10.txt
echo E2_DONE >> /tmp/chain.status
