#!/bin/bash
# Round-9 evidence chain: refresh the 10x artifacts (now 164 queries)
# and produce the sf10 correctness artifact the r8 verdict asked for.
# Serialized so no Spark timing run shares the box with another Spark
# job; the DuckDB prechecks may overlap the NEXT Spark step (different
# resource profile, no timing claims).
set -x
cd /root/repo

# A: sf1 bench artifact (full registry, one timed pass like the sf10 run)
SPARK_GRAFT_SF_DIR=data/sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1.log 2>&1
echo A_DONE >> /tmp/chain.status

# B: sf1 correctness dump
rm -rf /tmp/verify_sf1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_sf1" \
  > /tmp/verify_sf1.log 2>&1
echo B_DONE >> /tmp/chain.status

# B2 (background): sf1 DuckDB compare -> CORRECTNESS_sf1.txt
( python3 scripts/precheck_scale.py data/sf1 /tmp/verify_sf1 900 \
    > /tmp/correctness_sf1.txt 2>&1
  cp /tmp/correctness_sf1.txt CORRECTNESS_sf1.txt
  echo B2_DONE >> /tmp/chain.status ) &

# C: sf10 correctness dump
rm -rf /tmp/verify_sf10
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf10 /tmp/verify_sf10" \
  > /tmp/verify_sf10.log 2>&1
echo C_DONE >> /tmp/chain.status

wait  # let the sf1 precheck finish before starting the sf10 one

# C2: sf10 DuckDB compare, 2-way sharded -> CORRECTNESS_sf10.txt
python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10 900 0 2 \
  > /tmp/correctness_sf10_s0.txt 2>&1 &
python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10 900 1 2 \
  > /tmp/correctness_sf10_s1.txt 2>&1 &
wait
cat /tmp/correctness_sf10_s0.txt /tmp/correctness_sf10_s1.txt > CORRECTNESS_sf10.txt
echo C2_DONE >> /tmp/chain.status
