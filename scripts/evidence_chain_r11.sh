#!/bin/bash
# Round-11 evidence chain: same artifact set as r10 (FALLBACK_sf1.txt,
# BENCH_sf1.json, BENCH_sf10.json, CORRECTNESS_sf1.txt) PLUS the step
# that slipped rounds 8-10: CORRECTNESS_sf10.txt. Spark timing steps are
# serialized (no two Spark jobs share the box); DuckDB prechecks never
# overlap a TIMED step.
#
# Every step is recorded in the COMMITTED status file CHAIN_STATUS.txt,
# and a step is marked DONE only when its artifact actually exists and
# is non-empty at mark time — the ledger (COVERAGE.md) cites that file
# verbatim, so it structurally cannot reference an artifact that was
# never produced (the r10 "see below" with no below).
set -x
cd /root/repo

STATUS=CHAIN_STATUS.txt
STEPS="A:FALLBACK_sf1.txt B:BENCH_sf1.json C:/tmp/verify_sf1/oracle_sql.json \
C2:CORRECTNESS_sf1.txt D:BENCH_sf10.json E:/tmp/verify_sf10/oracle_sql.json \
E2:CORRECTNESS_sf10.txt"

init_status() {
  { echo "# Evidence-chain r11 step ledger (scripts/evidence_chain_r11.sh)."
    echo "# DONE is written only after the step's artifact exists non-empty;"
    echo "# anything else is the honest state of that step."
    for s in $STEPS; do
      echo "${s%%:*} ${s#*:} NOT-RUN -"
    done
  } > "$STATUS"
}

mark() { # mark <step> <artifact>  -> DONE iff artifact exists non-empty
  local step=$1 art=$2 st=FAILED
  [ -s "$art" ] && st=DONE
  local ts; ts=$(date -u +%Y-%m-%dT%H:%M:%SZ)
  # rewrite the step's line in place; the file stays one-line-per-step
  sed -i "s|^$step .*|$step $art $st $ts|" "$STATUS"
}

init_status

# A: codegen honesty sweep at sf1 (r9's FallbackSweep caught a real
# silent-interpretation bug only visible at scale-shaped plans).
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.FallbackSweep data/sf1" \
  2>/dev/null | grep -E '^(OK|FALLBACK)' > FALLBACK_sf1.txt
mark A FALLBACK_sf1.txt

# B: sf1 bench artifact (full registry, noop-sink action, 1 timed pass)
SPARK_GRAFT_SF_DIR=data/sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1.log 2>&1
mark B BENCH_sf1.json

# C: sf1 correctness dump
rm -rf /tmp/verify_sf1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_sf1" \
  > /tmp/verify_sf1.log 2>&1
mark C /tmp/verify_sf1/oracle_sql.json

# C2 (background; joined before D — the next step is a TIMING claim and
# must own the box): sf1 compare, single worker, default budgets.
( python3 scripts/precheck_scale.py data/sf1 /tmp/verify_sf1 1800 \
    > /tmp/correctness_sf1.txt 2>&1
  cp /tmp/correctness_sf1.txt CORRECTNESS_sf1.txt ) &
C2_PID=$!
wait $C2_PID
mark C2 CORRECTNESS_sf1.txt

# D: sf10 bench artifact — the 100x rehearsal.
SPARK_GRAFT_SF_DIR=data/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf10.log 2>&1
mark D BENCH_sf10.json

# E: sf10 correctness dump
rm -rf /tmp/verify_sf10
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf10 /tmp/verify_sf10" \
  > /tmp/verify_sf10.log 2>&1
mark E /tmp/verify_sf10/oracle_sql.json

# E2: sf10 DuckDB compare, 2-way sharded -> CORRECTNESS_sf10.txt.
# Spill sizing is computed from MEASURED free disk, not assumed: the r10
# attempt ran 2 workers x 40GiB default spill on a 38GiB-free disk and
# filled it mid-oracle. Each worker gets (free - 12GiB headroom) / 2,
# clamped to [8, 26] GiB. Memory: the box has 125 GiB, so each worker
# gets a 40 GiB DuckDB limit (the r11 rehearsal showed the minhash-
# family oracles dying at 20 GiB) — bounded so the OS OOM killer never
# preempts DuckDB's own spill path, generous so spill is the exception.
AVAIL_GB=$(( $(df --output=avail -k / | tail -1) / 1048576 ))
PER_WORKER_GB=$(( (AVAIL_GB - 12) / 2 ))
[ "$PER_WORKER_GB" -lt 8 ] && PER_WORKER_GB=8
[ "$PER_WORKER_GB" -gt 26 ] && PER_WORKER_GB=26
PRECHECK_DUCKDB_MEM=40GiB PRECHECK_DUCKDB_TMP=${PER_WORKER_GB}GiB \
  python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10 1800 0 2 \
  > /tmp/correctness_sf10_s0.txt 2>&1 &
PRECHECK_DUCKDB_MEM=40GiB PRECHECK_DUCKDB_TMP=${PER_WORKER_GB}GiB \
  python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10 1800 1 2 \
  > /tmp/correctness_sf10_s1.txt 2>&1 &
wait
cat /tmp/correctness_sf10_s0.txt /tmp/correctness_sf10_s1.txt > CORRECTNESS_sf10.txt

# E3: serial retry of oracle-resource rows with the WHOLE disk budget —
# a RESOURCE/ORACLE-DIED verdict means the oracle couldn't testify at
# the per-shard budget, not that it can't testify at all (the r11
# rehearsal flipped dedup_embedding_lsh_planned this way). TIMEOUT rows
# are NOT retried: those are the documented-quadratic oracle twins,
# out of regime at any budget.
RETRY=$(grep -E '^(RESOURCE|ORACLE-DIED)' CORRECTNESS_sf10.txt | awk '{print $2}')
if [ -n "$RETRY" ]; then
  rm -rf /tmp/verify_sf10_retry && mkdir -p /tmp/verify_sf10_retry
  RETRY_NAMES="$RETRY" python3 - <<'PY'
import json, os
names = os.environ["RETRY_NAMES"].split()
oracle = json.load(open('/tmp/verify_sf10/oracle_sql.json'))
with open('/tmp/verify_sf10_retry/oracle_sql.json', 'w') as f:
    json.dump({n: oracle[n] for n in names}, f)
for n in names:
    os.symlink(f'/tmp/verify_sf10/{n}', f'/tmp/verify_sf10_retry/{n}')
PY
  AVAIL_GB=$(( $(df --output=avail -k / | tail -1) / 1048576 ))
  PRECHECK_DUCKDB_MEM=40GiB PRECHECK_DUCKDB_TMP=$((AVAIL_GB - 8))GiB \
    PRECHECK_DUCKDB_THREADS=24 \
    python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10_retry 2700 \
    > /tmp/correctness_sf10_retry.txt 2>&1
  { echo
    echo "# E3 serial retry of the oracle-resource rows above, one worker,"
    echo "# full disk budget (the sharded verdicts for these names are"
    echo "# superseded by the rows below):"
    cat /tmp/correctness_sf10_retry.txt
  } >> CORRECTNESS_sf10.txt
fi
mark E2 CORRECTNESS_sf10.txt
