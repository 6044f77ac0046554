#!/bin/bash
# Round-12 evidence chain. Differences from r11:
#  - E2 (CORRECTNESS_sf10.txt — four rounds overdue) runs FIRST, from the
#    r11-HEAD sf10 verify dump that survived in /tmp/verify_sf10: the compare
#    is DuckDB-only and needs no Spark. The artifact therefore certifies the
#    r11-HEAD engine results at sf10; r12's semantic identity to r11 is
#    separately proven by (a) oracle equality at sf0.001/sf0.01 for every
#    changed query and (b) step F below: a FRESH sf10 verify+compare of
#    exactly the queries r12 touched.
#  - Step order puts all DuckDB compares away from TIMED steps (B, D, B8).
#  - B8: an 8-core sf1 bench for the scaling probe VERDICT #9 asked for
#    (at sf0.1 the core-ratio carries no signal).
set -x
cd /root/repo

# Optional step filter: RUN_STEPS="E2 A B" bash scripts/evidence_chain_r12.sh
# runs only those steps (status rows for other steps are left untouched, and
# init_status is skipped when CHAIN_STATUS.txt already carries the r12 header).
RUN_STEPS=${RUN_STEPS:-"E2 A B B8 C C2 D F"}
runs() { case " $RUN_STEPS " in *" $1 "*) return 0;; *) return 1;; esac; }

STATUS=CHAIN_STATUS.txt
mark() { # mark <step> <artifact>  -> DONE iff artifact exists non-empty
  local step=$1 art=$2 st=FAILED
  [ -s "$art" ] && st=DONE
  local ts; ts=$(date -u +%Y-%m-%dT%H:%M:%SZ)
  grep -q "^$step " "$STATUS" \
    && sed -i "s|^$step .*|$step $art $st $ts|" "$STATUS" \
    || echo "$step $art $st $ts" >> "$STATUS"
}

init_status() {
  { echo "# Evidence-chain r12 step ledger (scripts/evidence_chain_r12.sh)."
    echo "# DONE is written only after the step's artifact exists non-empty;"
    echo "# anything else is the honest state of that step."
    echo "# E2 compares the r11-HEAD sf10 dump (see header comment); step F"
    echo "# re-verifies the r12-touched queries at sf10 against fresh Spark"
    echo "# results, closing the code-version gap."
    for s in "E2:CORRECTNESS_sf10.txt" "A:FALLBACK_sf1.txt" "B:BENCH_sf1.json" \
      "C:/tmp/verify_sf1/oracle_sql.json" "C2:CORRECTNESS_sf1.txt" \
      "D:BENCH_sf10.json" "F:CORRECTNESS_sf10_r12subset.txt" \
      "B8:BENCH_sf1_c8.json"; do
      echo "${s%%:*} ${s#*:} NOT-RUN -"
    done
  } > "$STATUS"
}

if grep -q "evidence_chain_r12" "$STATUS" 2>/dev/null; then :; else init_status; fi

if runs E2; then
# ---- E2: sf10 DuckDB compare from the surviving r11 dump, 2-way sharded.
# Spill/memory sizing copied from r11's measured-free-disk rule.
if [ -s /tmp/verify_sf10/oracle_sql.json ]; then
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
  { echo "# sf10 correctness: DuckDB oracle vs the r11-HEAD (22b5fdb) Spark"
    echo "# verify dump (/tmp/verify_sf10, produced 2026-08-17). r12's changed"
    echo "# queries are re-proven at sf10 in CORRECTNESS_sf10_r12subset.txt."
    cat /tmp/correctness_sf10_s0.txt /tmp/correctness_sf10_s1.txt
  } > CORRECTNESS_sf10.txt
  # serial retry of oracle-resource rows with the whole disk budget
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
      echo "# serial retry of the oracle-resource rows above, one worker,"
      echo "# full disk budget (the sharded verdicts for these names are"
      echo "# superseded by the rows below):"
      cat /tmp/correctness_sf10_retry.txt
    } >> CORRECTNESS_sf10.txt
  fi
fi
mark E2 CORRECTNESS_sf10.txt
fi

if runs A; then
# ---- A: codegen honesty sweep at sf1 (r12 HEAD)
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.FallbackSweep data/sf1" \
  2>/dev/null | grep -E '^(OK|FALLBACK)' > FALLBACK_sf1.txt
mark A FALLBACK_sf1.txt
fi

if runs B; then
# ---- B: sf1 bench artifact at r12 HEAD (cache-honest harness)
SPARK_GRAFT_SF_DIR=data/sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1.log 2>&1
mark B BENCH_sf1.json
fi

if runs B8; then
# ---- B8: 8-core sf1 bench — the scaling probe (VERDICT #9)
SPARK_GRAFT_SF_DIR=data/sf1 SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1_c8.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1_c8.log 2>&1
mark B8 BENCH_sf1_c8.json
fi

if runs C; then
# ---- C: fresh sf1 verify dump at r12 HEAD
rm -rf /tmp/verify_sf1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_sf1" \
  > /tmp/verify_sf1.log 2>&1
mark C /tmp/verify_sf1/oracle_sql.json
fi

if runs C2; then
# ---- C2: sf1 compare, single worker, default budgets
python3 scripts/precheck_scale.py data/sf1 /tmp/verify_sf1 1800 \
  > /tmp/correctness_sf1.txt 2>&1
cp /tmp/correctness_sf1.txt CORRECTNESS_sf1.txt
mark C2 CORRECTNESS_sf1.txt
fi

if runs D; then
# ---- D: sf10 bench artifact at r12 HEAD — the 100x rehearsal
SPARK_GRAFT_SF_DIR=data/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf10.log 2>&1
mark D BENCH_sf10.json
fi

if runs F; then
# ---- F: fresh sf10 verify + compare of exactly the r12-touched queries —
# proves the r12 code's sf10 results (not just the small SFs) against the
# oracle where E2 could only certify r11's.
R12Q="dedup_components dedup_remove_neardups dedup_leakage_split \
dedup_incremental_neardup text_trigram_backoff pipeline_ccnet text_bigram_lm \
text_ccnet_buckets g3_collect_by_key g4_single_multiplicity g5_distinct_pairs \
ann_recall_eval q_approx_sketches"
rm -rf /tmp/verify_sf10_r12
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify data/sf10 /tmp/verify_sf10_r12 $R12Q" \
  > /tmp/verify_sf10_r12.log 2>&1
AVAIL_GB=$(( $(df --output=avail -k / | tail -1) / 1048576 ))
PRECHECK_DUCKDB_MEM=40GiB PRECHECK_DUCKDB_TMP=$((AVAIL_GB - 8))GiB \
  PRECHECK_DUCKDB_THREADS=24 \
  python3 scripts/precheck_scale.py data/sf10 /tmp/verify_sf10_r12 2700 \
  > CORRECTNESS_sf10_r12subset.txt 2>&1
mark F CORRECTNESS_sf10_r12subset.txt
fi
