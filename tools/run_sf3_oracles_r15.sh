#!/bin/bash
# Round-15 sf3 oracle closure (r14 verdict #4): run the six
# previously-not-attempted heavy oracles SERIALLY under the bounded
# protocol from .claude/skills/verify/SKILL.md. Each query gets its own
# row in the log: OK / MISMATCH / INFEASIBLE (resource abort) / TIMEOUT.
# Usage: tools/run_sf3_oracles_r15.sh <verify_out_dir> <logfile>
set -u
OUT=${1:?verify out dir}
LOG=${2:?log file}
cd /root/repo
for q in decontamination semantic_decontamination minhash_incremental \
         corpus_curation cluster_safe_splits jaccard_prefix_pairs; do
  echo "=== $q start $(date -u +%H:%M:%S) ===" >> "$LOG"
  rm -rf /tmp/duckspill_r15
  ORACLE_ONLY=$q ORACLE_THREADS=24 ORACLE_MEM_LIMIT=80GB \
    ORACLE_TMP=/tmp/duckspill_r15 ORACLE_MAX_TMP=55GiB \
    ORACLE_TIMEOUT_S=5400 \
    python3 -u tools/check_oracle.py testdata-sf3.0 "$OUT" >> "$LOG" 2>&1
  rc=$?  # capture BEFORE the date substitution below resets $?
  echo "=== $q end $(date -u +%H:%M:%S) rc=$rc ===" >> "$LOG"
done
rm -rf /tmp/duckspill_r15
echo "ALL DONE" >> "$LOG"
