#!/bin/bash
# sf10 full-contract oracle pass (r18 verdict #1): the entire 144-query
# driver contract at the sf10 tier, under the fresh-process protocol the
# r18 sf3 pass established (one DuckDB process per batch; INFEASIBLE is
# only trusted from a fresh process — a poisoned connection misreports
# later queries, CORRECTNESS_sf3_r18.md "protocol bug").
#
# SKIP carries the 14 r16/r18-adjudicated naive-baseline exhaustions
# forward: each was INFEASIBLE/TIMEOUT at sf3 (a strictly smaller tier,
# same oracle SQL — comment-only diffs since — and deterministic GenData
# bytes), so re-burning hours of known-abort DuckDB runs buys nothing.
# Engine outputs for all 14 exist at sf10 (Verify writes them).
#
# Phases:
#   1. cheap batches — 3 parallel fresh-process workers, 12 queries each,
#      25GB/8 threads/1200s, isolated spill dirs (shared .tmp aborts).
#   2. HEAVY serial — one fresh process PER QUERY at 60GB/24 threads/3600s
#      (the sf3-measured budget envelope). The three NEW r19 queries
#      (semantic_decontamination_auto/_fixedeval, decontamination_fixedeval)
#      have never run at any big tier — they get first-attempt budget rows
#      here, not carried verdicts.
set -u
cd "$(dirname "$0")/.."
TIER=${TIER:-testdata-sf10.0}
OUT=${OUT:-/tmp/verify_sf10_r19}
LOGDIR=${LOGDIR:-/tmp/oracle_sf10_r19}
mkdir -p "$LOGDIR"

SKIP="dedup_components,dedup_components_star,doc_pagerank,doc_pagerank_seeded"
SKIP="$SKIP,events_near_errors,minhash_dup_pairs,triangle_counts,decontamination"
SKIP="$SKIP,cluster_safe_splits,minhash_incremental,jaccard_prefix_pairs,corpus_curation"
SKIP="$SKIP,lsh_candidates_md5,customer_fuzzy_pairs"

HEAVY="semantic_decontamination semantic_decontamination_auto"
HEAVY="$HEAVY semantic_decontamination_fixedeval semantic_decontamination_lsh"
HEAVY="$HEAVY decontamination_fixedeval span_clean_docs containment_pairs"
HEAVY="$HEAVY ngram_jaccard simhash_md5_pairs embedding_neardup"
HEAVY="$HEAVY embedding_neardup_incremental customer_snm_pairs dup_ngram_fraction"

# everything in the dump that is neither SKIP nor HEAVY goes to batches
ls "$OUT" | grep -v oracle_sql > "$LOGDIR/all.txt"
python3 - "$LOGDIR" "$SKIP" "$HEAVY" <<'EOF'
import sys
logdir, skip, heavy = sys.argv[1], set(sys.argv[2].split(',')), set(sys.argv[3].split())
names = [l.strip() for l in open(f"{logdir}/all.txt") if l.strip()]
cheap = [n for n in names if n not in skip and n not in heavy]
B = 12
batches = [cheap[i:i+B] for i in range(0, len(cheap), B)]
for i, b in enumerate(batches):
    open(f"{logdir}/batch{i}.txt", "w").write(",".join(b))
print(f"{len(cheap)} cheap queries in {len(batches)} batches; "
      f"{len(heavy)} heavy; {len(skip)} skipped (carried)")
EOF

run_batch() {  # $1 = batch file, $2 = worker id
  local only; only=$(cat "$1")
  ORACLE_ONLY="$only" ORACLE_THREADS=8 ORACLE_MEM_LIMIT=25GB \
  ORACLE_TMP="/tmp/duckspill_r19_$2" ORACLE_MAX_TMP=25GB \
  ORACLE_TIMEOUT_S=1200 \
  python3 -u tools/check_oracle.py "$TIER" "$OUT" \
    > "$LOGDIR/$(basename "$1" .txt).log" 2>&1
}

# phase 1: 3 workers drain the batch queue
i=0
for f in "$LOGDIR"/batch*.txt; do
  run_batch "$f" $((i % 3)) &
  pids[$((i % 3))]=$!
  i=$((i + 1))
  if [ $((i % 3)) -eq 0 ]; then wait; fi
done
wait
echo "=== phase 1 (cheap batches) done ==="

# phase 2: heavies, one fresh process each, serial
for q in $HEAVY; do
  echo "--- heavy: $q"
  ORACLE_ONLY="$q" ORACLE_THREADS=24 ORACLE_MEM_LIMIT=60GB \
  ORACLE_TMP=/tmp/duckspill_r19_heavy ORACLE_MAX_TMP=60GB \
  ORACLE_TIMEOUT_S=3600 \
  python3 -u tools/check_oracle.py "$TIER" "$OUT" \
    > "$LOGDIR/heavy_$q.log" 2>&1
  tail -2 "$LOGDIR/heavy_$q.log"
done
echo "=== phase 2 (heavy serial) done ==="
grep -h -E "^(OK|FAIL|TIMEOUT|INFEASIBLE)" "$LOGDIR"/*.log | sort | uniq > "$LOGDIR/summary.txt"
wc -l "$LOGDIR/summary.txt"
