#!/bin/bash
# sf3 full-contract oracle pass (r17 verdict #4): the ~115 queries that
# had never run at the tier, plus a re-run of the r16 feasible heavies.
# The 12 known budget-exhausted naive baselines (CORRECTNESS_sf3_r16.md:
# recursive-CTE graph, all-pairs minhash/jaccard/curation CTEs,
# naive range join, decontamination scan product) are SKIPPED and carry
# their r16 INFEASIBLE/TIMEOUT adjudications forward -- oracle SQL is
# unchanged since r16 (comment-only SparkEntry diff) and GenData is
# deterministic, so re-burning 6+ hours of known-abort DuckDB runs buys
# nothing. Everything else runs under one bounded worker.
set -u
cd "$(dirname "$0")/.."
SKIP="dedup_components,dedup_components_star,doc_pagerank,doc_pagerank_seeded"
SKIP="$SKIP,events_near_errors,minhash_dup_pairs,triangle_counts,decontamination"
SKIP="$SKIP,cluster_safe_splits,minhash_incremental,jaccard_prefix_pairs,corpus_curation"
mkdir -p /tmp/duckspill_r18
ORACLE_SKIP="$SKIP" \
ORACLE_THREADS=${ORACLE_THREADS:-16} \
ORACLE_MEM_LIMIT=${ORACLE_MEM_LIMIT:-40GB} \
ORACLE_TMP=/tmp/duckspill_r18 \
ORACLE_MAX_TMP=${ORACLE_MAX_TMP:-40GB} \
ORACLE_TIMEOUT_S=${ORACLE_TIMEOUT_S:-1800} \
python3 -u tools/check_oracle.py testdata-sf3.0 /tmp/verify_sf3_r18
