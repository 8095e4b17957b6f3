#!/usr/bin/env python3
"""sf3 heap-floor bisect (r17 verdict #3).

The sf3 tier has run at SPARK_DRIVER_MEM=64g since r14 recorded "8g OOMs
at sf3" -- but that note never said WHICH operators need the headroom or
whether their memory demand grows with data (a broadcast eval set or
percentile buffer that scales with sf would be a 100-TB scale-killer
wearing a local[32] disguise). This tool bisects the minimum working heap
per heavy-slice query by running graft.Bench ONE QUERY PER JVM (a task
OOM in local mode can take the whole JVM with it via
SparkUncaughtExceptionHandler, so suite-mode bisection would abort on the
first failure) at ascending -Xmx arms and parsing the bench JSON line.

Outcomes per (query, heap):
  ok:<wall>   -- errors map empty; wall seconds recorded
  error:<cls> -- Bench recorded a per-query error (OOM class names kept)
  exit:<code> -- the forked JVM died before printing the JSON line
                 (uncaught executor OOM -> SparkUncaughtExceptionHandler
                 System.exit)
  timeout     -- exceeded the budget (GC-thrash signature: the heap
                 technically holds but the query is unusable at it)

The per-run budget is max(600 s, 5 x the 64g best-known wall) -- sf3
walls span 2.7..539 s, so a fixed cap would misclassify jaccard.

Usage: python3 tools/heap_audit.py [--heaps=8g,16g,32g,64g]
           [--queries=a,b,c] [--out=PATH]
Writes a JSON ledger (default /tmp/heap_audit_sf3.json) incrementally so
a crash keeps completed rows. Restore bench_reference_testdata-sf3.0.json
from git afterwards: Bench min-forward-merges every run into it, and the
audit's off-cadence heaps must not roll the documented-cadence reference.
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the 26-query sf3 heavy slice (BENCH_sf3.0_r17.json), slowest-first so
# the expensive discoveries land early in the ledger
SLICE = [
    "jaccard_prefix_pairs", "customer_fuzzy_pairs", "corpus_curation",
    "cluster_safe_splits", "doc_pagerank", "minhash_incremental",
    "simhash_md5_pairs", "dedup_components", "semantic_decontamination",
    "dedup_components_star", "doc_pagerank_seeded", "span_clean_docs",
    "minhash_dup_pairs", "triangle_counts", "containment_pairs",
    "ngram_jaccard", "simhash_dup_pairs", "events_near_errors",
    "embedding_neardup", "decontamination", "semantic_decontamination_lsh",
    "doc_canonical_key", "value_resample_daily", "customer_snm_pairs",
    "dedup_exact", "embedding_neardup_incremental",
]

# 64g best-known walls (bench_reference_testdata-sf3.0.json) for budgets
def ref_walls():
    p = os.path.join(REPO, "bench_reference_testdata-sf3.0.json")
    try:
        return json.load(open(p)).get("sec", {})
    except Exception:
        return {}


def run_one(query, heap, budget_s):
    env = dict(os.environ,
               SPARK_DRIVER_MEM=heap,
               SPARK_GRAFT_SF_DIR="testdata-sf3.0",
               SPARK_GRAFT_BENCH_ONLY=query,
               SPARK_GRAFT_BENCH_REPS="1",
               SPARK_GRAFT_CPUS="32")
    t0 = time.time()
    proc = subprocess.Popen(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, preexec_fn=os.setsid, text=True)
    try:
        out, err = proc.communicate(timeout=budget_s)
    except subprocess.TimeoutExpired:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.communicate()
        return {"outcome": "timeout", "budget_s": budget_s,
                "wall_s": round(time.time() - t0, 1)}
    wall = round(time.time() - t0, 1)
    line = None
    for ln in reversed(out.strip().splitlines()):
        if ln.startswith('{"metric"'):
            line = ln
            break
    if proc.returncode != 0 or line is None:
        # keep the last OOM-ish stderr line as the allocation-site hint
        hint = ""
        for ln in reversed((err + "\n" + out).splitlines()):
            if "OutOfMemory" in ln or "GC overhead" in ln \
                    or "Java heap space" in ln:
                hint = ln.strip()[:300]
                break
        return {"outcome": f"exit:{proc.returncode}", "hint": hint,
                "wall_s": wall}
    rec = json.loads(line)
    errs = {k: v for k, v in rec.get("errors", {}).items()
            if not k.startswith("_")}
    if errs:
        hint = ""
        for ln in reversed(err.splitlines()):
            if "OutOfMemory" in ln or "Java heap space" in ln:
                hint = ln.strip()[:300]
                break
        return {"outcome": "error:" + errs.get(query, "?"),
                "hint": hint, "wall_s": wall}
    sec = rec.get("queries", {}).get(query)
    return {"outcome": "ok", "sec": sec, "wall_s": wall}


def main():
    heaps = ["8g", "16g", "32g", "64g"]
    queries = SLICE
    out_path = "/tmp/heap_audit_sf3.json"
    for a in sys.argv[1:]:
        if a.startswith("--heaps="):
            heaps = a.split("=", 1)[1].split(",")
        elif a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    refs = ref_walls()
    ledger = {}
    if os.path.isfile(out_path):  # resume support
        ledger = json.load(open(out_path))
    for q in queries:
        row = ledger.setdefault(q, {})
        budget = max(600, 5 * refs.get(q, 60))
        for heap in heaps:
            if heap in row:
                if row[heap].get("outcome") == "ok":
                    break  # resumed min working heap; skip higher arms
                continue  # resumed non-ok arm; try the next heap
            print(f"[heap_audit] {q} @ {heap} (budget {budget:.0f}s)",
                  flush=True)
            row[heap] = run_one(q, heap, budget)
            print(f"[heap_audit]   -> {row[heap]}", flush=True)
            json.dump(ledger, open(out_path, "w"), indent=1)
            if row[heap]["outcome"] == "ok":
                break  # min working heap found; higher arms follow cadence
    json.dump(ledger, open(out_path, "w"), indent=1)
    # summary table
    print("query | min-heap | walls")
    for q in queries:
        row = ledger.get(q, {})
        ok = [h for h in heaps if row.get(h, {}).get("outcome") == "ok"]
        walls = {h: row[h].get("sec") for h in row}
        print(f"{q} | {ok[0] if ok else 'NONE<=' + heaps[-1]} | {walls}")


if __name__ == "__main__":
    main()
