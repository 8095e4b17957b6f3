#!/usr/bin/env python3
"""One fresh JVM per query: the suite-pressure-free bench mode.

Why (r14 verdict #7): one-JVM multi-query suites at sf >= 3 inflate
individual walls up to 38x order-dependently (storage/GC debt from
earlier queries lands on later ones — PROBE.md round 14), which cost a
full clean re-measure pass. For REPS=1 first-run tiers the fix is
structural: fork one JVM per query so every wall is measured against a
cold, equal heap. This script IS that tier mode — it drives
`graft.Bench` (unchanged) once per query via SPARK_GRAFT_BENCH_ONLY,
each in its own java process (no sbt in the loop: ~3 s JVM startup vs
~20 s sbt, and the classpath is static), and merges the per-query JSON
lines into one suite-shaped report.

Usage:
  python3 tools/bench_jvm_isolated.py SF_DIR [--reps N] [--cpus N]
      [--mem 8g] [--queries a,b,c] [--out FILE]

Query list defaults to every key in bench_reference_<sf>.json's "sec"
map (the rolling reference the normal bench maintains). Timing runs
need the box EXCLUSIVE, same as any bench.

The per-run bench_detail.json spreads are merged; each run also rolls
the shared bench_reference file forward (min-wins), exactly like a
suite run would.
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mirror build.sbt's jdk17AddOpens — Spark 4.x on JDK 17 outside
# spark-submit needs the module opens injected by hand
ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def classpath():
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    if not os.path.isdir(classes):
        sys.exit("compile first: sbt -batch compile (missing %s)" % classes)
    return classes + ":" + "/opt/spark/jars/*"


def reference_queries(sf_dir):
    key = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(REPO, "bench_reference_%s.json" % key)
    if not os.path.isfile(path):
        sys.exit("no --queries given and %s not found" % path)
    with open(path) as f:
        ref = json.load(f)
    return sorted(ref.get("sec", {}).keys())


def last_json_line(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--cpus", default=None)
    ap.add_argument("--mem", default=os.environ.get("SPARK_DRIVER_MEM", "8g"))
    ap.add_argument("--queries", default=None,
                    help="comma-separated; default: bench_reference keys")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    queries = (args.queries.split(",") if args.queries
               else reference_queries(args.sf_dir))
    queries = [q.strip() for q in queries if q.strip()]

    cmd_base = ["java", "-cp", classpath(), "-Xmx" + args.mem,
                "-Dspark.ui.enabled=false",
                "-Dspark.sql.session.timeZone=UTC"]
    for p in ADD_OPENS_PKGS:
        cmd_base += ["--add-opens", p + "=ALL-UNNAMED"]
    cmd_base.append("graft.Bench")

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    env["SPARK_GRAFT_BENCH_REPS"] = str(args.reps)
    if args.cpus:
        env["SPARK_GRAFT_CPUS"] = args.cpus

    detail_path = os.path.join(REPO, "target", "bench_detail.json")
    out = {"mode": "jvm-isolated", "sf": args.sf_dir, "reps": args.reps,
           "queries": {}, "spread": {}, "shuffle": {}, "errors": {}}
    t_all = time.time()
    for i, q in enumerate(queries):
        env["SPARK_GRAFT_BENCH_ONLY"] = q
        t0 = time.time()
        proc = subprocess.run(cmd_base, cwd=REPO, env=env,
                              capture_output=True, text=True)
        wall = time.time() - t0
        parsed = last_json_line(proc.stdout)
        if proc.returncode != 0 or parsed is None:
            out["errors"][q] = "exit=%d jvm_wall=%.1fs tail=%r" % (
                proc.returncode, wall, proc.stdout[-200:] + proc.stderr[-200:])
            print("[%d/%d] %-28s FAILED (%.1fs)" % (
                i + 1, len(queries), q, wall), flush=True)
            continue
        med = parsed.get("queries", {}).get(q)
        errs = parsed.get("errors", {})
        if errs:
            out["errors"][q] = errs.get(q, str(errs))
        if med is not None:
            out["queries"][q] = med
        try:
            with open(detail_path) as f:
                detail = json.load(f)
            out["spread"][q] = detail["spread"][q]
            out["shuffle"][q] = detail["shuffle_write_bytes_records"][q]
        except Exception:
            pass
        print("[%d/%d] %-28s %8.2f s  (jvm %.1fs)" % (
            i + 1, len(queries), q, med if med is not None else float("nan"),
            wall), flush=True)

    out["total"] = round(sum(out["queries"].values()), 3)
    out["wall_total"] = round(time.time() - t_all, 1)
    blob = json.dumps(out, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob + "\n")
    print(blob)


if __name__ == "__main__":
    main()
