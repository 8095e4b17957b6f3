#!/usr/bin/env python3
"""Cross-tier scaling adjudication (r12 verdict #2; sidecar merge r13 #1).

Joins two per-sf bench reference files (written/merged by graft.Bench:
{"sec": {query: best-known-median-seconds}, "shuffle_records": {query:
last-run shuffle write records}}) and computes, for every query present in
both, the wall-time ratio and the shuffle-record ratio between the tiers.

A query is flagged SUPERLINEAR when its wall ratio exceeds FLAG_FACTOR x
the data ratio, and SHUFFLE_GROWTH when its shuffle-record ratio does --
the exact analysis the r12 round did by hand (and where hand-picking
missed events_near_errors, the #2 mover). Run it after every tier bench;
the TABLE is never curated.

Adjudications are merged from a committed sidecar
(tools/scaling_adjudications.json, next to this script; override with
--adjudications=PATH) so the emitted report is self-contained: the final
r13 regeneration dropped its hand-appended adjudication section, which is
exactly the failure mode a sidecar prevents. Every flagged query gets an
"## Adjudications" entry -- its sidecar verdict + evidence, or
**UNADJUDICATED** when the sidecar has no entry (exit 3; exit 0 when all
flags are adjudicated).

Caveat by construction: "sec" is the best-known median ever recorded at
that tier (graft.Bench merges min-forward), so ratios compare best-vs-best
-- immune to one noisy run, but a tier measured only once contributes its
single run. shuffle_records is the LAST run's plan fingerprint. Doc-quoted
ratios follow this best-vs-best convention (sidecar `_convention`).

Usage:
  python3 tools/scaling_report.py LO_REF HI_REF DATA_RATIO [--json]
      [--adjudications=PATH]
e.g.
  python3 tools/scaling_report.py bench_reference_sf0.1.json \
      bench_reference_testdata-sf1.0.json 10
"""
import json
import os
import sys

FLAG_FACTOR = 2.0  # wall ratio > FLAG_FACTOR x data ratio => flagged
MIN_HI_SEC = 1.0   # ignore sub-second hi-tier queries (scheduling jitter)


def load_adjudications(path):
    if not os.path.isfile(path):
        return {}
    data = json.load(open(path))
    return data.get("adjudications", {})


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_json = "--json" in sys.argv
    adj_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling_adjudications.json")
    for a in sys.argv[1:]:
        if a.startswith("--adjudications="):
            adj_path = a.split("=", 1)[1]
    if len(args) != 3:
        print(__doc__)
        sys.exit(64)
    lo_path, hi_path, data_ratio = args[0], args[1], float(args[2])
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    adj = load_adjudications(adj_path)
    rows = []
    for q in sorted(set(lo.get("sec", {})) & set(hi.get("sec", {}))):
        lo_s, hi_s = lo["sec"][q], hi["sec"][q]
        wall = hi_s / lo_s if lo_s > 0 else float("inf")
        lo_r = lo.get("shuffle_records", {}).get(q)
        hi_r = hi.get("shuffle_records", {}).get(q)
        rec = (hi_r / lo_r) if lo_r and hi_r is not None else None
        flags = []
        if hi_s >= MIN_HI_SEC and wall > FLAG_FACTOR * data_ratio:
            flags.append("SUPERLINEAR")
        if rec is not None and rec > FLAG_FACTOR * data_ratio:
            # a tiny lo-tier record count means the lo plan BROADCAST what
            # the hi plan shuffles -- a plan-shape transition with scale
            # (usually expected: AQE/broadcast thresholds), not volume
            # growth of an unchanged plan
            flags.append("TRANSITION" if lo_r < 10000 else "SHUFFLE_GROWTH")
        rows.append((q, lo_s, hi_s, wall, rec, flags))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[5]]
    unadjudicated = [q for q, *_ in flagged if q not in adj]
    if as_json:
        print(json.dumps({
            "lo": lo_path, "hi": hi_path, "data_ratio": data_ratio,
            "flag_factor": FLAG_FACTOR,
            "scaling_flags": {q: {"wall_ratio": round(w, 1),
                                  "shuffle_ratio": (round(rec, 1)
                                                    if rec is not None else None),
                                  "flags": f,
                                  "adjudication": adj.get(q, {}).get("verdict")}
                              for q, _, _, w, rec, f in flagged},
            "unadjudicated": unadjudicated}))
        sys.exit(3 if unadjudicated else 0)
    print(f"# Cross-tier scaling report: {lo_path} -> {hi_path} "
          f"(data x{data_ratio:g})")
    print(f"# flag rule: wall ratio > {FLAG_FACTOR:g} x data ratio "
          f"(hi-tier >= {MIN_HI_SEC:g}s); same for shuffle records")
    print(f"# ratios are best-known-vs-best-known (min-forward references)")
    print()
    print("| query | lo s | hi s | wall x | shufrec x | flags | adjudication |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    shown = [r for r in rows if r[5] or r[3] > data_ratio]
    for q, lo_s, hi_s, wall, rec, flags in shown:
        rec_s = f"{rec:.1f}" if rec is not None else "-"
        verdict = adj.get(q, {}).get("verdict", "") if flags else ""
        if flags and not verdict:
            verdict = "**UNADJUDICATED**"
        print(f"| {q} | {lo_s:.2f} | {hi_s:.2f} | {wall:.1f} | {rec_s} | "
              f"{' '.join(flags) if flags else ''} | {verdict} |")
    rest = len(rows) - len(shown)
    print()
    print(f"[summary] {len(rows)} queries compared, {len(flagged)} flagged "
          f"({len(flagged) - len(unadjudicated)} adjudicated, "
          f"{len(unadjudicated)} UNADJUDICATED), "
          f"{rest} at or under the x{data_ratio:g} data ratio omitted")
    if flagged:
        print()
        print(f"## Adjudications (merged from {os.path.relpath(adj_path)})")
        print()
        for q, _, _, wall, rec, flags in flagged:
            e = adj.get(q)
            if e:
                print(f"- `{q}` ({' '.join(flags)}, wall {wall:.1f}x) — "
                      f"**{e['verdict']}**: {e['evidence']}")
            else:
                print(f"- `{q}` ({' '.join(flags)}, wall {wall:.1f}x) — "
                      f"**UNADJUDICATED** — investigate this round and add a "
                      f"sidecar entry.")
    sys.exit(3 if unadjudicated else 0)


if __name__ == "__main__":
    main()
