#!/usr/bin/env python3
"""Triage driver-tail bench divergences against the committed record.

Usage:
  python3 tools/bench_drift.py BENCH_r13.json [BENCH_full_latest.json]
      [--threshold 2.0]

The driver's per-round BENCH_r<N>.json is ONE cold run whose stdout
tail embeds (a truncated prefix of) the bench JSON line; the committed
BENCH_full_latest.json is the builder's median-of-3 record on the same
code. Host noise routinely moves single runs 1.3-1.5x (the r11/r12
manual A/Bs), so per-query divergence is only a signal beyond ~2x.
This tool joins the two records, flags per-query ratios beyond the
threshold, and prints the SPARK_GRAFT_BENCH_FILTER regex that re-runs
exactly the flagged set for the solo A/B — one command instead of a
round-trip of hand triage.

Exit code: 0 (nothing flagged) / 3 (divergences to A/B).
"""
import json
import re
import sys


def driver_queries(rec):
    """Per-query seconds from a driver round record.

    Prefers the parsed JSON if the driver managed to parse it; falls
    back to scraping the (front-truncated) stdout tail: entries before
    the first '}' belong to "queries" (it precedes "queries_min" in the
    bench line), unless an intact '"queries":{' marker survives.
    """
    parsed = rec.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return dict(parsed["queries"]), "parsed"
    tail = rec.get("tail", "")
    if not isinstance(tail, str) or not tail:
        return {}, "empty"
    m = re.search(r'"queries":\{', tail)
    seg = tail[m.end():] if m else tail
    seg = seg.split("}", 1)[0]
    pairs = re.findall(r'"([A-Za-z0-9_]+)":(-?[0-9]+(?:\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)', seg)
    meta = {"value", "sf", "cpus", "n", "rc"}
    return {k: float(v) for k, v in pairs if k not in meta}, (
        "tail" if m else "tail-truncated")


def main(argv):
    # one pass: a bare --threshold consumes the NEXT token as its value,
    # so '--threshold 2.0' never leaks '2.0' into the positional args
    args = []
    thr = 2.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    print("--threshold needs a value", file=sys.stderr)
                    return 2
                thr = float(argv[i + 1])
                i += 1
        elif a.startswith("--"):
            print(f"unknown flag {a}", file=sys.stderr)
            return 2
        else:
            args.append(a)
        i += 1
    if not args:
        print(__doc__.strip().split("\n\n")[1], file=sys.stderr)
        return 2
    driver_path = args[0]
    full_path = args[1] if len(args) > 1 else "BENCH_full_latest.json"
    drec = json.load(open(driver_path))
    frec = json.load(open(full_path))
    dq, src = driver_queries(drec)
    fq = frec.get("queries", frec)
    common = sorted(set(dq) & set(fq))
    print(f"driver={driver_path} ({src}, {len(dq)} queries) vs "
          f"committed={full_path} ({len(fq)} queries); "
          f"{len(common)} common, threshold {thr}x")
    if not common:
        print("no common queries — nothing to triage")
        return 0
    rows = []
    for k in common:
        d, f = dq[k], fq[k]
        if f <= 0 or d <= 0:
            continue
        rows.append((d / f, k, d, f))
    rows.sort(reverse=True)
    ratios = sorted(r for r, *_ in rows)
    med = ratios[len(ratios) // 2]
    print(f"median driver/committed ratio: {med:.3f} "
          f"(diffuse band = host state, not regression)")
    flagged = [r for r in rows if r[0] > thr or r[0] < 1 / thr]
    for ratio, k, d, f in flagged:
        print(f"  FLAG {k}: driver {d:.2f}s vs committed {f:.2f}s "
              f"({ratio:.2f}x)")
    if not flagged:
        print("no per-query divergence beyond threshold")
        return 0
    names = "|".join(k for _, k, _, _ in flagged)
    print("solo A/B re-run of the flagged set:")
    print(f"  SPARK_GRAFT_BENCH_FILTER='^({names})$' \\")
    print("    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \\")
    print("    SPARK_GRAFT_BENCH_OUT=/tmp/bench_ab.json "
          "sbt 'runMain graft.Bench'")
    return 3


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
