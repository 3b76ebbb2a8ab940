#!/usr/bin/env python3
"""Merge partial Bench JSON outputs (same sf dir) into one record.

Later files win on per-query collisions; queries with median < 0
(failed) are dropped in favor of any successful later reading.
Usage: merge_bench.py OUT IN1 IN2 [...]
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: merge_bench.py OUT IN1 [IN2 ...]")
    out, *ins = sys.argv[1:]
    merged: dict = {}
    merged_min: dict = {}
    src: dict = {}
    meta = None
    for p in ins:
        with open(p) as f:
            j = json.load(f)
        if meta is not None and j["sf"] != meta["sf"]:
            sys.exit(f"sf mismatch: {p} has {j['sf']}, "
                     f"earlier inputs {meta['sf']}")
        if meta is not None and j.get("protocol") != meta.get("protocol"):
            sys.exit(f"protocol mismatch: {p} has {j.get('protocol')}, "
                     f"earlier inputs {meta.get('protocol')}")
        meta = j
        for k, v in j["queries"].items():
            if v >= 0:
                merged[k] = v
                merged_min[k] = j.get("queries_min", {}).get(k, v)
                src[k] = p
            elif k not in merged:
                merged[k] = v
                merged_min[k] = v
                src[k] = p
    failed = sorted(k for k, v in merged.items() if v < 0)
    # provenance stamp (r15 verdict item 8): a merged record must say so
    # INSIDE the JSON — which inputs it was spliced from and which
    # queries each later input overrode, so a reader never mistakes a
    # splice for one uninterrupted run
    overridden = sorted(k for k, p in src.items() if p != ins[0])
    rec = {
        "metric": "total",
        "value": sum(v for v in merged.values() if v >= 0),
        "unit": "sec",
        "protocol": meta.get("protocol", "median_of_3_post_warm"),
        "queries": dict(sorted(merged.items())),
        "queries_min": dict(sorted(merged_min.items())),
        "failed": failed,
        "sf": meta["sf"],
        "merged": {"inputs": ins, "overridden_queries": overridden},
    }
    with open(out, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(f"{out}: {len(merged)} queries, total {rec['value']:.1f}s, "
          f"failed {failed}")


if __name__ == "__main__":
    main()
