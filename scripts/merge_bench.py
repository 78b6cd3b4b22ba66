#!/usr/bin/env python3
"""Merge two graft.Bench JSON lines over the SAME sf dir into one
artifact (used when a soak is split across runs — e.g. the r10 sf10
soak, where the SRP pair re-ran after the GenScale embeddings fix).
Queries/passes/failed are unioned; a query present in both keeps the
SECOND run's numbers; total is recomputed as the sum of minima.

Usage: merge_bench.py <base.json> <overlay.json> <out.json>
"""
import json
import sys


def main():
    base, overlay, out = (json.load(open(sys.argv[1])),
                          json.load(open(sys.argv[2])), sys.argv[3])
    assert base["sf"] == overlay["sf"], (base["sf"], overlay["sf"])
    for key in ("queries", "passes"):
        base[key].update(overlay[key])
    base["failed"] = sorted((set(base["failed"]) - set(overlay["queries"]))
                            | set(overlay["failed"]))
    base["value"] = sum(v for v in base["queries"].values() if v >= 0)
    json.dump(base, open(out, "w"), indent=1)
    print(f"{out}: {len(base['queries'])} queries, "
          f"failed={base['failed']}, total={base['value']:.1f}s")


if __name__ == "__main__":
    main()
