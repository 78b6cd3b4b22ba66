#!/usr/bin/env python3
"""Render a graft.Bench JSON line as the BASELINE_LOCAL.md table body.

Usage: python3 scripts/baseline_table.py <bench_json_file>

Reads the one-line {"metric":...,"queries":{...},"passes":{...}} emitted
by `graft.Bench` and prints the per-query markdown table (min + the
three interleaved passes) plus the sum-of-minima headline, ready to
paste into BASELINE_LOCAL.md after a quiet-host run.
"""
import sys, json

def main():
    with open(sys.argv[1]) as f:
        line = next(l for l in f if l.strip().startswith("{"))
    d = json.loads(line)
    qs, passes = d["queries"], d.get("passes", {})
    total = sum(v for v in qs.values() if v >= 0)
    print(f"Total (sum of minima): **{total:.2f} s**. "
          f"Failed: {', '.join(d.get('failed', [])) or 'none'}.")
    print()
    print("| query | min (s) | pass 1 | pass 2 | pass 3 |")
    print("|---|---|---|---|---|")
    for name in sorted(qs):
        # Pad/truncate to exactly 3 pass cells so partial runs cannot
        # shift cells under the wrong headers.
        ps = (passes.get(name, []) + [None] * 3)[:3]
        # The -1 sentinel marks a FAILED query; render it as 'fail'
        # so it cannot read as a (fast) timing in the pasted table.
        fmt = lambda v: "fail" if v is not None and v < 0 else \
            ("" if v is None else f"{v:.2f}")
        cells = " | ".join(fmt(p) for p in ps)
        print(f"| {name} | {fmt(qs[name])} | {cells} |")

if __name__ == "__main__":
    main()
