#!/usr/bin/env python3
"""Host calibration probe — run BEFORE trusting any bench absolute.

Round-17 lesson: the single-thread xorshift spin (BASELINE_LOCAL.md
protocol) is blind to the contention mode that actually hit the sf10
sessions that night. The decomposition that finally explained it:

  spin      single-thread ALU — catches whole-host CPU slowdowns.
            Clean band: 0.47-0.55 s.
  par32     32-process ALU wall time — catches lost parallelism
            (fewer effective cores / scheduler caps). Clean: <= ~1.0 s
            (slight oversubscription overhead over the single spin).
  disk      1 GB fdatasync write — catches virtio/host disk
            degradation, which taxes shuffle spill. Observed healthy:
            >= ~250 MB/s (no clean-night baseline recorded yet; record
            the value, compare across sessions).

A session where spin and par32 are clean but 20-second shuffle-heavy
queries (art_outcome_ref at sf10) still run 2x+ the clean band is the
memory-bandwidth/steal mode — only visible in the workload itself.
Protocol then: treat every measured minimum as an UPPER bound
(contention only inflates) and keep the night's JSONs as evidence, as
in SCALE.md "pinned from above".

Usage: python3 scripts/hostprobe.py  ->  one JSON line.
"""
import json
import multiprocessing as mp
import os
import subprocess
import tempfile
import time


def spin(_=None):
    x = 88172645463325252
    t0 = time.perf_counter()
    for _ in range(2_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return time.perf_counter() - t0


def disk_mbps(mb=512):
    with tempfile.NamedTemporaryFile(dir="/tmp", delete=False) as f:
        path = f.name
    try:
        t0 = time.perf_counter()
        subprocess.run(
            ["dd", f"if=/dev/zero", f"of={path}", "bs=1M",
             f"count={mb}", "conv=fdatasync"],
            check=True, capture_output=True)
        return mb / (time.perf_counter() - t0)
    finally:
        os.unlink(path)


def main():
    singles = [spin() for _ in range(3)]
    t0 = time.perf_counter()
    with mp.Pool(32) as p:
        per = p.map(spin, range(32))
    par_wall = time.perf_counter() - t0
    la1, la5, la15 = os.getloadavg()
    print(json.dumps({
        "spin_min_s": round(min(singles), 3),
        "spin_all_s": [round(s, 3) for s in singles],
        "par32_wall_s": round(par_wall, 3),
        "par32_max_s": round(max(per), 3),
        "disk_write_mbps": round(disk_mbps(), 1),
        "loadavg": [la1, la5, la15],
        "verdict_hint": ("clean" if min(singles) <= 0.56 and par_wall <= 1.1
                         else "contended"),
    }))


if __name__ == "__main__":
    main()
