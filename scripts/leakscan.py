#!/usr/bin/env python3
"""Independent leak scan with verifiable run metadata.

The driver writes LEAKCHECK.json per round, but its only change across
rounds is the round number — nothing proves a re-run. This script is
the repo-side complement: same spirit (no proprietary/internal systems,
URLs, buckets, env vars, keys in the shipped source), plus scan
metadata (UTC timestamp, file count, per-pattern hit counts, sha256 of
the pattern manifest) so each round's artifact is distinguishable from
a stale copy.

Usage: python3 scripts/leakscan.py [out.json]   (default LEAKCHECK_LOCAL.json)
Exit code 1 if any hit.
"""
import datetime
import hashlib
import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCAN_DIRS = ["src", "scripts", "build.sbt", "README.md", "SCALE.md",
             "SURVEY.md", "COVERAGE.md"]

# Pattern manifest: name -> regex over file text. Deliberately broad;
# matches are reviewed, not auto-waived.
PATTERNS = {
    "internal-import": r"import\s+(?:com|org)\.(?:anthropic|palantir|databricks\.internal)",
    "internal-url": r"https?://[a-z0-9.-]*\.(?:internal|corp|intranet)\b",
    "internal-bucket": r"s3://[a-z0-9._-]*(?:internal|private|prod)[a-z0-9._-]*",
    "slack-link": r"slack\.com/archives|#[a-z0-9-]*-internal",
    "api-key": r"(?:api[_-]?key|secret)[\"'\s:=]+[A-Za-z0-9+/]{24,}",
    "shortlink": r"\bgo/[a-z][a-z0-9-]+",
}


def iter_files():
    for entry in SCAN_DIRS:
        p = ROOT / entry
        if p.is_file():
            yield p
        elif p.is_dir():
            for f in sorted(p.rglob("*")):
                if f.is_file() and f.suffix in {
                        ".scala", ".sbt", ".py", ".md", ".sql", ".json"}:
                    yield f


def main():
    out_path = ROOT / (sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_LOCAL.json")
    hits = {name: [] for name in PATTERNS}
    n_files = 0
    for f in iter_files():
        n_files += 1
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        for name, pat in PATTERNS.items():
            for m in re.finditer(pat, text, re.IGNORECASE):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f.relative_to(ROOT)}:{line}")
    manifest_hash = hashlib.sha256(
        json.dumps(PATTERNS, sort_keys=True).encode()).hexdigest()[:16]
    n_hits = sum(len(v) for v in hits.values())
    result = {
        "scanned_at_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "files_scanned": n_files,
        "pattern_manifest_sha256_16": manifest_hash,
        "n_hits": n_hits,
        "hits": hits,
    }
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(f"{out_path.name}: {n_files} files, {n_hits} hits")
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
