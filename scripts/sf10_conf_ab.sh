#!/bin/bash
# sf10 A/B of guide-§9 session configs (round 19 "Not yet optimized" item).
# Protocol per SCALE.md round-19: ONE query per fresh JVM, PASSES=1,
# warm page cache, testdata-sf10. Variants injected via
# SPARK_GRAFT_EXTRA_JAVA_OPTS (build.sbt passthrough; empty = shipped defaults).
#
# Usage: sf10_conf_ab.sh <variant> <query> [outfile]
set -u
VARIANT="$1"; QUERY="$2"; OUT="${3:-/tmp/sf10_ab/${VARIANT}_${QUERY}.json}"
mkdir -p "$(dirname "$OUT")"
case "$VARIANT" in
  base) EXTRA="" ;;
  zstd) EXTRA="-Dspark.io.compression.codec=zstd" ;;
  shj)  EXTRA="-Dspark.sql.join.preferSortMergeJoin=false -Dspark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=256m" ;;
  both) EXTRA="-Dspark.io.compression.codec=zstd -Dspark.sql.join.preferSortMergeJoin=false -Dspark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=256m" ;;
  *) echo "unknown variant $VARIANT" >&2; exit 2 ;;
esac
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf10 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QUERIES="$QUERY" \
SPARK_GRAFT_BENCH_PASSES=1 \
SPARK_GRAFT_EXTRA_JAVA_OPTS="$EXTRA" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | grep -v '"compact"' | tail -1 > "$OUT"
echo "== $VARIANT $QUERY ==" && cat "$OUT"
