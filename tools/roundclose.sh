#!/usr/bin/env bash
# Round-close recipe, runnable as one command at the FINAL commit:
#   1. full ScalaTest suite
#   2. full-set oracle gate at sf0.01 (the driver's own check, locally)
#   3. full-set oracle gate at sf0.1 (the README's both-scales claim)
#   4. controlled double bench at sf0.1 (idle canaries at both ends
#      come from Bench itself; run back-to-back, archive both lines)
# Archive the printed gate lines + bench JSON in BENCH_NOTES.md.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] sbt test"
sbt -batch test 2>&1 | tail -4

echo "== [2/4] oracle gate sf0.01"
rm -rf /tmp/rc_verify_001
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/rc_verify_001" 2>&1 | tail -1
python3 tools/check.py /tmp/rc_verify_001 /root/testdata/sf0.01 | tail -1

echo "== [3/4] oracle gate sf0.1"
rm -rf /tmp/rc_verify_01
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.1 /tmp/rc_verify_01" 2>&1 | tail -1
python3 tools/check.py /tmp/rc_verify_01 /root/testdata/sf0.1 | tail -1

echo "== [4/4] controlled double bench sf0.1"
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -F '"metric"' | tail -1
  # Bench writes the COMPLETE artifact (full per-query map + staging +
  # canaries + contended flag) to BENCH_FULL.json — keep both close
  # runs so the archive is adjudicable without a re-run
  cp BENCH_FULL.json "BENCH_FULL_close_run$i.json"
done
