#!/bin/bash
# Randomized-data oracle sweep (round 12): generate N seeded fuzz
# corpora, dump every oracled query once per corpus (one JVM), grade
# each against DuckDB with the same parity gate the driver uses.
# Usage: tools/fuzz_sweep.sh [N_SEEDS] (default 5)
set -e -o pipefail
N=${1:-5}
ROOT=/tmp/graft_fuzz
OUT=/tmp/graft_fuzz_out
rm -rf "$ROOT" "$OUT"
python3 tools/gen_fuzz.py "$ROOT" "$N"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.VerifySweep $ROOT $OUT"
fails=0
for d in "$ROOT"/s*; do
  s=$(basename "$d")
  echo "== seed $s =="
  python3 tools/check.py "$d" "$OUT/$s" | tail -3 || fails=$((fails+1))
done
echo "fuzz sweep: $((N-fails))/$N seeds fully green"
exit $fails
