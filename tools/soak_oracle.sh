#!/bin/bash
# Resumable sf0.1 soak driver: runs tools/check_oracle.py one query at a
# time, banking each verdict in <outDir>/soak_results.txt so an
# interrupted soak (the DuckDB all-pairs dedup oracles run ~45 min total)
# resumes at the first unchecked query instead of starting over.
#
# Usage: tools/soak_oracle.sh <sfDir> <verifyOutDir>
set -u
SF="$1"; OUT="$2"
RES="$OUT/soak_results.txt"
touch "$RES"
cd "$(dirname "$0")/.."
for d in "$OUT"/*/; do
  q=$(basename "$d")
  grep -q "^$q " "$RES" && continue
  line=$(python3 tools/check_oracle.py "$SF" "$OUT" "$q" 2>&1 |
           grep -E '\[(ok|FAIL|rows-only)\]' | head -1)
  echo "$q ${line:-[FAIL] no-output}" >> "$RES"
  echo "$q ${line:-[FAIL] no-output}"
done
echo "---- summary ----"
awk '{print $2}' "$RES" | sort | uniq -c
