#!/bin/bash
# Per-file test wall times (suite budget diagnosis)
for f in tests/test_*.py; do
  s=$(date +%s.%N)
  out=$(python -m pytest "$f" -q --no-header 2>&1 | tail -1)
  e=$(date +%s.%N)
  printf "%7.1f s  %-40s %s\n" "$(echo "$e - $s" | bc)" "$f" "$out"
done
