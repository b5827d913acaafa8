#!/usr/bin/env bash
# Standing two-SF correctness sweep (r7 verdict item 5): run the FULL
# oracle gate at sf0.01 and sf0.1 and print both totals. Part of every
# round close — a gate that only ever ran at one SF can hide
# scale-dependent drift (boundary rounding, overflow, skew).
#
# Usage: tools/sweep.sh [sf ...]     (default: 0.01 0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
SFS=("${@:-0.01 0.1}")
[ $# -eq 0 ] && SFS=(0.01 0.1)
for sf in "${SFS[@]}"; do
  out="/tmp/sweep_sf${sf}"
  rm -rf "$out"
  echo "=== sweep sf${sf} ==="
  sbt -batch "runMain graft.Verify /root/testdata/sf${sf} ${out}" >/dev/null 2>&1 \
    || { echo "Verify FAILED at sf${sf}"; exit 1; }
  python3 tools/check.py "/root/testdata/sf${sf}" "$out" | tail -1
done
