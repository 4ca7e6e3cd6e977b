#!/bin/bash
# Dump .explain("formatted") per query into plans/<outdir>/<q>_<suffix>.txt
# Usage: tools/dump_plans.sh <outdir> <suffix> <q1> [q2 ...]
set -e
outdir=$1; suffix=$2; shift 2
mkdir -p "$outdir"
sbt -batch "runMain graft.Explain /root/testdata/sf0.001 $*" 2>/dev/null \
  | awk -v dir="$outdir" -v suf="$suffix" '
    /^===== / { f = dir "/" $2 "_" suf ".txt"; next }
    f { print > f }'
for q in "$@"; do
  [ -s "$outdir/${q}_${suffix}.txt" ] || echo "MISSING: $q"
done
