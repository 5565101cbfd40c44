#!/bin/bash
# Capture .explain("formatted") output for round-16 plan evidence:
#   scripts/explain_r16.sh <suffix> <query>...
# writes plans/r16/<query>_<suffix>.txt for each query (one ExplainOne
# session for all of them — sbt startup paid once).
set -e
suffix=$1; shift
out=$(mktemp)
sbt -batch "runMain graft.ExplainOne $*" > "$out" 2>/dev/null
for q in "$@"; do
  awk -v q="==== $q" 'index($0, q) == 1 {f=1; next} /^==== / {f=0} f' "$out" \
    > "plans/r16/${q}_${suffix}.txt"
  echo "plans/r16/${q}_${suffix}.txt: $(wc -l < "plans/r16/${q}_${suffix}.txt") lines"
done
rm -f "$out"
