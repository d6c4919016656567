#!/bin/bash
# Alternating same-window A/B: run QUERY solo via tools/profile_query.py
# in the OLD worktree and the NEW worktree, interleaved (old,new,new,old
# per pass — both orders covered), at $SPARK_GRAFT_CPUS cores.
# Usage: tools/ab_pair.sh QUERY OLD_DIR NEW_DIR [PASSES] [REPS]
set -u
Q="$1"; OLD="$2"; NEW="$3"; PASSES="${4:-2}"; REPS="${5:-2}"
for p in $(seq 1 "$PASSES"); do
  for side in old new new old; do
    dir=$([ "$side" = old ] && echo "$OLD" || echo "$NEW")
    out=$(cd "$dir" && python tools/profile_query.py "$Q" --reps "$REPS" 2>/dev/null | grep "^query=")
    echo "pass$p $side $out"
  done
done
