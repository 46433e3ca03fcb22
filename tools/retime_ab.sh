#!/usr/bin/env bash
# Same-code A/B re-time: separate BOX drift from CODE drift.
#
# Rebuilds an OLD commit in /tmp and times the same query list on both
# the old build and the current working tree, median of N runs each,
# interleaved (old,new,old,new,…) so slow-box windows hit both sides.
# This is the harness that settled round 8/9's "regression or noisy
# box?" questions — a committed map ratio means nothing until the
# UNMODIFIED old commit is re-timed on today's box.
#
# Usage:
#   tools/retime_ab.sh <old-commit> <q1,q2,...> [runs=3] [sfdir=/root/testdata/sf0.1]
#
# Output: per-query median table (old vs new, ratio) + a verdict line
# per query (CODE if new/old > 1.25 on the SAME box, else BOX/NOISE),
# ready to paste into COVERAGE.md.
set -euo pipefail

COMMIT="${1:?usage: retime_ab.sh <old-commit> <q1,q2,...> [runs] [sfdir]}"
QUERIES="${2:?usage: retime_ab.sh <old-commit> <q1,q2,...> [runs] [sfdir]}"
RUNS="${3:-3}"
SFDIR="${4:-/root/testdata/sf0.1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLONE="/tmp/graft-ab-${COMMIT}"

if [ ! -d "$CLONE" ]; then
  echo "[ab] cloning $COMMIT -> $CLONE"
  git -C "$REPO" worktree add --detach "$CLONE" "$COMMIT" 2>/dev/null \
    || { git clone -q "$REPO" "$CLONE" && git -C "$CLONE" checkout -q "$COMMIT"; }
fi

echo "[ab] building both trees"
(cd "$CLONE" && sbt -batch compile >/dev/null)
(cd "$REPO" && sbt -batch compile >/dev/null)

run_one() { # dir tag run-index -> writes /tmp/graft-ab-out/<tag>_<i>.json
  local dir="$1" tag="$2" i="$3"
  mkdir -p /tmp/graft-ab-out
  (cd "$dir" && SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_OUT="/tmp/graft-ab-out/${tag}_${i}.json" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1)
  echo "[ab] $tag run $i done"
}

for i in $(seq 1 "$RUNS"); do
  run_one "$CLONE" old "$i"
  run_one "$REPO" new "$i"
done

python3 - "$QUERIES" "$RUNS" <<'EOF'
import json, statistics, sys
queries, runs = sys.argv[1].split(","), int(sys.argv[2])
def medians(tag):
    maps = [json.load(open(f"/tmp/graft-ab-out/{tag}_{i}.json"))["queries"]
            for i in range(1, runs + 1)]
    return {q: statistics.median(m[q] for m in maps) for q in queries}
old, new = medians("old"), medians("new")
print(f"\n| query | old median s | new median s | new/old | verdict |")
print("|---|---|---|---|---|")
for q in queries:
    r = new[q] / old[q] if old[q] else float("inf")
    verdict = "CODE" if r > 1.25 else ("CODE-IMPROVED" if r < 0.8 else "BOX/NOISE")
    print(f"| {q} | {old[q]:.2f} | {new[q]:.2f} | {r:.2f}x | {verdict} |")
EOF
