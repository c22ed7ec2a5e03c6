#!/usr/bin/env bash
# Stage + commit the per-round measurement artifacts so `git status`
# is clean at round end (r9-r12 verdicts flagged untracked/modified
# artifact files four rounds running — this makes the fix structural).
#
# Usage: tools/stage_artifacts.sh [round-number]
#   With no argument, stages every artifact pattern that is untracked
#   or modified. Commits only if something was staged.
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:-}"
patterns=(
  "LEAKCHECK.json" "bench_results.json" "COPYCHECK.json"
  "SCALE100*.json" "SCALE1000*.json" "STREAMBENCH*.json"
)
if [[ -n "$round" ]]; then
  rn=$(printf "r%02d" "$round")
  patterns+=("BENCH_${rn}.json" "CORRECTNESS_${rn}.json")
else
  patterns+=("BENCH_r*.json" "CORRECTNESS_r*.json")
fi

staged=0
for p in "${patterns[@]}"; do
  for f in $p; do
    [[ -e "$f" ]] || continue
    if ! git diff --quiet -- "$f" 2>/dev/null \
       || ! git ls-files --error-unmatch "$f" >/dev/null 2>&1; then
      git add "$f"
      staged=1
      echo "staged: $f"
    fi
  done
done

if [[ "$staged" == 1 ]]; then
  git commit -m "Track round measurement artifacts"
  echo "committed artifact snapshot"
else
  echo "artifacts already clean"
fi
