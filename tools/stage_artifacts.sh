#!/usr/bin/env bash
# Stage + commit the per-round measurement artifacts so `git status`
# is clean at round end (r9-r12 verdicts flagged untracked/modified
# artifact files four rounds running — this makes the fix structural).
#
# With a round number, the script FIRST runs the executed-plan lint
# sweep and refuses to stage when the sweep finds anything or cannot
# be produced (r15 verdict item 5: the r12 "zero findings" artifact
# went stale because nothing forced a re-run at HEAD — now the same
# command that stages BENCH/CORRECTNESS produces LINTSWEEP_r{N}.txt,
# so a stale or dirty sweep blocks the round's artifact commit).
# Set SKIP_LINTSWEEP=1 only to stage partial artifacts mid-round.
#
# Usage: tools/stage_artifacts.sh [round-number]
#   With no argument, stages every artifact pattern that is untracked
#   or modified (no lint sweep).
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

  if [[ "${SKIP_LINTSWEEP:-0}" != 1 ]]; then
    sweep="LINTSWEEP_${rn}.txt"
    echo "running executed-plan lint sweep -> $sweep (this executes every query)"
    {
      echo "# Executed-plan lint sweep — round ${round} (produced by tools/stage_artifacts.sh)"
      echo "# Command: Test/runMain graft.tools.LintSweep /root/testdata/sf0.1 --executed"
      echo "# Mode: PlanLint.lintFull — every registered query RUN at sf0.1,"
      echo "#   initial plan authoritative for structural boundedness, final"
      echo "#   adaptive plan contributing runtime-introduced kinds."
      echo "# Produced at HEAD $(git rev-parse --short HEAD); staging refuses on findings."
      # sbt prefixes program output with [info]/[error] - strip to the
      # LINT lines themselves
      sbt -batch "Test/runMain graft.tools.LintSweep /root/testdata/sf0.1 --executed" \
        2>&1 | grep -oE "LINT .*" || true
    } > "$sweep"
    if ! grep -q "^LINT sweep done" "$sweep"; then
      echo "FATAL: lint sweep did not complete - refusing to stage" >&2
      exit 1
    fi
    findings=$(grep "^LINT" "$sweep" | grep -v "^LINT sweep done" || true)
    if [[ -n "$findings" ]]; then
      echo "FATAL: lint sweep has findings - fix before staging:" >&2
      echo "$findings" >&2
      exit 1
    fi
    patterns+=("$sweep")
  fi
fi

staged=0
for p in "${patterns[@]}"; do
  for f in $p; do
    [[ -e "$f" ]] || continue
    # a gitignored artifact (e.g. COPYCHECK.json) must not abort the
    # whole staging run: git add exits 1 on ignored paths and set -e
    # killed the r17 staging before the commit (and before LINTSWEEP
    # was staged) — skip those explicitly
    if git check-ignore -q "$f"; then
      echo "skipped (gitignored): $f"
      continue
    fi
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
