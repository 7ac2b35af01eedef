#!/usr/bin/env bash
# CI-shape correctness gate: compile + tests + the full oracle compare at
# BOTH verification scale factors (hash-boundary luck differs by SF, so a
# new oracle must pass both — see .claude/skills/verify/SKILL.md).
# Exits non-zero on the first failing stage. Usage:
#   tools/gate.sh            # full gate (tests + both SFs)
#   tools/gate.sh --fast     # skip ScalaTest, oracle-gate only
#   tools/gate.sh q63_x,q70_y  # subset: only these queries, both SFs
set -euo pipefail
cd "$(dirname "$0")/.."

subset="${1:-}"
out=$(mktemp -d /tmp/graft_gate.XXXXXX)
trap 'rm -rf "$out"' EXIT

if [[ "$subset" != "--fast" && -z "$subset" ]]; then
  sbt -batch test
fi
[[ "$subset" == "--fast" ]] && subset=""

for sf in sf0.01 sf0.1; do
  echo "=== gate: $sf ==="
  if sbt -batch "runMain graft.Verify /root/testdata/$sf $out/$sf $subset" \
      2>&1 | grep -E '\[verify\].*failed'; then
    echo "GATE FAIL: Verify errors at $sf"; exit 1
  fi
  if [[ -n "$subset" ]]; then
    # subset runs FAIL for every unwritten query (check.py exits 1);
    # the real verdict is the per-name PASS count below
    python3 tools/check.py "/root/testdata/$sf" "$out/$sf" \
      | tee "$out/$sf.log" | grep -E "$(echo "$subset" | tr ',' '|')" || true
    n_req=$(echo "$subset" | tr ',' '\n' | wc -l)
    n_pass=$(grep -cE "^PASS ($(echo "$subset" | tr ',' '|')) " "$out/$sf.log" || true)
    [[ "$n_pass" -eq "$n_req" ]] || { echo "GATE FAIL: $n_pass/$n_req subset pass at $sf"; exit 1; }
  else
    # check.py exits 1 on any fail; pipefail propagates it through tee
    python3 tools/check.py "/root/testdata/$sf" "$out/$sf" \
      | tee "$out/$sf.log" | tail -3 \
      || { grep "^FAIL" "$out/$sf.log"; echo "GATE FAIL at $sf"; exit 1; }
  fi
done
echo "GATE PASS"
