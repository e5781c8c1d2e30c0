#!/bin/bash
# Full-suite sharded run (CLAUDE.md shard map), recording per-shard
# wall time and results. Usage: bash scripts/run_suite.sh [logdir]
LOG=${1:-/root/suite_$(git -C /root/repo rev-parse --short HEAD)}
mkdir -p "$LOG"
cd /root/repo || exit 1
echo "suite at $(git rev-parse --short HEAD) starting $(date -u +%H:%M:%S)" | tee "$LOG/summary.txt"
declare -a SHARDS=(
  "tests/test_[a-e]*.py"
  "tests/test_[f-m]*.py"
  "tests/test_[n-o]*.py"
  "tests/test_pac*.py tests/test_pal*.py"
  "tests/test_par*.py"
  "tests/test_pro*.py"
  "tests/test_r*.py"
  "tests/test_s*.py"
  "tests/test_t*.py"
)
for i in "${!SHARDS[@]}"; do
  t0=$SECONDS
  # shellcheck disable=SC2086
  python -m pytest ${SHARDS[$i]} -q --durations=40 > "$LOG/shard$i.log" 2>&1
  rc=$?
  dt=$((SECONDS - t0))
  tail -1 "$LOG/shard$i.log" | sed "s/^/shard$i rc=$rc ${dt}s: /" | tee -a "$LOG/summary.txt"
done
echo "suite done $(date -u +%H:%M:%S)" | tee -a "$LOG/summary.txt"
