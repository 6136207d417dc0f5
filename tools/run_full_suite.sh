#!/usr/bin/env bash
# Per-round FULL test gate: runs fast AND @slow tests (the default pytest
# addopts exclude @slow — torch/HF parity, golden loss curves, RL e2e — so
# `pytest tests/` green does NOT mean the ground-truth suite ran).
#
# Run this once per round (takes ~40-60 min on the 1-core host; do NOT run
# concurrently with a TPU job — they fight for the core and both distort):
#
#   bash tools/run_full_suite.sh [extra pytest args]
#
# Writes the log to work_dirs/full_suite_<date>.log and exits nonzero on any
# failure.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p work_dirs
LOG="work_dirs/full_suite_$(date +%Y%m%d_%H%M%S).log"
echo "full suite -> $LOG"
JAX_PLATFORMS=cpu python -m pytest tests/ -q -m "slow or not slow" "$@" 2>&1 | tee "$LOG"
rc=${PIPESTATUS[0]}
tail -2 "$LOG"
exit "$rc"
