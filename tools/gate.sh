#!/bin/bash
# Pre-snapshot gate (VERDICT r4 #1): the fast suite must be green before any
# end-of-round snapshot. Run from the repo root:
#     bash tools/gate.sh
# Exits non-zero on any failure; prints the summary line either way.
set -u
cd "$(dirname "$0")/.."
timeout 1800 python -m pytest tests/ -q -m "not slow" 2>&1 | tail -5
exit "${PIPESTATUS[0]}"
