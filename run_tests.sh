#!/bin/bash
# Chunked test runner: the full suite in one process accumulates jit caches
# of several large models on a 1-core host; running per-module keeps memory
# and latency bounded. Exit nonzero if any chunk fails.
set -u -o pipefail
fail=0
for f in tests/test_*.py; do
  if ! python -m pytest "$f" -q --no-header 2>&1 | tail -1; then
    fail=1
  fi
done
exit $fail
