#!/bin/bash
# Chunked test runner: the full suite in one process accumulates jit caches
# of several large models on a 1-core host; running per-module keeps memory
# and latency bounded. Exit nonzero if any chunk fails.
#
#   ./run_tests.sh          full suite (thorough gate, >10 min on 1 core)
#   ./run_tests.sh --fast   unit/golden tier only (~3 min on 1 core):
#                           evaluator + metric quirks, ops oracles, losses,
#                           GMM/STTran goldens, memory algebra, configs —
#                           the modules a reviewer can verify in one sitting.
set -u -o pipefail

FAST_MODULES="
tests/test_evaluator.py
tests/test_reference_oracle_evaluator.py
tests/test_temporal_metric.py
tests/test_ops_boxes.py
tests/test_nms.py
tests/test_union_masks.py
tests/test_gmm_golden.py
tests/test_sttran_golden.py
tests/test_memory.py
tests/test_loss_assembly.py
tests/test_optim_schedule.py
tests/test_laplacian.py
tests/test_graph_build.py
tests/test_postprocess.py
tests/test_word_vectors.py
tests/test_cli_configs.py
"

if [ "${1:-}" = "--fast" ]; then
  FILES=$FAST_MODULES
else
  FILES=$(ls tests/test_*.py)
fi

fail=0
for f in $FILES; do
  if ! python -m pytest "$f" -q --no-header 2>&1 | tail -1; then
    fail=1
  fi
done
exit $fail
