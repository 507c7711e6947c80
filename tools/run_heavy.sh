#!/bin/bash
# Run the heavy suite one module per process: XLA:CPU segfaults/aborts
# after many large fusion-disabled compiles accumulate in one process
# (observed twice at the ~8th heavy test), so isolate modules.
set -u
cd "$(dirname "$0")/.."
total_pass=0; total_fail=0
for f in tests/test_*.py; do
    n=$(python -m pytest "$f" -m heavy --collect-only -q 2>/dev/null | grep -c "::") || true
    [ "$n" = "0" ] && continue
    echo "=== $f ($n heavy tests)"
    python -m pytest "$f" -m heavy -q 2>&1 | tail -1
    rc=$?
done
