#!/bin/bash
# Run the test suite one file per process.
#
# The full in-process run (python -m pytest tests/) accumulates every
# compiled XLA program across ~300 tests; on the 1-core CPU host this
# has segfaulted inside backend_compile_and_load late in the run
# (memory pressure — the same test passes in isolation). Per-file
# processes bound the growth and give the same coverage.
set -uo pipefail
cd "$(dirname "$0")/.."
fails=0
total_log=${SUITE_LOG:-/tmp/suite_sharded.log}
: > "$total_log"
for f in tests/test_*.py; do
    echo "=== $f" | tee -a "$total_log"
    python -m pytest "$f" -q 2>&1 | tail -2 | tee -a "$total_log"
    rc=${PIPESTATUS[0]}
    if [ "$rc" -ne 0 ]; then
        fails=$((fails + 1))
        echo "FAILED SHARD: $f (rc=$rc)" | tee -a "$total_log"
    fi
done
echo "=== shards with failures: $fails" | tee -a "$total_log"
exit "$fails"
