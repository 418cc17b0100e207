#!/bin/bash
# Run a long background job under the bench lock so the driver's
# bench.py can detect/report (and wait out) contention instead of
# silently timing out (round-4 lesson: BENCH_r04 rc=124 because a seed
# queue straddled the bench window).
#
# Usage: with_bench_lock.sh "description" cmd args...
# bench.py acquires /tmp/spml_bench.lock exclusively and reads
# .holder for diagnostics.
set -u
DESC="$1"; shift
LOCK=/tmp/spml_bench.lock
exec 9>"$LOCK"
flock 9
echo "pid $$ ($DESC) since $(date -u +%FT%TZ)" > "$LOCK.holder"
"$@"
rc=$?
rm -f "$LOCK.holder"
exit $rc
