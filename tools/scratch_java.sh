#!/bin/bash
# Launch graft.Scratch (plan dump + noop timing) via the cached runtime
# classpath — no sbt, so it can run beside an sbt test/bench session.
# Usage: tools/scratch_java.sh <lane> [<lane>...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP=$(cat target/graft_runtime_classpath.txt)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# shellcheck disable=SC2086
exec java $ADD_OPENS -Xmx12g -Dspark.ui.enabled=false \
  -cp "$CP" graft.Scratch "$@"
