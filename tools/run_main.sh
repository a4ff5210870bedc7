#!/usr/bin/env bash
# Run a graft main on the sbt Runtime classpath WITHOUT sbt's JVM-fork
# overhead. Plain `java -cp` needs Spark 4.x's JDK-17 --add-opens set
# (sbt injects them via build.sbt javaOptions; spark-submit via
# JavaModuleOptions) — without java.base/java.nio open, Kryo fails with
# "Unable to create serializer ... HeapByteBuffer" on the IVF/PQ paths.
#
# Usage: tools/run_main.sh graft.Verify /root/testdata/sf0.001 /tmp/out [...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP_CACHE=/tmp/graft_cp.txt
if [ ! -s "$CP_CACHE" ] || [ build.sbt -nt "$CP_CACHE" ]; then
  sbt -batch -error "export Runtime/fullClasspath" | tail -1 > "$CP_CACHE"
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$(cat "$CP_CACHE")" "$@"
