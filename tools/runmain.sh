#!/bin/bash
# Direct-JVM runner for test mains (probes, hunts) — avoids the sbt server
# lock so probes can run while an sbt hunt is in flight. Requires a prior
# `sbt Test/compile`. Usage: tools/runmain.sh graft.Probe50Main [args...]
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:target/scala-2.13/test-classes"
CP="$CP:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
for j in $(find /root/.cache/coursier -name 'scalatest*.jar' -o -name 'scalacheck*.jar' -o -name 'scala-parallel-collections*.jar' -o -name 'scala-parser-combinators*.jar' 2>/dev/null); do
  CP="$CP:$j"
done
exec java -Xmx24g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" "$@"
