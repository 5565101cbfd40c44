#!/usr/bin/env bash
# Round-16 decade evidence: fresh-JVM BenchOne per scale (sf0.1 ->
# target/sf5x -> target/sf25x), q01 as the ambient scan reference,
# steady-state = second run in the JVM. Usage: scripts/decade_r16.sh
set -euo pipefail
cd "$(dirname "$0")/.."

ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
QUERIES="q328_maintenance_loop q329_betweenness_sampled q330_betweenness_sample_error q331_phash_neardup_auto q332_lease_maintenance q333_entity_chokepoints"

for SF in /root/testdata/sf0.1 target/sf5x target/sf25x; do
  for Q in $QUERIES; do
    echo "== scale=$SF query=$Q"
    SPARK_GRAFT_SF_DIR="$SF" java $ADD_OPENS -Xmx48g \
      -Dspark.ui.enabled=false \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.BenchOne q01_pricing_summary "$Q" "$Q" 2>/dev/null | grep benchone
  done
done
