#!/bin/bash
# Usage: scripts/run_verify.sh <sfDir> <outDir> [query names...]
# Packages the jar (fast incremental) then runs graft.Verify with bare java
# (build.sbt's add-opens prepended — DATE decode fails without them).
set -e
cd /root/repo
sbt -batch package -error >/dev/null
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADDOPENS -Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dderby.stream.error.file=/tmp/graft-derby.log \
  -cp "target/scala-2.13/hyppoworkerspark_2.13-0.1.0.jar:/opt/spark/jars/*" \
  graft.Verify "$@"
