#!/bin/bash
# Dev launcher mirroring build.sbt's fork options (add-opens + -Xmx) without
# the sbt boot/lock — lets a long sweep run while sbt stays free for tests.
CLS=/root/repo/target/scala-2.13/classes
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-16g} ${SPARK_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" "$@"
