#!/bin/bash
# Run Verify (already-compiled classes; compile with sbt first) + parity
# at the given sf. Usage: tools/check.sh [sf0.01] [only_query,only_query2]
set -eo pipefail
SF=${1:-sf0.01}
ONLY=${2:-}
# driver fixtures live at /root/testdata; rehearsal SFs (tools/gen_sf.py)
# under the repo's own testdata/ — a repo-local dir only wins when the
# driver has NO fixture of that name (ADVICE r6: silent shadowing of a
# driver fixture would validate against synthetic data and mask real
# failures). If both exist, the driver fixture wins and we warn loudly.
case "$SF" in
  /*)  SFDIR=$SF; SF=$(basename "$SF");;
  *)   if [ -d "/root/testdata/$SF" ]; then
         SFDIR=/root/testdata/$SF
         if [ -d "/root/repo/testdata/$SF" ]; then
           echo "WARNING: both /root/testdata/$SF (driver) and /root/repo/testdata/$SF (rehearsal) exist — using the DRIVER fixture. Rename the rehearsal dir to use it." >&2
         fi
       elif [ -d "/root/repo/testdata/$SF" ]; then SFDIR=/root/repo/testdata/$SF
       else SFDIR=/root/testdata/$SF; fi;;
esac
echo "check.sh: SF=$SF SFDIR=$SFDIR" >&2
# Contended-host tripwire (r8 verdict stretch #8): a graded/verification run
# started under load > 2 produced the r8 bench artifact whose regressions
# took a round to attribute — flag it in-stream BEFORE it happens.
LOAD1=$(cut -d' ' -f1 /proc/loadavg)
if [ "$(echo "$LOAD1 > 2" | bc 2>/dev/null || echo 0)" = "1" ]; then
  echo "WARNING: host load_1m=$LOAD1 > 2 at start — timings from this run are contention-suspect (correctness unaffected)" >&2
fi
OUT=/tmp/verify_$SF
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SFDIR" "$OUT" $ONLY 2>&1 | { grep -v '^\(2[0-9]\|WARN\|INFO\)' || true; }
python3 /root/repo/tools/parity.py "$SFDIR" "$OUT" $ONLY
