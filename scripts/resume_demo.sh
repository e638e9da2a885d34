#!/bin/bash
# Kill/resume demonstration through the north rule's stated invocation:
#   spark-submit --py-files geo_import_spark.zip run_job.py ...
# Run 1 is SIGKILLed mid-flight (after stage-1 lineage lands, while the
# PIP stage is running); run 2 resumes from the per-unit lineage logs.
# The transcript proves: completed units are skipped (units_run=0 for
# the points stage on resume) and their lineage records keep their
# original timestamps (never reprocessed).
set -uo pipefail
OUT=${1:-/tmp/resume_demo}
SF=${2:-/root/testdata/sf0.01}
CPUS=${3:-8}
cd /root/repo
rm -rf "$OUT" /tmp/geo_import_spark.zip
python -c "import shutil; shutil.make_archive('/tmp/geo_import_spark', 'zip', '.', 'geo_import_spark')"

echo "== run 1: spark-submit, killed mid-run =="
spark-submit --master "local[$CPUS]" \
    --driver-java-options "-XX:ParallelGCThreads=$CPUS -XX:ConcGCThreads=$(( CPUS / 2 > 0 ? CPUS / 2 : 1 ))" \
    --py-files /tmp/geo_import_spark.zip \
    run_job.py --sf-dir "$SF" --out "$OUT" --cpus "$CPUS" >/tmp/resume_run1.log 2>&1 &
PID=$!
# wait for stage-1 lineage, then kill while stage 2 (PIP) is in flight
for _ in $(seq 1 600); do
    [ -s "$OUT/points.lineage.jsonl" ] && break
    sleep 0.5
done
sleep 2
kill -9 $PID 2>/dev/null
wait $PID 2>/dev/null
echo "killed run 1 (pid $PID)"
echo "points units done at kill: $(wc -l < "$OUT/points.lineage.jsonl")"
echo "pip units done at kill:    $( [ -f "$OUT/pip.lineage.jsonl" ] && wc -l < "$OUT/pip.lineage.jsonl" || echo 0)"
cp "$OUT/points.lineage.jsonl" /tmp/resume_points_lineage_run1.jsonl

echo "== run 2: same invocation, resumes =="
spark-submit --master "local[$CPUS]" \
    --driver-java-options "-XX:ParallelGCThreads=$CPUS -XX:ConcGCThreads=$(( CPUS / 2 > 0 ? CPUS / 2 : 1 ))" \
    --py-files /tmp/geo_import_spark.zip \
    run_job.py --sf-dir "$SF" --out "$OUT" --cpus "$CPUS" 2>/tmp/resume_run2.log
echo "== lineage check =="
python - "$OUT" <<'PY'
import json, sys
out = sys.argv[1]
run1 = [json.loads(l) for l in open("/tmp/resume_points_lineage_run1.jsonl")]
run2 = [json.loads(l) for l in open(f"{out}/points.lineage.jsonl")]
r1 = {r["unit"]: r["ts"] for r in run1}
r2 = {r["unit"]: r["ts"] for r in run2}
reprocessed = [u for u in r1 if r2[u] != r1[u]]
print(f"points units: run1={len(r1)} total={len(r2)} reprocessed={len(reprocessed)}")
assert not reprocessed, "completed units were reprocessed!"
print("OK: every unit completed before the kill kept its original lineage record")
PY
