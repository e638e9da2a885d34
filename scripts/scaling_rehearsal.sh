#!/usr/bin/env bash
# One-command scaling rehearsal for the north rule: same job, same
# input, two cluster widths (N vs 4N), throughput at both + scaling
# efficiency >= 0.8.
#
#   Sandbox dry-run (default, inside this VM's real capacity):
#       scripts/scaling_rehearsal.sh
#   Real hardware (32+ physical cores):
#       SPARK_GRAFT_SCALING_LEVELS=8,32 scripts/scaling_rehearsal.sh
#   Genuine multi-executor cluster (N vs 4N executors):
#       run the two spark-submit invocations printed by
#       `scripts/scaling_rehearsal.sh --print-cluster-cmds`
#
# Artifact: SCALING.json at the repo root (override: first positional
# arg). The script validates the artifact against the checklist in
# BASELINE.md §"Real-hardware scaling rehearsal" and exits non-zero if
# the efficiency gate fails.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/SCALING.json}"
LEVELS="${SPARK_GRAFT_SCALING_LEVELS:-1,4}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

if [[ "${1:-}" == "--print-cluster-cmds" ]]; then
  cat <<EOF
# 1. Package the library exactly as a cluster submit ships it:
cd $REPO && rm -f /tmp/geo_import_spark.zip && zip -qr /tmp/geo_import_spark.zip geo_import_spark
# 2. Prepare the replicated input once at full width (shared storage path
#    for a real cluster; bench.py uses \$SPARK_GRAFT_SCALING_DIR if set):
SPARK_GRAFT_SF_DIR=$SF_DIR python $REPO/bench.py --scaling-prepare-only
# 3. Same job at N and 4N executors (adjust executor sizing to the fleet);
#    each prints one JSON line with docs_per_sec:
SPARK_GRAFT_MASTER=yarn spark-submit --master yarn --deploy-mode client \\
  --num-executors 8  --executor-cores 4 --executor-memory 16g \\
  --py-files /tmp/geo_import_spark.zip \\
  $REPO/bench.py --scale-worker 32 /path/to/prepared/input
SPARK_GRAFT_MASTER=yarn spark-submit --master yarn --deploy-mode client \\
  --num-executors 32 --executor-cores 4 --executor-memory 16g \\
  --py-files /tmp/geo_import_spark.zip \\
  $REPO/bench.py --scale-worker 128 /path/to/prepared/input
# (--scale-worker's arg is total cores = num-executors * executor-cores;
#  with SPARK_GRAFT_MASTER set the session factory defers to the
#  submitted master and uses the number only for shuffle sizing.)
# 4. efficiency = (docs_per_sec@4N / docs_per_sec@N) / 4  — gate: >= 0.8
EOF
  exit 0
fi

echo "== scaling rehearsal: levels=$LEVELS sf_dir=$SF_DIR =="

# 1. Package artifact (what --py-files would ship; also smoke-checks
#    the tree zips cleanly with no stray state).
rm -f /tmp/geo_import_spark.zip
(cd "$REPO" && zip -qr /tmp/geo_import_spark.zip geo_import_spark -x '*__pycache__*')
echo "py-files artifact: /tmp/geo_import_spark.zip ($(du -h /tmp/geo_import_spark.zip | cut -f1))"

# 2. Measure: same job, two widths, interleaved rounds (bench.py
#    handles prepare-once, per-level fresh JVMs, best+median).
SPARK_GRAFT_SCALING_LEVELS="$LEVELS" SPARK_GRAFT_SF_DIR="$SF_DIR" \
  python "$REPO/bench.py" --scaling | tail -1 > "$OUT"

# 3. Checklist validation.
python - "$OUT" <<'PY'
import json, sys
art = json.load(open(sys.argv[1]))
lo, hi = art["levels"]
checks = {
    "two widths recorded": str(lo) in art["throughput"] and str(hi) in art["throughput"],
    "width ratio is 4x": hi == 4 * lo,
    ">=3 interleaved samples per width": all(len(v) >= 3 for v in art["samples"].values()),
    "throughput at both widths > 0": all(t > 0 for t in art["throughput"].values()),
    "efficiency (best-ratio) >= 0.8": art["scaling_efficiency"] >= 0.8,
    "efficiency <= 1.05 (physical)": art["scaling_efficiency"] <= 1.05,
}
w = max(map(len, checks))
ok = True
for name, passed in checks.items():
    print(f"  [{'PASS' if passed else 'FAIL'}] {name:<{w}}")
    ok &= passed
print(f"  T({lo})={art['throughput'][str(lo)]:.0f} docs/s  "
      f"T({hi})={art['throughput'][str(hi)]:.0f} docs/s  "
      f"eff={art['scaling_efficiency']} (median {art['scaling_efficiency_median']})")
sys.exit(0 if ok else 1)
PY
echo "artifact: $OUT"
