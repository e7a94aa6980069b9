#!/usr/bin/env bash
# Multi-executor scaling evidence on a REAL standalone cluster:
# start master + worker, package the library, spark-submit --py-files the
# extraction job at N and 4N single-core executors, print both + efficiency.
#
#   ./scripts/cluster_bench.sh [N] [REPLICAS]   # default N=2 -> 4N=8
#
# Single-core executors keep both configurations inside the machine's linear
# scaling region (see BASELINE.md hardware calibration); on a real cluster
# the same script shape applies with multi-core executors per node.
set -euo pipefail

N="${1:-2}"
REPLICAS="${2:-100}"
N4=$((N * 4))
SPARK_HOME="${SPARK_HOME:-/opt/spark}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
HOST="127.0.0.1"
MASTER="spark://${HOST}:7077"
export SPARK_LOCAL_IP="$HOST" SPARK_MASTER_HOST="$HOST"
export PYSPARK_PYTHON="$(command -v python)"

cleanup() {
  "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT
cleanup

"$SPARK_HOME/sbin/start-master.sh" >/dev/null
"$SPARK_HOME/sbin/start-worker.sh" "$MASTER" >/dev/null
sleep 5

ZIP="$(mktemp -d)/ldos_pkg.zip"
(cd "$REPO" && zip -qr "$ZIP" legal_document_ocr_spark -x "*__pycache__*")

# N executors of 2 cores each (fat-enough executors — 1-core executors pay
# disproportionate shuffle fan-out; see BASELINE.md).
# io.compression.codec zstd: the dedup path's payload exchange is the
# shared-disk bottleneck on a one-box "cluster" — zstd shrinks shuffle
# bytes ~2x over lz4 on HTML payloads, measured dup_rate=0.5 1->4-exec
# efficiency 0.78 (lz4) -> 0.898 (zstd) and +19% absolute 4N throughput
# (BASELINE.md round-4). On a real cluster zstd stays right: shuffle
# bytes cost network there, and the CPU overhead is amortized by the
# pipeline being UDF-bound.
# shuffle.partitions = TOTAL CORES (n_exec*2), not 2x: the dedup pipeline
# concentrates ~60% of its work in the distinct-payload UDF stage behind
# one exchange, and 2x-cores partitions AQE-coalesce to ~1.5 waves (25%
# idle cores in the dominant stage — measured eff 0.65-0.73). Exactly one
# full wave + AQE's defaultParallelism floor measured 0.92 (BASELINE.md
# round-4 root-cause).
run_at() {
  local n_exec="$1" dup="$2"
  "$SPARK_HOME/bin/spark-submit" \
    --master "$MASTER" \
    --deploy-mode client \
    --py-files "$ZIP" \
    --conf spark.cores.max="$((n_exec * 2))" \
    --conf spark.executor.cores=2 \
    --conf spark.executor.memory=4g \
    --conf spark.sql.shuffle.partitions="$((n_exec * 2))" \
    --conf spark.io.compression.codec="${SPARK_GRAFT_SHUFFLE_CODEC:-zstd}" \
    "$REPO/scripts/submit_extract.py" \
    --sf-dir "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
    --replicas "$REPLICAS" --dup-rate "$dup" 2>/dev/null | grep '^{'
}

for dup in ${SPARK_GRAFT_DUP_RATES:-0.0 0.5}; do
  # ambient co-tenant load contaminates the WIDE config first (it needs all
  # the cores); sample loadavg around each run so efficiency numbers carry
  # their own adjudication context (same idea as bench.py's canary)
  L0="$(cut -d' ' -f1 /proc/loadavg)"
  echo "== dup_rate=${dup} N=${N} executors (2 cores each) =="
  J1="$(run_at "$N" "$dup")"
  echo "$J1"
  L1="$(cut -d' ' -f1 /proc/loadavg)"
  echo "== dup_rate=${dup} 4N=${N4} executors (2 cores each) =="
  J2="$(run_at "$N4" "$dup")"
  echo "$J2"
  L2="$(cut -d' ' -f1 /proc/loadavg)"
  python - "$J1" "$J2" "$dup" "$L0" "$L1" "$L2" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = a["elapsed_sec"] / b["elapsed_sec"] / 4.0
print(json.dumps({
    "mode": "standalone-cluster spark-submit --py-files",
    "dup_rate": float(sys.argv[3]),
    "docs": a["docs"],
    "t_n": a["elapsed_sec"], "t_4n": b["elapsed_sec"],
    "throughput_n": a["docs_per_sec"], "throughput_4n": b["docs_per_sec"],
    "executors_n": a["executors"], "executors_4n": b["executors"],
    "efficiency": round(eff, 3),
    "loadavg_1m": [float(sys.argv[4]), float(sys.argv[5]), float(sys.argv[6])],
}))
EOF
done
