#!/usr/bin/env bash
# The documented soak config as ONE command (r10 verdict ask #3): run
# graft.Scale against a ScaleGen-scaled dir with the partition-sizing
# rule applied automatically — no hand SPARK_GRAFT_* flags needed to
# reproduce the zero-spill ×1000 config:
#
#   - shuffle partitions: Scale itself defaults to 2× cores (the 64p
#     rule: tasks ≈ 2× cores at data-sized memory — the r10 sweep's
#     sweet spot; 32p spilled 8.9 GB on q127 ×1000, 128p paid 4–6× in
#     locality)
#   - heap: "data-sized memory", derived from the scaled dir's on-disk
#     parquet size at the measured ratio of the zero-spill runs
#     (×1000 ≈ 3.3 GB on disk ran clean at 48 GB: ~15× — snappy
#     parquet decompresses ~3-4× and the shingle explode multiplies
#     another ~4×), clamped to [8, 48] GB
#   - --certify: turn on the NOSPILL assert (Scale exits non-zero if
#     the min-wall repeats spilled to disk), making "zero spill" a
#     checkable exit code — the certification mode for the ×1000
#     inverted-index family, where data-sized heap hits the 48 GB cap
#     (the exact r10-proven config). At smaller scales some spill is
#     config-legal, so the assert is opt-in.
#
#   tools/soak.sh --certify /tmp/x1000 q127_curation_ledger,q104_containment
#   tools/soak.sh /tmp/x300            # full hot list (Scale.hot)
set -euo pipefail
cd "$(dirname "$0")/.."

assert_nospill=0
if [[ "${1:-}" == "--certify" ]]; then assert_nospill=1; shift; fi
dir="$1"; shift || true
dir_kb=$(du -sk "$dir" | cut -f1)
heap_gb=$(( (dir_kb * 15 + 1048575) / 1048576 ))
(( heap_gb < 8 )) && heap_gb=8
(( heap_gb > 48 )) && heap_gb=48

echo "[soak] dir=$dir on-disk=$((dir_kb/1024))MB heap=${heap_gb}g assert_nospill=$assert_nospill" >&2
SPARK_DRIVER_MEM="${heap_gb}g" SPARK_GRAFT_REPEATS="${SPARK_GRAFT_REPEATS:-2}" \
  SPARK_GRAFT_ASSERT_NOSPILL="$assert_nospill" \
  exec tools/run_main.sh graft.Scale "$dir" "$@"
