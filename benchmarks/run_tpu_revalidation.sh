#!/bin/bash
# One-shot on-chip validation + re-measurement after fused-sweep changes.
# Run whenever the axon TPU tunnel is available:
#   bash benchmarks/run_tpu_revalidation.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_reval}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
}

# 1. existing GGS kernel checks (regression guard)
run ggs_kernel_checks python benchmarks/tpu_kernel_checks.py
# 2. new fused PCGS/ADLDA/HDP/MH on-chip checks
run pcgs_checks python benchmarks/tpu_pcgs_checks.py
# 3. re-measure the matrix items the fused sweeps affect
run matrix python benchmarks/matrix.py \
  --only 1_cgs,2_pcgs,2d_pcgs,3b,3e,7,8_adlda,9,10_ppu_hdplda \
  --out BENCH_MATRIX.json
# 4. headline bench (regression guard)
run bench python bench.py
echo "=== done; logs in $OUT ==="
