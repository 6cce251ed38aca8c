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
  timeout 4500 "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
}

# 1+2. on-chip kernel checks via the pytest -m tpu target (one command;
# includes the X,Y,X window-reuse hazard schedule)
run tpu_pytest env LDA_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernels.py -v
# 3. re-measure the matrix items the fused sweeps affect (+ the K=4096
# large-K row)
run matrix python benchmarks/matrix.py \
  --only 1_cgs,2_pcgs,2d_pcgs,3b,3e,5b,7,8_adlda,9,10_ppu_hdplda \
  --out BENCH_MATRIX.json
# 4. bf16 fast-path quality gate (GGS precise-vs-bf16 at bench scale)
run bf16_gate python benchmarks/bf16_gate.py
# 5. headline bench (regression guard)
run bench python bench.py
echo "=== done; logs in $OUT ==="
