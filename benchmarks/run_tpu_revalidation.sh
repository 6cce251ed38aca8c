#!/bin/bash
# One-shot on-chip validation + re-measurement after fused-sweep changes.
# Run whenever the axon TPU tunnel is available:
#   bash benchmarks/run_tpu_revalidation.sh [outdir]
#
# Covers EVERY measurement-matrix row (round-2 VERDICT item 1d): the TPU
# matrix, the CPU-mesh matrix for the sharded schemes, the bf16 gate and
# the headline bench — and FAILS (nonzero exit) if any expected key is
# absent from the emitted JSON, so a coded-but-unmeasured row can never
# be committed again.
set -u
OUT=${1:-/tmp/tpu_reval}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
FAILED=0

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 6000 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "exit=$rc (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
  [ $rc -ne 0 ] && FAILED=1
}

# Every row the TPU matrix must contain. Keep in sync with
# benchmarks/matrix.py — check_keys below fails the script if any is
# missing from the emitted JSON.
TPU_KEYS="1_cgs_cats 2_pcgs_20ng_k20 2d_pcgs_nyt_k100 3_ggs_20ng_k100 \
3b_ggs_vs_cgs_ll_cats 3e_heldout_ll_cats 3f_heldout_ll_20ng_k100 \
5_ggs_20ng_k1000 \
5b_ggs_20ng_k4096 6_ggs_nyt_k100 7_spalias_20ng_k100 \
7c_spalias_20ng_k1000 7d_spalias_20ng_k4096 \
7e_ggs_aliasmh_20ng_k4096 7f_ggs_aliasmh_20ng_k8192 \
8_adlda_20ng_k100 \
8c_adlda_vs_pcgs_ll_20ng 8d_adlda_20ng_k4096 9_lightpclda_20ng_k1000 \
9b_lightpclda_20ng_k100 9c_lightpclda_20ng_k4096 10_ppu_hdplda_20ng"
# Rows that need a multi-device mesh (8-virtual-CPU when one real chip).
MESH_KEYS="2c_sharded_pcgs 3c_sharded_ggs 3d_vocab_sharded_ggs 4_sharded_adlda"

check_keys() {  # check_keys <json> <key...>
  python - "$@" <<'EOF'
import json, sys
path, keys = sys.argv[1], sys.argv[2:]
with open(path) as f:
    results = json.load(f)["results"]
missing = [k for k in keys if k not in results]
if missing:
    sys.exit(f"{path}: MISSING matrix rows: {missing}")
# a row that crashed is recorded as {"error": ...} by matrix.py's
# row_guard — present on disk but NOT measured; fail on those too
errored = [k for k in keys if "error" in results[k]]
if errored:
    sys.exit(f"{path}: rows recorded an ERROR instead of a measurement: "
             f"{ {k: results[k]['error'][:120] for k in errored} }")
print(f"{path}: all {len(keys)} expected rows present and measured")
EOF
  [ $? -ne 0 ] && FAILED=1
}

# 1+2. on-chip kernel checks via the pytest -m tpu target (one command;
# includes the X,Y,X window-reuse hazard schedule)
run tpu_pytest env LDA_TPU_TESTS=1 python -m pytest -m tpu -n 0 tests/test_tpu_kernels.py -v
# 2b. on-chip Geweke of the fused GGS kernel (also covered by the pytest
# target above; kept addressable standalone for artifact regeneration)
# 3. the FULL TPU measurement matrix (every single-chip row)
run matrix python benchmarks/matrix.py --only "${TPU_KEYS// /,}" \
  --out BENCH_MATRIX.json
check_keys BENCH_MATRIX.json $TPU_KEYS
# 3b. the sharded schemes on the 8-virtual-CPU mesh (axon off PYTHONPATH
# so the CPU backend loads; regenerates BENCH_MATRIX_CPU_MESH.json)
run matrix_cpu_mesh env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/matrix.py --only "${MESH_KEYS// /,}",3_ggs,2_pcgs \
  --out BENCH_MATRIX_CPU_MESH.json --quick
check_keys BENCH_MATRIX_CPU_MESH.json $MESH_KEYS
# 4. bf16 fast-path quality gate (GGS bf16 vs 6-seed precise ensemble)
run bf16_gate python benchmarks/bf16_gate.py
python -c "import json,sys; sys.exit(0 if json.load(open('BF16_GATE.json'))['gate_pass'] else 'BF16 gate FAILED')" || FAILED=1
# 5. headline bench (regression guard)
run bench python bench.py
# 6. the FULL CPU test suite incl. the slow tier (the default `pytest -q`
# is the fast tier only — round-3 VERDICT item 7; nothing is lost because
# this step runs the slow statistical chains)
run pytest_full env PYTHONPATH=/root/repo python -m pytest tests/ -q -m "not tpu"  # inherits -n 2

if [ $FAILED -ne 0 ]; then
  echo "=== REVALIDATION FAILED (see logs in $OUT) ==="
  exit 1
fi
echo "=== done; logs in $OUT ==="
