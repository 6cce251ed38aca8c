"""Arithmetic-intensity / MFU table for the fused kernel bodies
(round-3 VERDICT item 8).

For each (kernel body, K) row of the measurement matrix this script
models the per-sweep MXU FLOPs and HBM window-stream bytes FROM THE
ACTUAL BLOCK METADATA (padded chunk counts, window-switch counts — all
host-side NumPy, no kernels run), combines them with the measured
tokens/s already in BENCH_MATRIX.json, and prints the roofline
accounting: achieved TFLOP/s, % of v5e bf16 peak, achieved GB/s, % of
HBM peak, and which ceiling binds. The table is committed to PERF.md so
large-K perf work targets the real bottleneck instead of guessing.

FLOP conventions: 1 MAC = 2 FLOP; the f32 HIGHEST one-hot selects
count 2 bf16-equivalent MXU passes — the ON-CHIP MEASURED cost ratio
(f32-HIGHEST matmul throughput ~0.5x bf16 on this target; an earlier
bf16x6 model predicted 6x and was refuted by the same probe) —
and default-precision bf16 matmuls count 1. The %peak column uses the
197 TFLOP/s dense-bf16 sheet number; note the measured PRACTICAL
ceiling for the kernels' [<=512,128]x[128,128] one-hot shapes is
~80 TFLOP/s (40 TMAC/s micro-probe), so rows near ~40% of sheet peak
are running near the achievable rate for their shape. VPU elementwise work is NOT
counted as FLOPs (it shares no roofline with the MXU) — kernels whose
cost is VPU-pass-bound therefore show low MXU utilisation by design and
the note column says so.

Usage: python benchmarks/mfu_table.py [--matrix BENCH_MATRIX.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

V5E_BF16_TFLOPS = 197.0     # v5e peak dense bf16
V5E_HBM_GBS = 819.0         # v5e HBM bandwidth

D20, V20, MEAN_LEN = 11269, 20000, 120


def kpad_of(k):
    return max(128, ((k + 127) // 128) * 128)


def ggs_model(k, stream):
    """Per-sweep FLOPs/bytes of the fused GGS z-draw kernel
    (ops/pallas_zdraw.py) at 20NG shapes."""
    import bench
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler
    corpus = bench.synth_corpus()
    m = LDAGroupedGibbsSampler(LDAConfig(scheme="ggs", topics=k,
                                         exec_time=-1))
    # block building is host-side; no step is run
    m.corpus = corpus
    m._prepare_device_data(corpus)
    b = m._blocks
    kp, vs, ds, ch = kpad_of(k), b.vspan, b.dspan, b.chunk
    chunks = b.w_local.size // ch
    # per chunk: theta one-hot select [kp,ds]@[ds,ch] (bf16 fast path),
    # phi select [kp,vs]@[vs,ch], tril cdf kp/128 x [128,128]@[128,ch],
    # N_kw acc [vs,ch]@[ch,kp]
    macs = chunks * (kp * ds * ch + kp * vs * ch + kp * 128 * ch
                     + vs * ch * kp)
    flops = 2 * macs
    # streamed-theta mode: each chunk DMAs its [kp, ds] f32 theta window
    byts = chunks * kp * ds * 4 if stream else 0
    return flops, byts, corpus.num_tokens


def pcgs_model(k, collapsed, mh=False):
    """Per-sweep FLOPs/bytes of the fused PCGS-family sweep bodies
    (ops/pallas_pcgs.py resident/streamed/tiled; ops/pallas_lightlda.py
    for mh=True) at 20NG shapes."""
    import bench
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    from ldagroupedgibbssampler_tpu.models import fused_sweep as fs
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import FLAG_ROWS
    corpus = bench.synth_corpus()
    scheme = "lightpclda" if mh else ("adlda" if collapsed else "spalias")
    m = create_model(LDAConfig(scheme=scheme, topics=k, exec_time=-1))
    m.corpus = corpus
    kp = kpad_of(k)
    # decide mode the way the gate does (backend-independent pieces)
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
        fused_pcgs_vmem_bytes)
    res = fused_pcgs_vmem_bytes(corpus.num_docs, k, 128,
                                collapsed=collapsed) \
        <= fs._FUSED_PCGS_VMEM_BUDGET
    if res:
        b = corpus.cell_blocks_seq(block=m.config.token_block, vspan=128,
                                   dspan=128)
        mode = "resident"
    else:
        from ldagroupedgibbssampler_tpu.corpus.ragged import (
            build_stream_blocks)
        blk = m._streamed_block()
        vs = m._streamed_vspan()
        if vs == 0:
            return None
        b = build_stream_blocks(corpus.tokens, corpus.token_doc_ids(),
                                corpus.num_types, corpus.num_docs,
                                block=blk, vspan=vs, dspan=128)
        mode = "streamed"
    vs, ds, ch = b.vspan, b.dspan, b.chunk
    chunks = b.w_local.size // ch
    # matmul terms per chunk (see _pcgs_kernel / _pcgs_stream_kernel):
    #   nd_ext  f32 HIGHEST (kp+8)*ds*ch   -> 2 measured passes
    #   ph select bf16 kp*vs*ch (not in collapsed mode)
    #   sel     f32 HIGHEST kp*vs*ch (collapsed only) -> 2 passes
    #   tril cdf kp*128*ch
    #   delta upd kp*ch*ds
    #   nkw acc  vs*ch*kp (bf16 one-hot)
    sp = 2  # measured bf16-equivalent passes of an f32 HIGHEST select
    macs_c = sp * (kp + FLAG_ROWS) * ds * ch + kp * 128 * ch \
        + kp * ch * ds + vs * ch * kp
    if collapsed:
        macs_c += sp * kp * vs * ch
    elif mh:
        # MH kernel: two word tables (target + proposal) + accept math;
        # one select each + nkw acc + delta — no tril cdf (O(1) draws)
        macs_c = sp * (kp + FLAG_ROWS) * ds * ch + 2 * kp * vs * ch \
            + kp * ch * ds + vs * ch * kp
    macs = chunks * macs_c
    flops = 2 * macs
    byts = 0
    if mode == "streamed":
        wwc = np.asarray(b.win_w_chunks).reshape(-1)
        wdc = np.asarray(b.win_d_chunks).reshape(-1)
        w_sw = int(np.sum(wwc[1:] != wwc[:-1])) + 1
        d_sw = int(np.sum(wdc[1:] != wdc[:-1])) + 1
        # per w-window switch: N_kw rmw window in+out (f32) + the word
        # table (bf16 phi; collapsed: none - the rmw window IS the table;
        # mh: two bf16 tables)
        per_w = vs * kp * 4 * 2
        if not collapsed:
            per_w += vs * kp * 2 * (2 if mh else 1)
        # per d-window switch: n_dk table slice out+in (f32)
        per_d = (kp + FLAG_ROWS) * ds * 4 * 2
        byts = w_sw * per_w + d_sw * per_d
    return {"mode": mode, "flops": flops, "bytes": byts,
            "tokens": corpus.num_tokens, "chunks": chunks}


ROWS = [
    # (label, matrix key, builder)
    ("GGS zdraw K=100 (resident)", "3_ggs_20ng_k100",
     lambda: dictify(ggs_model(100, stream=False))),
    ("GGS zdraw K=1000 (streamed theta)", "5_ggs_20ng_k1000",
     lambda: dictify(ggs_model(1000, stream=True))),
    ("GGS zdraw K=4096 (streamed theta)", "5b_ggs_20ng_k4096",
     lambda: dictify(ggs_model(4096, stream=True))),
    ("PCGS sweep K=100 (resident)", "7_spalias_20ng_k100",
     lambda: pcgs_model(100, collapsed=False)),
    ("PCGS sweep K=1000 (streamed)", "7c_spalias_20ng_k1000",
     lambda: pcgs_model(1000, collapsed=False)),
    ("PCGS sweep K=4096 (streamed, K-tiled)", "7d_spalias_20ng_k4096",
     lambda: pcgs_model(4096, collapsed=False)),
    ("Collapsed (ADLDA) K=100 (resident)", "8_adlda_20ng_k100",
     lambda: pcgs_model(100, collapsed=True)),
    ("Collapsed (ADLDA) K=4096 (streamed, K-tiled)", "8d_adlda_20ng_k4096",
     lambda: pcgs_model(4096, collapsed=True)),
    ("LightLDA MH K=100 (resident)", "9b_lightpclda_20ng_k100",
     lambda: pcgs_model(100, collapsed=False, mh=True)),
    ("LightLDA MH K=1000 (streamed)", "9_lightpclda_20ng_k1000",
     lambda: pcgs_model(1000, collapsed=False, mh=True)),
]


def dictify(t):
    f, b, n = t
    return {"mode": "-", "flops": f, "bytes": b, "tokens": n}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="BENCH_MATRIX.json")
    args = ap.parse_args(argv)
    with open(args.matrix) as fh:
        results = json.load(fh)["results"]
    print("| body / config | meas. Mtok/s | sweep ms | model TFLOP | "
          "TFLOP/s (%peak) | stream GB (GB/s, %HBM) | bound |")
    print("|---|---|---|---|---|---|---|")
    for label, key, build in ROWS:
        row = results.get(key, {})
        tps = row.get("tokens_per_sec")
        if not tps:
            print(f"| {label} | (no matrix row) | | | | | |")
            continue
        mdl = build()
        if mdl is None:
            print(f"| {label} | {tps/1e6:.1f} | (gate off) | | | | |")
            continue
        ms = mdl["tokens"] / tps * 1e3
        tf = mdl["flops"] / 1e12
        tfs = tf / (ms / 1e3)
        gb = mdl["bytes"] / 1e9
        gbs = gb / (ms / 1e3)
        pk = 100 * tfs / V5E_BF16_TFLOPS
        ph = 100 * gbs / V5E_HBM_GBS
        bound = ("HBM" if ph > max(pk, 30) else
                 "MXU" if pk > 50 else "VPU/other")
        sgb = f"{gb:.2f} ({gbs:.0f} GB/s, {ph:.0f}%)" if gb else "-"
        print(f"| {label} | {tps/1e6:.1f} | {ms:.1f} | {tf:.2f} | "
              f"{tfs:.1f} ({pk:.0f}%) | {sgb} | {bound} |")


if __name__ == "__main__":
    main()
