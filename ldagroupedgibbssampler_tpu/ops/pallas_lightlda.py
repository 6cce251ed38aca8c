"""Fused LightLDA MH sweep kernel (Pallas TPU): gather-free two-step
Metropolis-Hastings z-draws with in-kernel n_dk updates.

TPU replacement for the XLA position-scan MH sweep
(models/lightlda.py::lightlda_sweep), which is gather-bound like the XLA
PCGS sweep was (per-position [D, K] rows of the target/proposal tables).
Same cell-block machinery as ops/pallas_pcgs.py: sequential-safe layout
(no chunk holds two tokens of one document), VMEM-resident
(n_dk + alpha | flag) table, one-hot MXU selects, tiled tril inverse-CDF
draws. Per token (LightPCLDA.java MH structure, :50-70 word proposal /
doc-proposal mixing; CollapsedLightLDA.java:946-1005):

  step 1 (word proposal):  k1 ~ q_w(k) ∝ qw[k][w]  (tril cumsum draw);
      accept w.p. min(1, nd[k1] tw[k1] qw[z] / (nd[z] tw[z] qw[k1]))
      where nd = n_dk^{-i} + alpha_k and tw is the scheme's word term.
  step 2 (doc proposal):   k2 ~ q_d(k) ∝ bf16(nd[k])  (tril cumsum draw);
      accept w.p. min(1, nd[k2] tw[k2] ndq[z1] / (nd[z1] tw[z1] ndq[k2]))
      with ndq = bf16(nd) — the SAME quantised values the draw used, so
      the proposal correction stays exact even where bf16 rounds nd.

The doc proposal is drawn directly from (a bf16 rounding of)
n_dk^{-i} + alpha — the distribution the reference's uniform-token/alpha
mixture approximates (LightPCLDA's trick exists to make a scalar-CPU
draw O(1); the XLA path keeps the mixture form). Every quantity a draw
uses reappears identically in its acceptance ratio (one-hot selects of
the same bf16 tables / the same bf16-rounded nd), so the chain is a
valid MH sampler for the quantised-word-table target.

N_kw accumulates in w-window-major blocks exactly like the PCGS kernel
(zeroed on first_w) — for the PC variants it feeds phi ~ Dir(beta + N_kw);
for the collapsed variant it IS the per-sweep count merge.

NOT K-tiled (decision recorded so it isn't retried): unlike the PCGS
kernels, this kernel keeps the UNTILED chunk body at every K, so the
streamed VMEM gate (ops/pallas_pcgs.py::fused_pcgs_streamed_vmem_bytes,
num_word_tables=2) correctly keeps K>=4096 MH configs on the XLA
fallback. Tiling here would need ~3 staged buffers (qw + ndq16 for the
two draws, plus either staging or recomputing nd/tw for the k1/k2
acceptance selects) across ~6 tile passes — ~1.5x the MXU passes — and
the one-hot-matmul MH formulation is already linear in K (measured
45.4M tok/s at K=100 -> 8.7M at K=1000; extrapolated ~2.6M at K=4096),
so a tiled kernel lands at ~1.7M, at or below the measured 1.8M XLA
fallback (BENCH_MATRIX row 9c). The MH family's O(1)-per-token property
does not survive the gather-free formulation — it IS recovered, round 4,
by `models/ggs_aliasmh.py`: the same count-proposal MH economy on the
GROUPED target runs as bulk XLA with O(1) packed-row gathers per token
(7.57M tok/s at K=4096, BENCH_MATRIX 7e) and is the recommended
large-K MH route; this kernel remains the exact-LightLDA-semantics
(live n_dk) family for K < ~2000.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
    FLAG_ROWS, NBUF, SELECT_PRECISION, cdf_draw, stream_windows)

_GOLD = -1640531527  # 2^32 / golden ratio, as int32


def _mh_kernel(seed_ref, win_w_ref, first_w_ref,
               w_ref, d_ref, zo_ref, win_d_ref, tw_ref, qw_ref, tril_ref,
               *rest, vspan, dspan, kpad, num_topics, chunks, chunk,
               u24_operand):
    rest = list(rest)
    u24_ref = rest.pop(0) if u24_operand else None
    ndk_in_ref, z_out, nkw_out, ndk_ref, dma_sem = rest
    # table input stays in HBM; one VMEM copy (the output block) resident
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(_GOLD))

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(ndk_in_ref, ndk_ref, dma_sem)
        cp.start()
        cp.wait()

    @pl.when(first_w_ref[i] == 1)
    def _():
        nkw_out[:] = jnp.zeros_like(nkw_out)

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vspan, chunk), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (dspan, chunk), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, chunk), 0)
    tril = tril_ref[:, :]

    # 4 uniforms per token: word draw, accept 1, doc draw, accept 2
    if u24_operand:
        u24s = u24_ref[0]
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits((4 * chunks, chunk)),
                             jnp.uint32)
        u24s = pltpu.bitcast(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32)
    inv24 = jnp.float32(2 ** -24)
    acc = jnp.zeros((vspan, kpad), jnp.float32)
    for c in range(chunks):
        wrow = w_ref[0, c, :]
        drow = d_ref[0, c, :]
        zold = zo_ref[0, c, :]
        win_d = win_d_ref[0, c // 128, c % 128]

        oh_d = (iota_d == drow[None, :]).astype(jnp.float32)
        oh_w = (iota_v == wrow[None, :]).astype(jnp.bfloat16)
        oh_zold = (iota_k == zold[None, :]).astype(jnp.float32)

        ndk_win = ndk_ref[:, pl.ds(win_d * dspan, dspan)]
        nd_ext = jax.lax.dot(ndk_win, oh_d,
                             precision=SELECT_PRECISION,
                             preferred_element_type=jnp.float32)
        flag = nd_ext[kpad, :]                             # [chunk]
        nd = nd_ext[:kpad, :] - oh_zold * flag[None, :]    # n^{-i} + alpha
        # word-term / proposal columns for each token's w (bf16 values,
        # exact through the one-hot select's f32 accumulation)
        tw = jax.lax.dot(tw_ref[:, :], oh_w,
                         preferred_element_type=jnp.float32)
        qw = jax.lax.dot(qw_ref[:, :], oh_w,
                         preferred_element_type=jnp.float32)

        # ---- MH step 1: word proposal ----
        k1, totq = cdf_draw(tril, qw.astype(jnp.bfloat16), u24s[4 * c])
        oh_k1 = (iota_k == k1[None, :]).astype(jnp.float32)
        nd_z = jnp.sum(nd * oh_zold, axis=0)
        nd_1 = jnp.sum(nd * oh_k1, axis=0)
        tw_z = jnp.sum(tw * oh_zold, axis=0)
        tw_1 = jnp.sum(tw * oh_k1, axis=0)
        qw_z = jnp.sum(qw * oh_zold, axis=0)
        qw_1 = jnp.sum(qw * oh_k1, axis=0)
        u1 = u24s[4 * c + 1].astype(jnp.float32) * inv24
        take1 = (u1 * (nd_z * tw_z * qw_1) < nd_1 * tw_1 * qw_z) \
            & (totq > 0)
        z1 = jnp.where(take1, k1, zold)
        tw_z1 = jnp.where(take1, tw_1, tw_z)
        nd_z1 = jnp.where(take1, nd_1, nd_z)

        # ---- MH step 2: doc proposal q_d ∝ bf16(n^{-i} + alpha) ----
        # The draw quantises nd to bf16 (the cumsum's dtype), so the
        # acceptance must use the SAME quantised values for the proposal
        # ratio — only the target's doc part cancels against q_d exactly
        # when both are the quantised table:
        #   A2 = nd[k2] tw[k2] ndq[z1] / (nd[z1] tw[z1] ndq[k2])
        ndq16 = nd.astype(jnp.bfloat16)
        ndq = ndq16.astype(jnp.float32)
        ndq_z = jnp.sum(ndq * oh_zold, axis=0)
        ndq_1 = jnp.sum(ndq * oh_k1, axis=0)
        ndq_z1 = jnp.where(take1, ndq_1, ndq_z)
        k2, totd = cdf_draw(tril, ndq16, u24s[4 * c + 2])
        oh_k2 = (iota_k == k2[None, :]).astype(jnp.float32)
        tw_2 = jnp.sum(tw * oh_k2, axis=0)
        nd_2 = jnp.sum(nd * oh_k2, axis=0)
        ndq_2 = jnp.sum(ndq * oh_k2, axis=0)
        u2 = u24s[4 * c + 3].astype(jnp.float32) * inv24
        z2 = jnp.where((u2 * (nd_z1 * tw_z1 * ndq_2)
                        < nd_2 * tw_2 * ndq_z1) & (totd > 0), k2, z1)

        zout = jnp.where(flag > 0.5, z2, zold)
        z_out[0, c, :] = zout

        oh_z = (iota_k == zout[None, :]).astype(jnp.bfloat16)
        delta = (oh_z.astype(jnp.float32) - oh_zold).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(
            delta, oh_d.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [kpad, dspan]
        ndk_ref[:kpad, pl.ds(win_d * dspan, dspan)] = (
            ndk_ref[:kpad, pl.ds(win_d * dspan, dspan)] + upd)
        acc += jax.lax.dot_general(
            oh_w, oh_z, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    nkw_out[:] += acc


@functools.partial(
    jax.jit, static_argnames=("nwin_w", "nwin_d", "vspan", "dspan",
                              "num_topics", "interpret"))
def fused_lightlda_sweep(w3, d3, z_old, ndk_table, tw_vk, qw_vk, seed,
                         win_w, first_w, win_d_chunks, u24=None, *,
                         nwin_w, nwin_d, vspan, dspan, num_topics,
                         interpret=False):
    """One LightLDA MH sweep over sequential-safe cell blocks.

    tw_vk / qw_vk: f32 [V, K] linear-space word target / proposal tables
        (phi for lightpclda; counts+beta for the w2 proposal; the stale
        collapsed ratio for lightcollapsed) — bf16-quantised internally.
    ndk_table: f32 [kpad + FLAG_ROWS, Dpad] as in fused_pcgs_sweep.
    u24: optional int32 [NB, 4 * chunks, chunk] injected uniforms
        (interpreter path), 4 per token.

    Returns (z [NB, chunks, chunk], nkw [nwin_w * vspan, K] int32,
             ndk_table_out)."""
    nb, chunks, chunk = w3.shape
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    vpad = nwin_w * vspan
    v, k = tw_vk.shape
    assert k == num_topics, \
        f"word tables must be [V, K]={v, num_topics}, got {tw_vk.shape}"
    assert qw_vk.shape == tw_vk.shape
    assert ndk_table.shape[0] == kpad + FLAG_ROWS
    tw = jnp.pad(tw_vk, ((0, vpad - v), (0, kpad - k))).T.astype(
        jnp.bfloat16)
    qw = jnp.pad(qw_vk, ((0, vpad - v), (0, kpad - k))).T.astype(
        jnp.bfloat16)

    wd_rows = max(1, -(-chunks // 128))
    wd3 = jnp.pad(win_d_chunks.reshape(nb, chunks),
                  ((0, 0), (0, wd_rows * 128 - chunks))
                  ).reshape(nb, wd_rows, 128)
    tril_op = jnp.tril(jnp.ones((128, 128), jnp.bfloat16))
    dpad = ndk_table.shape[1]
    u24_specs, u24_ops = [], []
    if u24 is not None:
        assert u24.shape == (nb, 4 * chunks, chunk)
        u24_specs = [pl.BlockSpec((1, 4 * chunks, chunk),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        u24_ops = [u24]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd_rows, 128),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((kpad, vspan),
                         lambda i, seed, ww, fw: (0, ww[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, vspan),
                         lambda i, seed, ww, fw: (0, ww[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            *u24_specs,
            pl.BlockSpec(memory_space=pl.ANY),  # table input stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vspan, kpad),
                         lambda i, seed, ww, fw: (ww[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad + FLAG_ROWS, dpad), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    ndk_idx = 10 + len(u24_ops)
    z, nkw, table = pl.pallas_call(
        functools.partial(
            _mh_kernel, vspan=vspan, dspan=dspan, kpad=kpad,
            num_topics=num_topics, chunks=chunks, chunk=chunk,
            u24_operand=u24 is not None),
        out_shape=[
            jax.ShapeDtypeStruct((nb, chunks, chunk), jnp.int32),
            jax.ShapeDtypeStruct((nwin_w * vspan, kpad), jnp.float32),
            jax.ShapeDtypeStruct((kpad + FLAG_ROWS, dpad), jnp.float32),
        ],
        grid_spec=grid_spec,
        input_output_aliases={ndk_idx: 2},  # ndk_table -> out 2
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, win_w, first_w, w3, d3, z_old, wd3, tw, qw, tril_op,
      *u24_ops, ndk_table)
    return z, nkw[:, :num_topics].astype(jnp.int32), table


def _mh_stream_kernel(seed_ref, w_ref, d_ref, zo_ref, ww_ref, wwn_ref,
                      wd_ref, tin_ref, tw_hbm, qw_hbm, tril_ref, *rest,
                      vspan, dspan, kpad, num_topics, chunks, chunk,
                      nblocks, u24_operand):
    rest = list(rest)
    u24_ref = rest.pop(0) if u24_operand else None
    (nkw_in_ref, z_out, tout_ref, nkw_out,
     tb_buf, tw_buf, qw_buf, nkw_buf, sems, cur) = rest
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(_GOLD))
    ensure_dw, ensure_ww, active, finalize = stream_windows(
        i, cur, sems, dspan, vspan, tin_ref, tout_ref, tb_buf,
        nkw_in_ref, nkw_out, nkw_buf,
        [(tw_hbm, tw_buf), (qw_hbm, qw_buf)])

    if u24_operand:
        u24s = u24_ref[0]
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits((4 * chunks, chunk)),
                             jnp.uint32)
        u24s = pltpu.bitcast(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32)
    inv24 = jnp.float32(2 ** -24)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vspan, chunk), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (dspan, chunk), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, chunk), 0)
    tril = tril_ref[:, :]

    for c in range(chunks):
        ensure_dw(wd_ref[0, c // 128, c % 128])
        ensure_ww(ww_ref[0, c // 128, c % 128],
                  wwn_ref[0, c // 128, c % 128])
        slot = active()

        wrow = w_ref[0, c, :]
        drow = d_ref[0, c, :]
        zold = zo_ref[0, c, :]
        oh_d = (iota_d == drow[None, :]).astype(jnp.float32)
        oh_w = (iota_v == wrow[None, :]).astype(jnp.bfloat16)
        oh_zold = (iota_k == zold[None, :]).astype(jnp.float32)

        nd_ext = jax.lax.dot(tb_buf[:, :], oh_d,
                             precision=SELECT_PRECISION,
                             preferred_element_type=jnp.float32)
        flag = nd_ext[kpad, :]
        nd = nd_ext[:kpad, :] - oh_zold * flag[None, :]
        tw = jax.lax.dot(tw_buf[slot], oh_w,
                         preferred_element_type=jnp.float32)
        qw = jax.lax.dot(qw_buf[slot], oh_w,
                         preferred_element_type=jnp.float32)

        k1, totq = cdf_draw(tril, qw.astype(jnp.bfloat16), u24s[4 * c])
        oh_k1 = (iota_k == k1[None, :]).astype(jnp.float32)
        nd_z = jnp.sum(nd * oh_zold, axis=0)
        nd_1 = jnp.sum(nd * oh_k1, axis=0)
        tw_z = jnp.sum(tw * oh_zold, axis=0)
        tw_1 = jnp.sum(tw * oh_k1, axis=0)
        qw_z = jnp.sum(qw * oh_zold, axis=0)
        qw_1 = jnp.sum(qw * oh_k1, axis=0)
        u1 = u24s[4 * c + 1].astype(jnp.float32) * inv24
        take1 = (u1 * (nd_z * tw_z * qw_1) < nd_1 * tw_1 * qw_z) \
            & (totq > 0)
        z1 = jnp.where(take1, k1, zold)
        tw_z1 = jnp.where(take1, tw_1, tw_z)
        nd_z1 = jnp.where(take1, nd_1, nd_z)

        ndq16 = nd.astype(jnp.bfloat16)
        ndq = ndq16.astype(jnp.float32)
        ndq_z = jnp.sum(ndq * oh_zold, axis=0)
        ndq_1 = jnp.sum(ndq * oh_k1, axis=0)
        ndq_z1 = jnp.where(take1, ndq_1, ndq_z)
        k2, totd = cdf_draw(tril, ndq16, u24s[4 * c + 2])
        oh_k2 = (iota_k == k2[None, :]).astype(jnp.float32)
        tw_2 = jnp.sum(tw * oh_k2, axis=0)
        nd_2 = jnp.sum(nd * oh_k2, axis=0)
        ndq_2 = jnp.sum(ndq * oh_k2, axis=0)
        u2 = u24s[4 * c + 3].astype(jnp.float32) * inv24
        z2 = jnp.where((u2 * (nd_z1 * tw_z1 * ndq_2)
                        < nd_2 * tw_2 * ndq_z1) & (totd > 0), k2, z1)

        zout = jnp.where(flag > 0.5, z2, zold)
        z_out[0, c, :] = zout

        oh_z = (iota_k == zout[None, :]).astype(jnp.bfloat16)
        delta = (oh_z.astype(jnp.float32) - oh_zold).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(
            delta, oh_d.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        tb_buf[:kpad, :] = tb_buf[:kpad, :] + upd
        nkw_buf[slot] = nkw_buf[slot] + jax.lax.dot_general(
            oh_w, oh_z, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == nblocks - 1)
    def _():
        finalize()


@functools.partial(
    jax.jit, static_argnames=("nwin_w", "nwin_d", "vspan", "dspan",
                              "num_topics", "interpret"))
def fused_lightlda_sweep_streamed(w3, d3, z_old, ndk_table, tw_vk, qw_vk,
                                  seed, ww_chunks, wd_chunks, u24=None, *,
                                  nwin_w, nwin_d, vspan, dspan, num_topics,
                                  interpret=False):
    """HBM-streamed LightLDA MH sweep over d-window-major StreamBlocks —
    the large-KxD mode (see fused_pcgs_sweep_streamed); same MH semantics
    as fused_lightlda_sweep."""
    nb, chunks, chunk = w3.shape
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    vpad = nwin_w * vspan
    v, k = tw_vk.shape
    assert k == num_topics, \
        f"word tables must be [V, K]={v, num_topics}, got {tw_vk.shape}"
    assert qw_vk.shape == tw_vk.shape
    assert ndk_table.shape[0] == kpad + FLAG_ROWS
    tw = jnp.pad(tw_vk, ((0, vpad - v), (0, kpad - k))).T.astype(
        jnp.bfloat16)
    qw = jnp.pad(qw_vk, ((0, vpad - v), (0, kpad - k))).T.astype(
        jnp.bfloat16)
    nkw0 = jnp.zeros((vpad, kpad), jnp.float32)
    u24_specs, u24_ops = [], []
    if u24 is not None:
        assert u24.shape == (nb, 4 * chunks, chunk)
        u24_specs = [pl.BlockSpec((1, 4 * chunks, chunk),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        u24_ops = [u24]
    wd_rows = max(1, -(-chunks // 128))

    def smem3(a):
        return jnp.pad(a.reshape(nb, chunks),
                       ((0, 0), (0, wd_rows * 128 - chunks))
                       ).reshape(nb, wd_rows, 128)

    # next chunk's w-window (lookahead for the prefetch); last keeps itself
    ww_next = jnp.concatenate([ww_chunks[1:], ww_chunks[-1:]])
    tril_op = jnp.tril(jnp.ones((128, 128), jnp.bfloat16))
    dpad = ndk_table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd_rows, 128),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wd_rows, 128),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wd_rows, 128),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # n_dk table (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # tw windows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # qw windows (HBM)
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            *u24_specs,
            pl.BlockSpec(memory_space=pl.ANY),   # N_kw accumulator (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((kpad + FLAG_ROWS, dspan), jnp.float32),
            pltpu.VMEM((NBUF, kpad, vspan), jnp.bfloat16),
            pltpu.VMEM((NBUF, kpad, vspan), jnp.bfloat16),
            pltpu.VMEM((NBUF, vspan, kpad), jnp.float32),
            pltpu.SemaphoreType.DMA((2 + NBUF + NBUF * 3,)),
            pltpu.SMEM((4 + NBUF,), jnp.int32),
        ],
    )
    # seed=0, w3=1, d3=2, z_old=3, ww3=4, wwn3=5, wd3=6, table=7, tw=8,
    # qw=9, tril=10, [u24], nkw = 11 + extras
    nkw_idx = 11 + len(u24_ops)
    z, table, nkw = pl.pallas_call(
        functools.partial(
            _mh_stream_kernel, vspan=vspan, dspan=dspan, kpad=kpad,
            num_topics=num_topics, chunks=chunks, chunk=chunk, nblocks=nb,
            u24_operand=u24 is not None),
        out_shape=[
            jax.ShapeDtypeStruct((nb, chunks, chunk), jnp.int32),
            jax.ShapeDtypeStruct((kpad + FLAG_ROWS, dpad), jnp.float32),
            jax.ShapeDtypeStruct((vpad, kpad), jnp.float32),
        ],
        grid_spec=grid_spec,
        input_output_aliases={7: 1, nkw_idx: 2},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, w3, d3, z_old, smem3(ww_chunks), smem3(ww_next),
      smem3(wd_chunks), ndk_table, tw, qw, tril_op, *u24_ops, nkw0)
    return z, nkw[:, :num_topics].astype(jnp.int32), table
