"""Fused PCGS sweep kernel (Pallas TPU): gather-free partially collapsed
Gibbs with in-kernel n_dk updates.

The TPU replacement for the doc-sequential XLA sweep
(ops/kernels.py::doc_sequential_sweep) for the PCGS conditional
(n_dk + alpha_k) * phi[k][w] (UncollapsedParallelLDA.java:1509-1513, phi
fixed within the sweep). The XLA sweep is gather-bound: the per-position
phi-row gather is ~90% of its time (13.1 ms with vs 1.3 ms without at 20NG
K=20). This kernel removes every gather AND the N_kw scatter:

  - tokens live in SEQUENTIAL-SAFE cell blocks
    (corpus/ragged.py::build_cell_blocks_seq): (w-window, d-window,
    occurrence-rank) pseudo-cells, so no 128-token chunk contains two
    tokens of the same document. Chunks execute sequentially (in-kernel
    loop + sequential TPU grid), so applying each chunk's n_dk updates
    before the next chunk reads the table reproduces the reference's
    per-token update semantics under a reordered — still valid — Gibbs
    schedule.
  - the n_dk state rides as a VMEM-RESIDENT f32 table [kpad + 8, Dpad]
    holding n_dk + alpha_k (transposed, exact: counts are integers far
    below 2^24), input/output-aliased so the updated table IS the sweep's
    n_dk output. Row kpad carries the per-doc random-scan selection flag
    (doc_mask); unselected and padding tokens keep z and contribute no
    update (their delta one-hot is zero because z_out == z_old).
  - per chunk, everything is MXU matmuls against window-local tables:
    n_dk rows and the flag via a one-hot doc select of the table window
    (f32 values, SELECT_PRECISION — see its comment), phi
    rows via a one-hot type select (bf16 tables, the GGS kernel's fast
    path), the inverse-CDF via the tiled tril cumsum, the token's own
    assignment excluded by subtracting onehot(z_old) (the reference's
    decrement, :1505), and both the n_dk update and the N_kw accumulation
    as one-hot outer-product matmuls.

N_kw accumulates into w-window-major blocks exactly like
ops/pallas_zdraw.py (zeroed on first_w), so phi ~ Dir(beta + N_kw) follows
directly; n_dk never needs a rebuild.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GOLD = -1640531527  # 2^32 / golden ratio, as int32

FLAG_ROWS = 8  # extra table rows; row kpad = doc-mask flag, rest zero

# Precision of the READ-ONLY one-hot selects (n_dk rows via oh_d, live
# N_kw rows via oh_w): HIGHEST (exact for the integer+alpha values).
# Round-4 measurements (PERF.md, MFU table): Mosaic supports only
# DEFAULT | HIGHEST in-kernel (Precision.HIGH raises NotImplementedError
# in the dot lowering), and an on-chip micro-probe put f32-HIGHEST
# matmul throughput at ~0.62x of f32-DEFAULT and ~0.5x of bf16 — i.e.
# HIGHEST costs ~2 bf16-equivalent MXU passes, NOT the 6 a bf16x6 model
# would predict, so demoting these selects buys ~12% at K=4096, not the
# 2x an earlier model suggested. DEFAULT is NOT statistically safe on
# the (n_dk + alpha) table as stored: bf16-rounding a value like
# 1 + alpha before the own-token exclusion subtracts 1 destroys the
# small remainder (catastrophic cancellation in the own-topic
# conditional). It would become safe under a counts-only table with
# alpha added post-select (small counts are bf16-exact); measured
# option, not currently taken.
SELECT_PRECISION = jax.lax.Precision.HIGHEST


def cdf_draw(tril, probs, u24, lastnz_const=None):
    """Tiled inverse-CDF categorical draw over the topic axis.

    probs: bf16 [kpad, chunk] unnormalised masses (rows >= num_topics must
    be zero). u24: int32 [chunk] uniforms in [0, 2^24). The cumsum runs as
    per-128-row tril matmuls with running offsets folded into the
    threshold (O(kpad*128) MXU work). Returns (z int32 [chunk], total f32
    [chunk]).

    z = #{k : cdf_k <= u} clamped to the LAST NONZERO topic, not to
    num_topics-1: when u*total rounds up to total in f32 the raw count
    overshoots into the zero tail, and a plain K-1 clamp would assign a
    zero-probability topic (breaking the exact-zero-support guarantee the
    Polya-Urn/VS samplers rely on). `lastnz_const` (positive-support
    schemes: floored phi, or the collapsed conditional with beta > 0)
    replaces the masked-iota max with that constant, skipping its
    K-proportional VPU passes. The last nonzero index is computed
    directly as a masked-iota max over probs — exact by construction
    (and one VPU pass instead of the former per-tile cumsum-vs-total
    compare passes, whose exactness rested on an fp-accumulation-order
    argument). A fully hierarchical cdf (tile totals locate the target
    tile, one tril matmul resolves it) measured SLOWER on the sibling GGS
    kernel both via a skinny tile-sum matmul (the MXU is pass-bound) and
    via VPU tile sums (the kernel is VPU-bound at large K); the per-tile
    tril form below is the measured optimum.
    """
    kpad, chunk = probs.shape
    ntile = kpad // 128
    # per-128-row tiles of compare -> astype -> multiply -> max: both a
    # full-height [kpad, chunk] mask and jnp.where on an i1 vector trip a
    # Mosaic relayout bug ("non-singleton dimension replicated in
    # destination"); the arithmetic form lowers cleanly
    if lastnz_const is not None:
        # positive-support schemes (floored phi / collapsed beta>0): the
        # last nonzero topic is ALWAYS num_topics-1, so the ntile
        # compare/cast/mul/max passes are skipped (VPU passes scale with
        # K; part of the round-4 large-K dense-path speedup)
        lastnz = jnp.full((chunk,), lastnz_const, jnp.int32)
    else:
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (128, chunk), 0)
        lastnz = jnp.zeros((chunk,), jnp.int32)
        for t in range(ntile):
            # f32 cast before the compare: Mosaic rejects bf16-vs-scalar
            # comparisons on this target
            m = (probs[t * 128:(t + 1) * 128, :].astype(jnp.float32)
                 > 0).astype(jnp.int32)
            lastnz = jnp.maximum(
                lastnz, jnp.max((iota_t + t * 128) * m, axis=0))
    tiles = [jax.lax.dot(tril, probs[t * 128:(t + 1) * 128, :],
                         preferred_element_type=jnp.float32)
             for t in range(ntile)]
    offs = [jnp.zeros((chunk,), jnp.float32)]
    total = tiles[0][127, :]
    for t in range(1, ntile):
        offs.append(total)
        total = total + tiles[t][127, :]
    u = u24.astype(jnp.float32) * jnp.float32(2 ** -24) * total
    cnt = jnp.zeros((chunk,), jnp.int32)
    for t in range(ntile):
        cnt = cnt + jnp.sum(
            (tiles[t] <= (u - offs[t])[None, :]).astype(jnp.int32),
            axis=0)
    return jnp.minimum(cnt, lastnz), total


def _pcgs_kernel(seed_ref, win_w_ref, first_w_ref,
                 w_ref, d_ref, zo_ref, win_d_ref, *rest,
                 vspan, dspan, kpad, num_topics, chunks, chunk,
                 u24_operand, collapsed, positive_support=False):
    rest = list(rest)
    ph_ref = None if collapsed else rest.pop(0)
    tril_ref = rest.pop(0)
    if collapsed:
        nkc_ref = rest.pop(0)
        beta_ref = rest.pop(0)
        nkw_old_ref = rest.pop(0)
    u24_ref = rest.pop(0) if u24_operand else None
    ndk_in_ref, z_out, nkw_out, ndk_ref = rest[:4]
    scratch = rest[4:]
    nk_buf = scratch.pop(0) if collapsed else None
    dma_sem = scratch.pop(0)
    # ndk_in_ref aliases ndk_ref at the HBM level (input_output_aliases)
    # and stays in HBM (ANY): only ONE VMEM copy of the table is resident
    # (the output block, held across the whole grid). Seed it from HBM
    # once; afterwards all reads and writes go through the output ref so
    # updates are chunk-sequential.
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(_GOLD))

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(ndk_in_ref, ndk_ref, dma_sem)
        cp.start()
        cp.wait()
        if collapsed:
            # live (V beta + n_k) denominators, seeded from the sweep-entry
            # totals (HBM, read once) and updated after every chunk
            cp2 = pltpu.make_async_copy(nkc_ref, nk_buf, dma_sem)
            cp2.start()
            cp2.wait()

    @pl.when(first_w_ref[i] == 1)
    def _():
        if collapsed:
            # LIVE counts: the N_kw output window doubles as the word
            # table, seeded from the sweep-entry counts of this w-window
            nkw_out[:] = nkw_old_ref[:]
        else:
            nkw_out[:] = jnp.zeros_like(nkw_out)

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vspan, chunk), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (dspan, chunk), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, chunk), 0)
    tril = tril_ref[:, :]

    if u24_operand:
        # injected 24-bit uniforms (interpreter path: the in-kernel PRNG is
        # TPU-only; pltpu.InterpretParams lowers prng_random_bits to zeros)
        u24s = u24_ref[0]
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits((chunks, chunk)),
                             jnp.uint32)
        u24s = pltpu.bitcast(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32)
    acc = jnp.zeros((vspan, kpad), jnp.float32)
    for c in range(chunks):
        wrow = w_ref[0, c, :]
        drow = d_ref[0, c, :]
        zold = zo_ref[0, c, :]
        win_d = win_d_ref[0, c // 128, c % 128]

        oh_d = (iota_d == drow[None, :]).astype(jnp.float32)
        oh_w = (iota_v == wrow[None, :]).astype(jnp.bfloat16)
        oh_zold = (iota_k == zold[None, :]).astype(jnp.float32)

        # one-hot doc select of (n_dk + alpha | flag) rows (bf16x3 — see
        # SELECT_PRECISION; the table itself stays exact, only this
        # read-only select is 2^-22-approximate)
        ndk_win = ndk_ref[:, pl.ds(win_d * dspan, dspan)]
        nd_ext = jax.lax.dot(ndk_win, oh_d,
                             precision=SELECT_PRECISION,
                             preferred_element_type=jnp.float32)
        flag = nd_ext[kpad, :]                             # [chunk]
        corr = oh_zold * flag[None, :]                     # own-z exclusion
        nd = nd_ext[:kpad, :] - corr                       # decrement own z
        if collapsed:
            # ADLDA word term against LIVE counts with self-correction:
            # select this chunk's N_kw rows from the in-VMEM live window
            # (counts are stale only WITHIN a chunk, <= 128 tokens — vs
            # the reference's full-sweep cross-worker staleness,
            # ADLDA.java:176-332), exclude the token's own count from
            # numerator and the live (V beta + n_k) denominator.
            sel = jax.lax.dot_general(
                nkw_out[:, :], oh_w.astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                precision=SELECT_PRECISION,
                preferred_element_type=jnp.float32)        # [kpad, chunk]
            num = sel + beta_ref[0, 0] - corr
            den = nk_buf[:, 0:1] - corr
            probs = (nd * (num / den)).astype(jnp.bfloat16)
        else:
            ph = jax.lax.dot(ph_ref[:, :], oh_w,
                             preferred_element_type=jnp.float32)
            probs = (nd * ph).astype(jnp.bfloat16)         # [kpad, chunk]
        znew, total = cdf_draw(
            tril, probs, u24s[c],
            lastnz_const=num_topics - 1 if positive_support else None)
        zout = jnp.where((flag > 0.5) & (total > 0), znew, zold)
        z_out[0, c, :] = zout

        oh_z = (iota_k == zout[None, :]).astype(jnp.bfloat16)
        # n_dk table update: one-hot outer product of (new - old); zero for
        # kept tokens (zout == zold) and padding (oh_d column is zero)
        delta = (oh_z.astype(jnp.float32) - oh_zold).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(
            delta, oh_d.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [kpad, dspan]
        ndk_ref[:kpad, pl.ds(win_d * dspan, dspan)] = (
            ndk_ref[:kpad, pl.ds(win_d * dspan, dspan)] + upd)
        if collapsed:
            # apply the chunk's N_kw delta to the live window and the live
            # n_k totals before the next chunk reads them ({-1,0,1} values
            # are bf16-exact; f32 accumulation keeps counts exact)
            nkw_out[:, :] = nkw_out[:, :] + jax.lax.dot_general(
                oh_w, delta, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            nk_buf[:, :] = nk_buf[:, :] + jnp.sum(
                delta.astype(jnp.float32), axis=1, keepdims=True)
        else:
            acc += jax.lax.dot_general(
                oh_w, oh_z, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    if not collapsed:
        nkw_out[:] += acc


@functools.partial(
    jax.jit, static_argnames=("nwin_w", "nwin_d", "vspan", "dspan",
                              "num_topics", "interpret",
                              "positive_support"))
def fused_pcgs_sweep(w3, d3, z_old, ndk_table, phi_vk, seed, win_w, first_w,
                     win_d_chunks, u24=None, nk_plus=None, beta=None, *,
                     nwin_w, nwin_d, vspan, dspan, num_topics,
                     interpret=False, positive_support=False):
    """One PCGS Gibbs sweep: draw z for every token with immediate n_dk
    updates, accumulate N_kw, and return the updated n_dk table.

    w3 / d3 / z_old: int32 [NB, chunks, chunk] sequential-safe cell blocks
        (window-local ids; sentinel vspan / dspan on padding slots).
    ndk_table: f32 [kpad + FLAG_ROWS, Dpad] — (n_dk + alpha_k).T padded;
        row kpad = doc_mask flag (1.0 selected / 0.0 not). Aliased: the
        returned table is this buffer updated in place (donate it).
    phi_vk: f32 [V, K] word table: phi, fixed for the whole sweep, for the
        PCGS/GGS-family conditional — or the sweep-entry N_kw COUNTS
        (pure integers) for the collapsed ADLDA conditional (with
        `nk_plus`), which the kernel keeps LIVE chunk to chunk.
    u24: optional int32 [NB, chunks, chunk] of 24-bit uniforms in
        [0, 2^24); replaces the in-kernel PRNG (which InterpretParams
        cannot lower) — the off-TPU test path.
    nk_plus: optional f32 [K] of (V beta + n_k) sweep-entry denominators
        (consistent with the `phi_vk` counts). When given (with `beta`),
        the sweep is the COLLAPSED conditional
        (n_dk + alpha_k)(beta + N_kw - own)/(V beta + n_k - own) — ADLDA
        (MyWorkerRunnable.java:65-215) with the token's own assignment
        excluded exactly, and with N_kw / n_k kept LIVE: each chunk's
        count deltas apply before the next chunk draws, so counts are
        stale only within one 128-token chunk (the reference's replicas
        are stale across the whole sweep, ADLDA.java:176-332). The
        returned nkw equals the live table at sweep end == an exact
        recount of the returned z.

    Returns (z [NB, chunks, chunk], nkw [nwin_w * vspan, K] int32,
             ndk_table_out [kpad + FLAG_ROWS, Dpad] f32).
    """
    nb, chunks, chunk = w3.shape
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    vpad = nwin_w * vspan
    v, k = phi_vk.shape
    assert k == num_topics, \
        f"word table must be [V, K]={v, num_topics}, got {phi_vk.shape}"
    collapsed = nk_plus is not None
    assert ndk_table.shape[0] == kpad + FLAG_ROWS
    nkc_specs, nkc_ops = [], []
    ph_specs, ph_ops = [], []
    if collapsed:
        assert beta is not None, "collapsed mode needs beta"
        # [kpad, 128] column-replicated denominators; padding rows get 1.0
        # so num/den stays finite (num is beta with zero nd there)
        nkc = jnp.pad(nk_plus.astype(jnp.float32), (0, kpad - k),
                      constant_values=1.0)
        nkw_old = jnp.pad(phi_vk.astype(jnp.float32),
                          ((0, vpad - v), (0, kpad - k)))
        nkc_ops = [jnp.broadcast_to(nkc[:, None], (kpad, 128)),
                   jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)),
                   nkw_old]
        nkc_specs = [pl.BlockSpec(memory_space=pl.ANY),  # nk seed (HBM)
                     pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                  memory_space=pltpu.SMEM),
                     pl.BlockSpec((vspan, kpad),
                                  lambda i, seed, ww, fw: (ww[i], 0),
                                  memory_space=pltpu.VMEM)]
    else:
        ph = jnp.pad(phi_vk, ((0, vpad - v), (0, kpad - k))).T
        ph_ops = [ph.astype(jnp.bfloat16)]
        ph_specs = [pl.BlockSpec((kpad, vspan),
                                 lambda i, seed, ww, fw: (0, ww[i]),
                                 memory_space=pltpu.VMEM)]

    wd_rows = max(1, -(-chunks // 128))
    wd3 = jnp.pad(win_d_chunks.reshape(nb, chunks),
                  ((0, 0), (0, wd_rows * 128 - chunks))
                  ).reshape(nb, wd_rows, 128)
    tril_op = jnp.tril(jnp.ones((128, 128), jnp.bfloat16))
    dpad = ndk_table.shape[1]
    u24_specs, u24_ops = [], []
    if u24 is not None:
        assert u24.shape == (nb, chunks, chunk)
        u24_specs = [pl.BlockSpec((1, chunks, chunk),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        u24_ops = [u24]
    scratch_shapes = ([pltpu.VMEM((kpad, 128), jnp.float32)]
                      if collapsed else []) + [pltpu.SemaphoreType.DMA]
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
            *ph_specs,
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            *nkc_specs,
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
        scratch_shapes=scratch_shapes,
    )
    ndk_idx = (8 + len(ph_ops) + len(nkc_ops) + len(u24_ops))
    z, nkw, table = pl.pallas_call(
        functools.partial(
            _pcgs_kernel, vspan=vspan, dspan=dspan, kpad=kpad,
            num_topics=num_topics, chunks=chunks, chunk=chunk,
            u24_operand=u24 is not None, collapsed=collapsed,
            positive_support=positive_support),
        out_shape=[
            jax.ShapeDtypeStruct((nb, chunks, chunk), jnp.int32),
            jax.ShapeDtypeStruct((nwin_w * vspan, kpad), jnp.float32),
            jax.ShapeDtypeStruct((kpad + FLAG_ROWS, dpad), jnp.float32),
        ],
        grid_spec=grid_spec,
        input_output_aliases={ndk_idx: 2},  # ndk_table -> out 2
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, win_w, first_w, w3, d3, z_old, wd3, *ph_ops, tril_op,
      *nkc_ops, *u24_ops, ndk_table)
    return z, nkw[:, :num_topics].astype(jnp.int32), table


def fused_pcgs_vmem_bytes(num_docs, num_topics, dspan, collapsed=False,
                          vspan=128):
    """VMEM residency estimate for the RESIDENT fused-PCGS eligibility
    gate: the n_dk table, plus — in the live-count collapsed (ADLDA) mode
    — the per-window operands that mode adds on top of it: the f32
    nkw_old input block ([vspan, kpad]) and the live-n_k scratch
    ([kpad, 128]), ~2 MB extra at K=4096 (ADVICE round-2 item 2)."""
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    nwin_d = max(1, (num_docs + dspan - 1) // dspan)
    table = (kpad + FLAG_ROWS) * nwin_d * dspan * 4
    if collapsed:
        table += max(128, vspan) * kpad * 4 + kpad * 128 * 4
    # the RESIDENT kernel keeps the UNTILED chunk body at every K, so its
    # per-chunk scoped-VMEM temps count against the budget too: a
    # tiny-corpus K >= 2048 config whose table alone fits must still fail
    # over to the K-tiled STREAMED kernel rather than compile-OOM here.
    # The 7*kpad*128*4 constant is the STREAMED kernel's measured
    # calibration (compile-OOM at kpad=4096, round 3) reused as a
    # CONSERVATIVE bound — the resident chunk body has the same shape of
    # [kpad, 128] temps (selects/probs/cdt/masks) minus the window
    # machinery, so its true footprint is <= the streamed one. The
    # measured resident rows (K<=1000 on the bench corpus) sit far from
    # the budget either way; tests/test_fused_integration.py pins the
    # resident/streamed decision for those rows so a recalibration that
    # silently flips them is caught.
    return table + 7 * kpad * 128 * 4


NBUF = 3  # streamed-window buffer slots: active / prefetching / draining

# kpad threshold at which the STREAMED kernels switch to the K-TILED
# chunk body: probs staged through a [kpad, 128] bf16 VMEM scratch and
# every other per-chunk temp bounded at one 128-row K-tile, so the
# Mosaic scoped-VMEM allocation stops growing ~7*kpad*128*4 with K (the
# round-3 measured compile-time OOM at kpad=4096). Below the threshold
# the untiled body (fewer passes over probs) remains the measured
# optimum.
KTILE_MIN = 2048


def fused_pcgs_streamed_vmem_bytes(num_topics, vspan, dspan, block,
                                   collapsed=False, num_word_tables=1,
                                   u24=False):
    """VMEM scratch + operand-block estimate for the STREAMED sweep
    variants (the gate the resident path's fused_pcgs_vmem_bytes is for
    the n_dk table). Dominant terms at large K: the NBUF word-table
    slots ([NBUF, kpad, vspan], bf16 — f32 when collapsed) and the NBUF
    N_kw accumulator slots ([NBUF, vspan, kpad], f32); `num_word_tables`
    is 1 for PCGS/ADLDA/HDP and 2 for the MH kernel (target + proposal,
    both bf16, ops/pallas_lightlda.py:426-430). Also counts tb_buf, the
    per-block VMEM operands (w/d/z in + z out at `block` tokens), tril,
    and the broadcast nk row in collapsed mode."""
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    # the K-tiled chunk body exists only in the PCGS/ADLDA kernels
    # (num_word_tables == 1); it runs with TWO window slots instead of
    # NBUF (see _pcgs_stream_kernel). The MH kernel is untiled at all K.
    tiled = kpad >= KTILE_MIN and num_word_tables == 1
    nbuf = 2 if tiled else NBUF
    if collapsed and num_word_tables == 1:
        # live-count collapsed PCGS-family mode: the N_kw rmw window IS
        # the word table — no separate phi stream; add the live-n_k
        # scratch instead
        ph_buf = 0
    else:
        ph_buf = nbuf * kpad * vspan * 2 * num_word_tables
    tb_buf = (kpad + FLAG_ROWS) * dspan * 4
    nkw_buf = nbuf * vspan * kpad * 4
    nkc = kpad * 128 * 4 if collapsed else 0  # the live-n_k scratch
    blocks = (4 + (1 if u24 else 0)) * block * 4
    tril = 128 * 128 * 2
    # Per-chunk K-proportional compute TEMPS on the Mosaic scoped-VMEM
    # stack (th/ph selects, probs, per-tile cdfs, compare/count masks —
    # each [kpad, 128] f32-ish). Calibrated against a measured
    # compile-time OOM at kpad=4096, vspan=128: scoped allocation 26.25M
    # vs an 11.6M buffer-only estimate -> temps ~ 7 * kpad * 128 * 4
    # (the spalias K=4096 row, round 3). At kpad >= KTILE_MIN the
    # streamed kernels switch to the K-TILED chunk body: probs stage
    # through a [kpad, 128] bf16 VMEM scratch and every other temp is
    # bounded at one 128-row K-tile, so the term collapses to the
    # probs_buf + an O(tile) allowance and kpad=4096 PCGS/ADLDA configs
    # fit the budget (the former gate refusal is what rows 7d/9c
    # measured as the XLA fallback).
    if tiled:
        temps = kpad * 128 * 2 + 12 * 128 * 128 * 4
    else:
        temps = 7 * kpad * 128 * 4
    return tb_buf + ph_buf + nkw_buf + nkc + blocks + tril + temps


def stream_windows(i, cur, sems, dspan, vspan, tin_ref, tout_ref, tb_buf,
                   nkw_in_ref, nkw_out, nkw_buf, word_pairs, nbuf=NBUF):
    """Window-switch DMA machinery shared by the streamed sweep kernels,
    with TRIPLE-BUFFERED LOOKAHEAD PREFETCH of the w-window tables: the
    host passes each chunk's NEXT w-window (`ensure_ww(wwc, wwn)`), so the
    word-table and N_kw loads for the upcoming window start one chunk
    early into the next rotation slot and the switch itself only flips
    the active slot + fires the previous window's N_kw store
    asynchronously. At NYTimes scale nearly every chunk switches windows,
    so synchronous switch DMAs would dominate the sweep 5-8x. The third
    slot exists so the prefetch never has to wait for the N_kw store
    fired at the immediately preceding switch: slots rotate
    a -> a+1 -> a+2, and the slot being refilled last stored TWO switches
    ago (with 2 slots that store was ~1 chunk old and its ~1 us drain sat
    on the critical path of every switch).

    cur: SMEM (4 + NBUF,) int32 [current d-window, current w-window,
    active slot, prefetched w-window (-1 none), per-slot pending-store
    w-window (-1 none) x NBUF]. tb_buf [kpad*, dspan] holds the
    read-write n_dk table slice (stored back on d-window change and at
    the end, synchronously — those switches are rare); nkw_buf
    [NBUF, vspan, kpad] the HBM read-modify-write N_kw accumulator
    window; word_pairs a list of (hbm_ref, vmem_buf[nbuf, kpad*, vspan])
    read-only word tables keyed by the w-window. Semaphores: 0 tb store,
    1 tb load, 2+s N_kw store of slot s, 2 + nbuf + s*(P+1) + j load of
    pair j (j=P: N_kw) into slot s — the base uses the *runtime* nbuf
    (2 for the K-tiled body, NBUF=3 otherwise), matching the
    (2 + nbuf + nbuf*(P+1),) allocation at the call site.
    Returns (ensure_dw(wd), ensure_ww(wwc, wwn), active(), finalize()).
    Every started copy is waited exactly once: loads at the consuming
    switch, stores before a slot refill (same slot, or same WINDOW on
    another slot — the N_kw read-modify-write hazard) or in finalize.
    """
    P = len(word_pairs)

    @pl.when(i == 0)
    def _():
        cur[0] = jnp.int32(-1)
        cur[1] = jnp.int32(-1)
        cur[2] = jnp.int32(0)
        cur[3] = jnp.int32(-1)
        for s in range(nbuf):
            cur[4 + s] = jnp.int32(-1)

    def tb_store():
        cp = pltpu.make_async_copy(
            tb_buf, tout_ref.at[:, pl.ds(cur[0] * dspan, dspan)],
            sems.at[0])
        cp.start()
        cp.wait()

    def ensure_dw(wd):
        @pl.when(wd != cur[0])
        def _():
            @pl.when(cur[0] >= 0)
            def _():
                tb_store()
            cp = pltpu.make_async_copy(
                tin_ref.at[:, pl.ds(wd * dspan, dspan)], tb_buf,
                sems.at[1])
            cp.start()
            cp.wait()
            cur[0] = wd

    def _nkw_store_cp(slot, ww_t):
        return pltpu.make_async_copy(
            nkw_buf.at[slot], nkw_out.at[pl.ds(ww_t * vspan, vspan), :],
            sems.at[2 + slot])

    def _load_cps(slot, ww_t):
        cps = [pltpu.make_async_copy(
                   ref.at[:, pl.ds(ww_t * vspan, vspan)], buf.at[slot],
                   sems.at[2 + nbuf + slot * (P + 1) + j])
               for j, (ref, buf) in enumerate(word_pairs)]
        cps.append(pltpu.make_async_copy(
            nkw_in_ref.at[pl.ds(ww_t * vspan, vspan), :],
            nkw_buf.at[slot], sems.at[2 + nbuf + slot * (P + 1) + P]))
        return cps

    def _wait_store_hazards(slot, ww_t):
        # before refilling `slot` with window ww_t: drain any pending
        # store on that slot (buffer reuse) AND any pending store OF THE
        # SAME WINDOW on another slot — the N_kw load reads the HBM
        # region that store writes (read-modify-write ordering; reachable
        # with 3 slots at window-reuse distance 2, e.g. X,Y,X)
        for s in range(nbuf):
            @pl.when((cur[4 + s] >= 0)
                     & ((jnp.int32(s) == slot) | (cur[4 + s] == ww_t)))
            def _(s=s):
                _nkw_store_cp(jnp.int32(s), cur[4 + s]).wait()
                cur[4 + s] = jnp.int32(-1)

    def ensure_ww(wwc, wwn):
        @pl.when(wwc != cur[1])
        def _():
            a = cur[2]
            b = jax.lax.rem(a + jnp.int32(1), jnp.int32(nbuf))
            pre = cur[3]  # snapshot BEFORE the branches mutate it
            # fire the outgoing window's N_kw store (waited before a
            # conflicting refill, or in finalize)
            @pl.when(cur[1] >= 0)
            def _():
                _nkw_store_cp(a, cur[1]).start()
                cur[4 + a] = cur[1]

            @pl.when(pre == wwc)
            def _():
                # prefetched: loads are in flight in slot b — wait them
                for cp in _load_cps(b, wwc):
                    cp.wait()
                cur[2] = b
                cur[3] = jnp.int32(-1)

            @pl.when(pre != wwc)
            def _():
                # cold start (first window): synchronous load into b
                _wait_store_hazards(b, wwc)
                cps = _load_cps(b, wwc)
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                cur[2] = b
            cur[1] = wwc

        # lookahead prefetch into the next rotation slot
        @pl.when((wwn != cur[1]) & (cur[3] != wwn))
        def _():
            b = jax.lax.rem(cur[2] + jnp.int32(1), jnp.int32(nbuf))
            _wait_store_hazards(b, wwn)
            for cp in _load_cps(b, wwn):
                cp.start()
            cur[3] = wwn

    def active():
        return cur[2]

    def finalize():
        tb_store()
        a = cur[2]
        cp = _nkw_store_cp(a, cur[1])
        cp.start()
        cp.wait()
        for s in range(nbuf):
            # pending[a] is provably -1 here (drained when slot a was
            # refilled), so this loop only ever waits the other slots
            @pl.when(cur[4 + s] >= 0)
            def _(s=s):
                _nkw_store_cp(jnp.int32(s), cur[4 + s]).wait()
                cur[4 + s] = jnp.int32(-1)
        # a dangling prefetch cannot exist (the last chunk's next-window
        # equals its own window by construction), but balance defensively
        @pl.when(cur[3] >= 0)
        def _():
            b = jax.lax.rem(a + jnp.int32(1), jnp.int32(nbuf))
            for cp in _load_cps(b, cur[3]):
                cp.wait()

    return ensure_dw, ensure_ww, active, finalize


def _pcgs_stream_kernel(seed_ref, w_ref, d_ref, zo_ref, ww_ref, wwn_ref,
                        wd_ref, tin_ref, *rest,
                        vspan, dspan, kpad, num_topics, chunks, chunk,
                        nblocks, u24_operand, collapsed, ktiled,
                        positive_support=False):
    rest = list(rest)
    ph_ref = None if collapsed else rest.pop(0)
    tril_ref = rest.pop(0)
    if collapsed:
        nkc_ref = rest.pop(0)
        beta_ref = rest.pop(0)
    u24_ref = rest.pop(0) if u24_operand else None
    nkw_in_ref, z_out, tout_ref, nkw_out, tb_buf = rest[:5]
    rest = rest[5:]
    ph_buf = None if collapsed else rest.pop(0)
    nkw_buf, sems, cur = rest[:3]
    nk_buf, nk_sem = (rest[3], rest[4]) if collapsed else (None, None)
    probs_buf = rest[5 if collapsed else 3] if ktiled else None
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(_GOLD))
    # in collapsed mode the N_kw read-modify-write window IS the (live)
    # word table — there is no separate phi stream. The K-tiled body runs
    # with TWO buffer slots (active + prefetching): at tiled K the
    # per-window compute dwarfs the store drain the third slot hides, and
    # the ~3 MB it frees is what lets kpad=4096 fit VMEM.
    ensure_dw, ensure_ww, active, finalize = stream_windows(
        i, cur, sems, dspan, vspan, tin_ref, tout_ref, tb_buf,
        nkw_in_ref, nkw_out, nkw_buf,
        [] if collapsed else [(ph_ref, ph_buf)],
        nbuf=2 if ktiled else NBUF)

    if collapsed:
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(nkc_ref, nk_buf, nk_sem)
            cp.start()
            cp.wait()

    if u24_operand:
        u24s = u24_ref[0]
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits((chunks, chunk)),
                             jnp.uint32)
        u24s = pltpu.bitcast(
            jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32)

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vspan, chunk), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (dspan, chunk), 0)
    iota_k = (None if ktiled else
              jax.lax.broadcasted_iota(jnp.int32, (kpad, chunk), 0))
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

        if ktiled:
            # K-TILED chunk body (kpad >= KTILE_MIN): identical sampler
            # semantics, but every per-chunk temp is bounded at one
            # 128-row K-tile — probs stage through the [kpad, chunk] bf16
            # probs_buf scratch instead of living whole-K on the Mosaic
            # scoped-VMEM stack (whose ~7*kpad*128*4 B growth is what
            # compile-OOM'd kpad=4096, PERF.md rows 7d/9c). Pass 1
            # computes + stages each probs tile and accumulates the VPU
            # grand total and the last-nonzero clamp; pass 2 runs the
            # per-tile tril inverse-CDF with RUNNING offsets taken from
            # the tril row-127 totals (self-consistent cdf; the VPU total
            # only scales u, and any end-overshoot hits the lastnz
            # clamp); pass 3 applies the one-hot delta updates per tile.
            # Staging the global cdf in pass 1 instead (compare-only
            # pass 2, half the tril passes) measured SLOWER — 3.51→2.56M
            # at K=4096 — because the tril dot then serializes behind the
            # select chain it consumes; see PERF.md. Keep this form.
            iota_kt = jax.lax.broadcasted_iota(jnp.int32, (128, chunk), 0)
            fl = jax.lax.dot(tb_buf[kpad:kpad + FLAG_ROWS, :], oh_d,
                             precision=SELECT_PRECISION,
                             preferred_element_type=jnp.float32)
            flag = fl[0, :]
            lastnz = (jnp.full((chunk,), num_topics - 1, jnp.int32)
                      if positive_support else
                      jnp.zeros((chunk,), jnp.int32))
            total = jnp.zeros((chunk,), jnp.float32)
            for t in range(kpad // 128):
                lo = t * 128
                oh_zot = ((iota_kt + lo) == zold[None, :]).astype(
                    jnp.float32)
                corr_t = oh_zot * flag[None, :]
                nd_t = jax.lax.dot(tb_buf[lo:lo + 128, :], oh_d,
                                   precision=SELECT_PRECISION,
                                   preferred_element_type=jnp.float32
                                   ) - corr_t
                if collapsed:
                    sel = jax.lax.dot_general(
                        nkw_buf[slot, :, lo:lo + 128],
                        oh_w.astype(jnp.float32),
                        (((0,), (0,)), ((), ())),
                        precision=SELECT_PRECISION,
                        preferred_element_type=jnp.float32)
                    num = sel + beta_ref[0, 0] - corr_t
                    den = nk_buf[lo:lo + 128, 0:1] - corr_t
                    probs_t = (nd_t * (num / den)).astype(jnp.bfloat16)
                else:
                    ph_t = jax.lax.dot(
                        ph_buf[slot, lo:lo + 128, :], oh_w,
                        preferred_element_type=jnp.float32)
                    probs_t = (nd_t * ph_t).astype(jnp.bfloat16)
                probs_buf[lo:lo + 128, :] = probs_t
                if not positive_support:
                    m = (probs_t.astype(jnp.float32) > 0).astype(jnp.int32)
                    lastnz = jnp.maximum(
                        lastnz, jnp.max((iota_kt + lo) * m, axis=0))
                total = total + jnp.sum(probs_t.astype(jnp.float32),
                                        axis=0)
            u = u24s[c].astype(jnp.float32) * jnp.float32(2 ** -24) * total
            cnt = jnp.zeros((chunk,), jnp.int32)
            off = jnp.zeros((chunk,), jnp.float32)
            for t in range(kpad // 128):
                lo = t * 128
                tiles_t = jax.lax.dot(tril, probs_buf[lo:lo + 128, :],
                                      preferred_element_type=jnp.float32)
                cnt = cnt + jnp.sum(
                    (tiles_t <= (u - off)[None, :]).astype(jnp.int32),
                    axis=0)
                off = off + tiles_t[127, :]
            zout = jnp.where((flag > 0.5) & (total > 0),
                             jnp.minimum(cnt, lastnz), zold)
            z_out[0, c, :] = zout
            for t in range(kpad // 128):
                lo = t * 128
                oh_zt = ((iota_kt + lo) == zout[None, :]).astype(
                    jnp.float32)
                oh_zot = ((iota_kt + lo) == zold[None, :]).astype(
                    jnp.float32)
                delta_t = (oh_zt - oh_zot).astype(jnp.bfloat16)
                upd = jax.lax.dot_general(
                    delta_t, oh_d.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                tb_buf[lo:lo + 128, :] = tb_buf[lo:lo + 128, :] + upd
                if collapsed:
                    nkw_buf[slot, :, lo:lo + 128] = (
                        nkw_buf[slot, :, lo:lo + 128]
                        + jax.lax.dot_general(
                            oh_w, delta_t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32))
                    nk_buf[lo:lo + 128, :] = nk_buf[lo:lo + 128, :] + \
                        jnp.sum(oh_zt - oh_zot, axis=1, keepdims=True)
                else:
                    nkw_buf[slot, :, lo:lo + 128] = (
                        nkw_buf[slot, :, lo:lo + 128]
                        + jax.lax.dot_general(
                            oh_w, oh_zt.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32))
            continue

        oh_zold = (iota_k == zold[None, :]).astype(jnp.float32)

        nd_ext = jax.lax.dot(tb_buf[:, :], oh_d,
                             precision=SELECT_PRECISION,
                             preferred_element_type=jnp.float32)
        flag = nd_ext[kpad, :]
        corr = oh_zold * flag[None, :]
        nd = nd_ext[:kpad, :] - corr
        if collapsed:
            # live collapsed word term: the streamed N_kw rmw window holds
            # the current counts of this w-window (stale only within one
            # chunk); exclude the token's own count
            sel = jax.lax.dot_general(
                nkw_buf[slot], oh_w.astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                precision=SELECT_PRECISION,
                preferred_element_type=jnp.float32)
            num = sel + beta_ref[0, 0] - corr
            den = nk_buf[:, 0:1] - corr
            probs = (nd * (num / den)).astype(jnp.bfloat16)
        else:
            ph = jax.lax.dot(ph_buf[slot], oh_w,
                             preferred_element_type=jnp.float32)
            probs = (nd * ph).astype(jnp.bfloat16)
        znew, total = cdf_draw(
            tril, probs, u24s[c],
            lastnz_const=num_topics - 1 if positive_support else None)
        zout = jnp.where((flag > 0.5) & (total > 0), znew, zold)
        z_out[0, c, :] = zout

        oh_z = (iota_k == zout[None, :]).astype(jnp.bfloat16)
        delta = (oh_z.astype(jnp.float32) - oh_zold).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(
            delta, oh_d.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        tb_buf[:kpad, :] = tb_buf[:kpad, :] + upd
        if collapsed:
            nkw_buf[slot] = nkw_buf[slot] + jax.lax.dot_general(
                oh_w, delta, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            nk_buf[:, :] = nk_buf[:, :] + jnp.sum(
                delta.astype(jnp.float32), axis=1, keepdims=True)
        else:
            nkw_buf[slot] = nkw_buf[slot] + jax.lax.dot_general(
                oh_w, oh_z, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(i == nblocks - 1)
    def _():
        finalize()


@functools.partial(
    jax.jit, static_argnames=("nwin_w", "nwin_d", "vspan", "dspan",
                              "num_topics", "interpret", "force_ktile",
                              "positive_support"))
def fused_pcgs_sweep_streamed(w3, d3, z_old, ndk_table, phi_vk, seed,
                              ww_chunks, wd_chunks, u24=None, nk_plus=None,
                              beta=None, *, nwin_w, nwin_d, vspan, dspan,
                              num_topics, interpret=False,
                              force_ktile=False, positive_support=False):
    """One PCGS Gibbs sweep over d-window-major StreamBlocks with the
    n_dk table, phi and N_kw all HBM-resident: VMEM holds one streamed
    window of each (the table slice written back on d-window changes),
    so there is NO VMEM gate on K x D. Same conditional semantics as
    fused_pcgs_sweep — incl. the collapsed ADLDA mode via nk_plus/beta,
    where `phi_vk` carries the sweep-entry N_kw counts and the N_kw
    read-modify-write window doubles as the LIVE word table (no separate
    phi stream, so the collapsed scratch is SMALLER than the PCGS one).

    ndk_table: f32 [kpad + FLAG_ROWS, Dpad] (aliased; donate).
    Returns (z [NB, chunks, chunk], nkw [nwin_w * vspan, K] int32,
             ndk_table_out).
    """
    nb, chunks, chunk = w3.shape
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    # force_ktile: test-only override running the K-tiled chunk body at
    # small K, so the joint-distribution (Geweke) harnesses can exercise
    # the ACTUAL tiled code — which otherwise only engages at
    # kpad >= KTILE_MIN, shapes no statistical harness can afford
    ktiled = kpad >= KTILE_MIN or force_ktile
    nbuf = 2 if ktiled else NBUF
    vpad = nwin_w * vspan
    v, k = phi_vk.shape
    assert k == num_topics, \
        f"word table must be [V, K]={v, num_topics}, got {phi_vk.shape}"
    collapsed = nk_plus is not None
    assert ndk_table.shape[0] == kpad + FLAG_ROWS
    nkc_specs, nkc_ops = [], []
    ph_specs, ph_ops = [], []
    if collapsed:
        assert beta is not None, "collapsed mode needs beta"
        nkw0 = jnp.pad(phi_vk.astype(jnp.float32),
                       ((0, vpad - v), (0, kpad - k)))
        nkc = jnp.pad(nk_plus.astype(jnp.float32), (0, kpad - k),
                      constant_values=1.0)
        nkc_ops = [jnp.broadcast_to(nkc[:, None], (kpad, 128)),
                   jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1))]
        nkc_specs = [pl.BlockSpec(memory_space=pl.ANY),  # nk seed (HBM)
                     pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                  memory_space=pltpu.SMEM)]
    else:
        nkw0 = jnp.zeros((vpad, kpad), jnp.float32)
        ph = jnp.pad(phi_vk, ((0, vpad - v), (0, kpad - k))).T
        ph_ops = [ph.astype(jnp.bfloat16)]
        ph_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # phi windows (HBM)
    u24_specs, u24_ops = [], []
    if u24 is not None:
        assert u24.shape == (nb, chunks, chunk)
        u24_specs = [pl.BlockSpec((1, chunks, chunk),
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
            *ph_specs,
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            *nkc_specs,
            *u24_specs,
            pl.BlockSpec(memory_space=pl.ANY),   # N_kw accumulator (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # table out (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # N_kw out (aliased)
        ],
        scratch_shapes=(
            [pltpu.VMEM((kpad + FLAG_ROWS, dspan), jnp.float32)]  # tb_buf
            + ([] if collapsed
               else [pltpu.VMEM((nbuf, kpad, vspan), jnp.bfloat16)])  # ph
            + [pltpu.VMEM((nbuf, vspan, kpad), jnp.float32),    # nkw_buf
               # per-slot loads: word pairs (0 in collapsed mode) + N_kw
               pltpu.SemaphoreType.DMA(
                   (2 + nbuf + nbuf * (1 if collapsed else 2),)),
               pltpu.SMEM((4 + nbuf,), jnp.int32)]              # cur
            + ([pltpu.VMEM((kpad, 128), jnp.float32),           # live n_k
                pltpu.SemaphoreType.DMA]
               if collapsed else [])
            + ([pltpu.VMEM((kpad, chunk), jnp.bfloat16)]        # probs_buf
               if ktiled else [])),
    )
    # alias indices count ALL operands incl. the scalar-prefetch seed:
    # seed=0, w3=1, d3=2, z_old=3, ww3=4, wwn3=5, wd3=6, table=7, [ph],
    # tril, [nkc, beta], [u24], nkw last
    n_extra = len(ph_ops) + len(nkc_ops) + len(u24_ops)
    table_idx, nkw_idx = 7, 9 + n_extra
    z, table, nkw = pl.pallas_call(
        functools.partial(
            _pcgs_stream_kernel, vspan=vspan, dspan=dspan, kpad=kpad,
            num_topics=num_topics, chunks=chunks, chunk=chunk, nblocks=nb,
            u24_operand=u24 is not None, collapsed=collapsed,
            ktiled=ktiled, positive_support=positive_support),
        out_shape=[
            jax.ShapeDtypeStruct((nb, chunks, chunk), jnp.int32),
            jax.ShapeDtypeStruct((kpad + FLAG_ROWS, dpad), jnp.float32),
            jax.ShapeDtypeStruct((vpad, kpad), jnp.float32),
        ],
        grid_spec=grid_spec,
        input_output_aliases={table_idx: 1, nkw_idx: 2},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, w3, d3, z_old, smem3(ww_chunks), smem3(ww_next),
      smem3(wd_chunks), ndk_table, *ph_ops, tril_op, *nkc_ops, *u24_ops,
      nkw0)
    return z, nkw[:, :num_topics].astype(jnp.int32), table
