"""Fused GGS z-draw kernel (Pallas TPU): gather-free token sampling.

The TPU replacement for the reference's per-token inverse-CDF loop
(LDAGroupedGibbsSampler.java:96-113 — score theta_d[k]*phi[k][w], draw z by
cumulative scan) PLUS the N_kw count bookkeeping of the same sweep
(UncollapsedParallelLDA.java:1107-1221).

Why a kernel: the hot cost of the XLA formulation is two per-token row
gathers (theta row by doc id, phi row by type id) — measured 7.2 ms of a
9.4 ms z-draw at 20NG scale (benchmarks/zdraw_parts.py), because TPU row
gathers of ~400 B rows pay tile-granular HBM traffic. Tokens already live
in (w-window, d-window) cells (corpus/ragged.py Corpus.cell_blocks), so
inside a kernel both gathers become one-hot matmuls on the MXU against
window-local tables built/sliced in VMEM:

  th[k, t]  = theta_win[kpad, dspan] @ onehot_d[dspan, chunk]
  ph[k, t]  = phi_win  [kpad, vspan] @ onehot_w[vspan, chunk]
  cdf[k, t] = tril[kpad, kpad] @ (th*ph)        (cumsum as MXU matmul)
  z[t]      = #{k : cdf[k, t] <= u_t * total_t} (one uniform per token,
              exactly the reference's inverse-CDF semantics)
  nkw_win  += onehot_w @ onehot_z^T             (same sweep, same operands)

theta rides fully VMEM-resident as a [kpad, Dpad] table (bf16; ~3 MB at
20NG scale) and each chunk dynamic-slices its 'dspan'-wide doc window from
it; phi windows are block-indexed via scalar-prefetched w-window ids. The
N_kw output accumulates into the same aligned windows as
ops/pallas_counts.py (w-window-major block order, zeroed on `first_w`).

Random-scan doc selection needs no extra operand: the caller zeroes theta
rows of unselected docs, so those tokens (and padding slots, whose
sentinel ids match no one-hot row) see total == 0 and keep their old z —
kept tokens still contribute their old topic to N_kw, as the reference's
delta scheme does implicitly.

Precision: `precise=False` rounds theta/phi to bf16 before the one-hot
select (exact selection of bf16-rounded values; conditional probabilities
perturbed by <= 2^-8 relative). `precise=True` gathers a bf16 hi+lo split
of each table (two MXU passes, f32 reconstruction exact to ~2^-16) and
runs the cumsum matmul in f32. Both modes are chi-square-validated against
the exact conditionals in tests/test_pallas_zdraw.py.

Per-block PRNG: the on-chip generator seeded with a per-block scrambled
seed (golden-ratio multiply of the grid index); one 24-bit uniform per
token slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GOLD = -1640531527  # 2^32 / golden ratio, as int32


def _zdraw_kernel(seed_ref, win_w_ref, first_w_ref,
                  w_ref, d_ref, zo_ref, win_d_ref, th_ref, ph_ref,
                  tril_ref, *rest,
                  vspan, dspan, kpad, num_topics, chunks, chunk, precise,
                  stream_theta, u24_operand):
    rest = list(rest)
    u24_ref = rest.pop(0) if u24_operand else None
    z_out, nkw_out, *scratch = rest
    # win_d_ref is a regular SMEM-blocked input ([1, chunks] per block), NOT
    # a scalar-prefetch operand: one int32 per chunk is ~1M entries at
    # NYTimes scale (100M tokens) and would overflow the 1 MB SMEM if the
    # whole array were prefetched.
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(_GOLD))

    if stream_theta:
        # theta lives in HBM ([krows, dpad]); double-buffer the per-chunk
        # [krows, dspan] d-window into VMEM, overlapping DMA with compute.
        th_buf, th_sem = scratch

        def _th_dma(slot, c):
            wd = win_d_ref[0, c // 128, c % 128]
            return pltpu.make_async_copy(
                th_ref.at[:, pl.ds(wd * dspan, dspan)],
                th_buf.at[slot], th_sem.at[slot])

        _th_dma(0, 0).start()

    @pl.when(first_w_ref[i] == 1)
    def _():
        nkw_out[:] = jnp.zeros_like(nkw_out)

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vspan, chunk), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (dspan, chunk), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, chunk), 0)
    cdf_dtype = jnp.float32 if precise else jnp.bfloat16
    # tril arrives as a fixed [128, 128] operand (building it in-kernel
    # from iotas costs VMEM temps that spill). The cumulative sum over the
    # kpad topic rows is TILED: within-tile prefix sums via the tril
    # matmul — O(K·128·chunk) MXU work instead of O(K²·chunk) for a full
    # [kpad, kpad] tril (at K=1000 the full-tril cdf matmul was ~73% of
    # the kernel's FLOPs) — with the exclusive running offset of tile
    # totals folded into the comparison threshold (row r of tile t
    # satisfies off_t + cdf_t[r] <= u iff cdf_t[r] <= u - off_t).
    # (A hierarchical variant — tile totals locate the target tile, one
    # tril matmul resolves it — measured SLOWER on-chip both with a
    # skinny tile-sum matmul (25.7M tok/s at K=1000 vs 28.3M: the MXU is
    # pass-bound, so an [ntile, kpad] matmul costs the same passes as the
    # trils it replaces) and with VPU tile sums (27.4M: the kernel is
    # VPU-bound at large K, and sums+masked-select add more VPU work than
    # the compare passes they remove). The per-tile form below is the
    # measured optimum.)
    tril = tril_ref[:, :]
    ntile = kpad // 128

    if u24_operand:
        # injected 24-bit uniforms (interpreter path: InterpretParams
        # lowers the in-kernel PRNG to zeros)
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

        oh_d = (iota_d == drow[None, :]).astype(jnp.bfloat16)
        oh_w = (iota_v == wrow[None, :]).astype(jnp.bfloat16)
        if stream_theta:
            if c + 1 < chunks:
                _th_dma((c + 1) % 2, c + 1).start()
            _th_dma(c % 2, c).wait()
            th_win = th_buf[c % 2]                        # [kpad*, dspan]
        else:
            th_win = th_ref[:, pl.ds(win_d * dspan, dspan)]
        ph_win = ph_ref[:, :]                             # [kpad*, vspan]
        # (Mosaic requires 32-bit matmul accumulators, so the one-hot
        # selects emit f32 even though the selected values are bf16-exact)
        th = jax.lax.dot(th_win, oh_d,
                         preferred_element_type=jnp.float32)
        ph = jax.lax.dot(ph_win, oh_w,
                         preferred_element_type=jnp.float32)
        if precise:  # hi+lo split tables: rows [0:kpad] hi, [kpad:2kpad] lo
            th = th[:kpad] + th[kpad:]
            ph = ph[:kpad] + ph[kpad:]
        probs = (th * ph).astype(cdf_dtype)               # [kpad, chunk]
        tiles = [jax.lax.dot(tril, probs[t * 128:(t + 1) * 128, :],
                             preferred_element_type=jnp.float32)
                 for t in range(ntile)]
        offs = [jnp.zeros((chunk,), jnp.float32)]
        total = tiles[0][127, :]
        for t in range(1, ntile):
            offs.append(total)
            total = total + tiles[t][127, :]
        u = u24s[c].astype(jnp.float32) * jnp.float32(2 ** -24) * total
        cnt = jnp.zeros((chunk,), jnp.int32)
        for t in range(ntile):
            cnt = cnt + jnp.sum(
                (tiles[t] <= (u - offs[t])[None, :]).astype(jnp.int32),
                axis=0)
        znew = jnp.minimum(cnt, num_topics - 1)
        zout = jnp.where(total > 0, znew, zold)
        z_out[0, c, :] = zout

        oh_z = (iota_k == zout[None, :]).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            oh_w, oh_z, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    nkw_out[:] += acc


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)


@functools.partial(
    jax.jit, static_argnames=("nwin_w", "nwin_d", "vspan", "dspan",
                              "num_topics", "precise", "stream_theta",
                              "interpret"))
def fused_zdraw_nkw(w3, d3, z_old, theta_dk, phi_vk, seed, win_w, first_w,
                    win_d_chunks, u24=None, *, nwin_w, nwin_d, vspan, dspan,
                    num_topics, precise=False, stream_theta=False,
                    interpret=False):
    """Draw z for every token and accumulate N_kw in one fused pass.

    w3 / d3 / z_old: int32 [NB, chunks, chunk] cell-block token rows
        (window-local ids; sentinel vspan / dspan on padding slots).
    theta_dk: f32 [D, K] — rows of unselected docs must be pre-zeroed.
    phi_vk:   f32 [V, K].
    seed: int32 [1]. win_w / first_w: int32 [NB]. win_d_chunks: int32
        [NB * chunks].
    stream_theta: keep the theta table in HBM and DMA each chunk's
        [krows, dspan] d-window into a double-buffered VMEM scratch —
        removes the VMEM-residency gate on K*D (large K / NYTimes-scale D).
    u24: optional int32 [NB, chunks, chunk] of 24-bit uniforms in
        [0, 2^24); replaces the in-kernel PRNG (which InterpretParams
        cannot lower) — the off-TPU test path.

    Returns (z [NB, chunks, chunk] int32, nkw [nwin_w * vspan, K] int32).
    """
    nb, chunks, chunk = w3.shape
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    dpad = nwin_d * dspan
    vpad = nwin_w * vspan
    d, k = theta_dk.shape
    v = phi_vk.shape[0]
    th = jnp.pad(theta_dk, ((0, dpad - d), (0, kpad - k))).T
    ph = jnp.pad(phi_vk, ((0, vpad - v), (0, kpad - k))).T
    if precise:
        th = _split_hi_lo(th)
        ph = _split_hi_lo(ph)
    else:
        th = th.astype(jnp.bfloat16)
        ph = ph.astype(jnp.bfloat16)
    krows = th.shape[0]

    # per-chunk d-window ids, SMEM-blocked per block (padded to 128 lanes so
    # the block shape equals the array's trailing dims — the TPU tiling rule)
    wd_rows = max(1, -(-chunks // 128))
    wd3 = jnp.pad(win_d_chunks.reshape(nb, chunks),
                  ((0, 0), (0, wd_rows * 128 - chunks))
                  ).reshape(nb, wd_rows, 128)
    cdf_dtype = jnp.float32 if precise else jnp.bfloat16
    tril_op = jnp.tril(jnp.ones((128, 128), cdf_dtype))
    th_spec = (pl.BlockSpec(memory_space=pl.ANY) if stream_theta
               else pl.BlockSpec((krows, dpad), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM))
    u24_specs, u24_ops = [], []
    if u24 is not None:
        assert u24.shape == (nb, chunks, chunk)
        u24_specs = [pl.BlockSpec((1, chunks, chunk),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        u24_ops = [u24]
    scratch_shapes = ([pltpu.VMEM((2, krows, dspan), th.dtype),
                       pltpu.SemaphoreType.DMA((2,))] if stream_theta
                      else [])
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
            th_spec,
            pl.BlockSpec((krows, vspan),
                         lambda i, seed, ww, fw: (0, ww[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            *u24_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, chunks, chunk),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vspan, kpad),
                         lambda i, seed, ww, fw: (ww[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
    )
    z, nkw = pl.pallas_call(
        functools.partial(
            _zdraw_kernel, vspan=vspan, dspan=dspan, kpad=kpad,
            num_topics=num_topics, chunks=chunks, chunk=chunk,
            precise=precise, stream_theta=stream_theta,
            u24_operand=u24 is not None),
        out_shape=[
            jax.ShapeDtypeStruct((nb, chunks, chunk), jnp.int32),
            jax.ShapeDtypeStruct((nwin_w * vspan, kpad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, win_w, first_w, w3, d3, z_old, wd3, th, ph, tril_op, *u24_ops)
    return z, nkw[:, :num_topics].astype(jnp.int32)


def fused_zdraw_vmem_bytes(num_docs, num_topics, dspan, precise=False):
    """Estimated VMEM residency of the theta table (the eligibility gate)."""
    kpad = max(128, ((num_topics + 127) // 128) * 128)
    nwin_d = max(1, (num_docs + dspan - 1) // dspan)
    per = 2 * (2 if precise else 1)
    return kpad * nwin_d * dspan * per
