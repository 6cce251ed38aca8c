"""Windowed count-histogram kernel (Pallas TPU, with an XLA fallback).

The TPU replacement for the reference's count bookkeeping (the AtomicInteger
delta matrix drained by per-topic updater threads,
UncollapsedParallelLDA.java:102,1107-1221): rebuild `N[v, k] = #{tokens:
w=v, z=k}` from scratch each sweep.

Why a kernel: on TPU neither XLA formulation is good — scatter-add is
per-update bound (~13-19 ms for 1.35M tokens at 20NG scale) and an
indicator-matmul lowered by XLA materialises the [vspan, B] indicator and
the [B, K] one-hot through HBM (~22 ms measured). This kernel builds both
operands *in VMEM* directly from the int32 token/label rows and feeds the
MXU, accumulating into a window of the output mapped per block via
scalar-prefetched window ids: measured 2.8 ms for the same workload (8x).

Contract (see corpus/ragged.py `aligned_blocks`): tokens are pre-sorted so
each block of `block` tokens covers ONE aligned `vspan`-wide window of ids;
blocks arrive window-ordered; the first block of each window carries
`first=1` (the kernel zeroes the output window before accumulating);
padding slots carry the sentinel id `vspan` (they match no indicator row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _count_kernel(win_ref, first_ref, w_ref, z_ref, out_ref, *,
                  vspan, kpad, chunks, chunk):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (vspan, chunk), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (kpad, chunk), 0)
    acc = jnp.zeros((vspan, kpad), jnp.float32)
    for c in range(chunks):
        wrow = w_ref[0, c, :]
        zrow = z_ref[0, c, :]
        ind_t = (iota_v == wrow[None, :]).astype(jnp.bfloat16)
        oh_t = (iota_k == zrow[None, :]).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            ind_t, oh_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("nwin", "vspan", "num_labels"))
def _pallas_counts(w_local, labels, win, first, *, nwin, vspan, num_labels):
    nb, block = w_local.shape
    chunk = block if block <= 1024 else 1024
    assert block % chunk == 0 and chunk % 128 == 0, (block, chunk)
    chunks = block // chunk
    kpad = max(128, ((num_labels + 127) // 128) * 128)
    w3 = w_local.reshape(nb, chunks, chunk)
    z3 = labels.reshape(nb, chunks, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, chunks, chunk), lambda i, win, first: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunks, chunk), lambda i, win, first: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vspan, kpad),
                               lambda i, win, first: (win[i], 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_count_kernel, vspan=vspan, kpad=kpad,
                          chunks=chunks, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((nwin * vspan, kpad), jnp.float32),
        grid_spec=grid_spec,
    )(win, first, w3, z3)
    return out[:, :num_labels].astype(jnp.int32)


def _xla_counts(w_local, labels, win, first, *, nwin, vspan, num_labels):
    """Scatter-add fallback (CPU tests / non-TPU backends). Sentinel slots
    (w_local == vspan) go to a trash row past the table."""
    rows = jnp.where(w_local < vspan, win[:, None] * vspan + w_local,
                     nwin * vspan)
    out = jnp.zeros((nwin * vspan + 1, num_labels), jnp.int32).at[
        rows.reshape(-1), labels.reshape(-1)].add(1)
    return out[: nwin * vspan]


def blocked_label_counts(w_local, labels, win, first, *, nwin, vspan,
                         num_labels):
    """Histogram over (global id, label) from aligned sorted blocks.

    w_local [NB, B] int32: window-local ids in [0, vspan), sentinel `vspan`
        on padding slots (never counted).
    labels  [NB, B] int32 in [0, num_labels).
    win     [NB] int32: nondecreasing window id of each block.
    first   [NB] int32: 1 on the first block of each window.

    Returns int32 [nwin * vspan, num_labels]; slice to the real id count.
    """
    kpad = max(128, ((num_labels + 127) // 128) * 128)
    # kpad gate (round 4): the kernel's per-block one-hot temps grow
    # ~kpad*128*4 x a few on the Mosaic scoped-VMEM stack; at kpad=8192
    # the remote compile helper crashes (the K=8192 matrix probe). Past
    # 4096 — the largest measured-fused regime — fall back to the XLA
    # scatter-add, which is label-count-agnostic.
    if jax.default_backend() == "tpu" and kpad <= 4096:
        return _pallas_counts(w_local, labels, win, first, nwin=nwin,
                              vspan=vspan, num_labels=num_labels)
    return _xla_counts(w_local, labels, win, first, nwin=nwin, vspan=vspan,
                       num_labels=num_labels)
