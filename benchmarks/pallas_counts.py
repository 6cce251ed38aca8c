"""Feasibility + perf test: Pallas TPU kernel for blocked count histograms.

Computes nkw[V, K] from w-sorted token blocks: per block, an indicator
matmul ind_t[vspan, B] @ onehot[B, K] built entirely in VMEM (the XLA
formulation materialises both operands through HBM — measured 22 ms/iter).
Output rows are mapped per block via scalar-prefetched window ids; blocks
are cut so each covers one aligned vspan window, and consecutive blocks in
the same window accumulate into the revisited VMEM block.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import synth_corpus  # noqa: E402

B = 8192          # tokens per block
VSPAN = 512       # aligned vocab window per block
KPAD = 128        # padded K
CHUNK = 1024      # tokens per inner matmul chunk
REPS = 10


def aligned_blocks(tokens: np.ndarray, num_types: int):
    """Cut w-sorted tokens into blocks of <=B tokens that never cross an
    aligned VSPAN window; every window gets >=1 block (empty ok)."""
    order = np.argsort(tokens, kind="stable")
    w_s = tokens[order]
    n = len(w_s)
    nwin = (num_types + VSPAN - 1) // VSPAN
    starts = np.searchsorted(w_s, np.arange(nwin + 1) * VSPAN)
    blocks = []          # (win, tok_start, tok_end)
    for win in range(nwin):
        s, e = int(starts[win]), int(starts[win + 1])
        if e == s:
            blocks.append((win, s, s))
        while s < e:
            blocks.append((win, s, min(s + B, e)))
            s += B
    nb = len(blocks)
    w_local = np.full((nb, B), VSPAN, np.int32)   # VSPAN = masked sentinel
    z_arr = np.zeros((nb, B), np.int32)
    win_ids = np.zeros(nb, np.int32)
    first = np.zeros(nb, np.int32)
    seen = set()
    rng = np.random.default_rng(0)
    z_all = rng.integers(0, 100, n).astype(np.int32)
    for i, (win, s, e) in enumerate(blocks):
        win_ids[i] = win
        if win not in seen:
            first[i] = 1
            seen.add(win)
        if e > s:
            w_local[i, : e - s] = w_s[s:e] - win * VSPAN
            z_arr[i, : e - s] = z_all[s:e]
    return w_local, z_arr, win_ids, first, z_all, order, nwin


def count_kernel(win_ref, first_ref, w_ref, z_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (VSPAN, CHUNK), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (KPAD, CHUNK), 0)
    acc = jnp.zeros((VSPAN, KPAD), jnp.float32)
    for c in range(B // CHUNK):
        wrow = w_ref[0, c, :]
        zrow = z_ref[0, c, :]
        ind_t = (iota_v == wrow[None, :]).astype(jnp.bfloat16)
        oh_t = (iota_k == zrow[None, :]).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            ind_t, oh_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] += acc


def pallas_nkw(w_local, z, win_ids, first, nwin):
    nb = w_local.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B // CHUNK, CHUNK),
                         lambda i, win, first: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // CHUNK, CHUNK),
                         lambda i, win, first: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((VSPAN, KPAD),
                               lambda i, win, first: (win[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        count_kernel,
        out_shape=jax.ShapeDtypeStruct((nwin * VSPAN, KPAD), jnp.float32),
        grid_spec=grid_spec,
    )(win_ids, first, w_local, z)


def main():
    corpus = synth_corpus()
    V = corpus.num_types
    w_local, z_arr, win_ids, first, z_all, order, nwin = aligned_blocks(
        corpus.tokens, V)
    nb = w_local.shape[0]
    print(f"blocks={nb} windows={nwin}")
    wj = jnp.asarray(w_local.reshape(-1, B // CHUNK, CHUNK))
    zj = jnp.asarray(z_arr.reshape(-1, B // CHUNK, CHUNK))
    winj = jnp.asarray(win_ids)
    firstj = jnp.asarray(first)

    fn = jax.jit(functools.partial(pallas_nkw, nwin=nwin))
    out = fn(wj, zj, winj, firstj)
    out_np = np.asarray(out)

    # correctness: compare with numpy histogram
    ref = np.zeros((V, 100), np.int64)
    np.add.at(ref, (corpus.tokens[order], z_all), 1)
    got = out_np[:V, :100].astype(np.int64)
    assert got.shape == ref.shape
    if not np.array_equal(got, ref):
        bad = np.argwhere(got != ref)
        print(f"MISMATCH at {len(bad)} cells, first: {bad[:5]}")
        sys.exit(1)
    print("correctness OK")

    def loop(wj, zj, winj, firstj):
        def body(c, _):
            return c + pallas_nkw(wj, zj, winj, firstj, nwin=nwin)[0, 0], None
        out, _ = jax.lax.scan(body, 0.0, None, length=REPS)
        return out
    jl = jax.jit(loop)
    _ = np.asarray(jl(wj, zj, winj, firstj))
    t0 = time.perf_counter()
    _ = np.asarray(jl(wj, zj, winj, firstj))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"pallas nkw count kernel: {dt:.3f} ms/iter")


if __name__ == "__main__":
    main()
