"""Invariants of the two-layout cell block structure and the windowed count
op (ops/pallas_counts.py — XLA fallback path on the CPU test backend).

The structure replaces the reference's count bookkeeping (the AtomicInteger
delta matrix, UncollapsedParallelLDA.java:102,1107-1221) with full rebuilds
through window-mapped histograms; these tests pin the layout contract the
Pallas kernel relies on (SURVEY.md §4 style 3: algorithmic invariants).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.ops.pallas_counts import blocked_label_counts


def _corpus(num_docs, num_types, seed=0, max_len=80):
    rng = np.random.default_rng(seed)
    docs = [list(rng.integers(0, num_types, rng.integers(1, max_len)))
            for _ in range(num_docs)]
    return Corpus.from_token_lists(docs, [f"w{i}" for i in range(num_types)])


@pytest.mark.parametrize("num_docs,num_types,block",
                         [(120, 700, 256), (1300, 3000, 1024), (40, 90, 128)])
def test_cell_blocks_invariants(num_docs, num_types, block):
    c = _corpus(num_docs, num_types)
    cb = c.cell_blocks(block=block, vspan=512, dspan=512, chunk=128)
    # every token appears exactly once
    fi = cb.flat_index[cb.mask]
    assert sorted(fi) == list(range(c.num_tokens))
    # layout A recovers global ids; pads carry the sentinel
    wg = cb.w_local + cb.win_w[:, None] * 512
    assert np.array_equal(wg[cb.mask], c.tokens[cb.flat_index[cb.mask]])
    assert np.all(cb.w_local[~cb.mask] == 512)
    assert np.array_equal(cb.doc_ids[cb.mask],
                          c.token_doc_ids()[cb.flat_index[cb.mask]])
    # window ids nondecreasing, exactly one first flag per visited window
    assert np.all(np.diff(cb.win_w) >= 0) and np.all(np.diff(cb.win_d) >= 0)
    assert cb.first_w.sum() == cb.nwin_w and cb.first_d.sum() == cb.nwin_d


@pytest.mark.parametrize("num_docs,num_types,block",
                         [(120, 700, 256), (1300, 3000, 1024)])
def test_blocked_label_counts_both_layouts(num_docs, num_types, block):
    """The same z array counted through layout A (nkw) and through the
    chunk-regrouped layout B (ndk) must match numpy histograms exactly."""
    K = 9
    c = _corpus(num_docs, num_types, seed=3)
    cb = c.cell_blocks(block=block, vspan=512, dspan=512, chunk=128)
    rng = np.random.default_rng(5)
    z = rng.integers(0, K, cb.mask.shape).astype(np.int32)

    nkw = np.asarray(blocked_label_counts(
        jnp.asarray(cb.w_local), jnp.asarray(z), jnp.asarray(cb.win_w),
        jnp.asarray(cb.first_w), nwin=cb.nwin_w, vspan=512, num_labels=K
    ))[:num_types]
    ref_nkw = np.zeros((num_types, K), np.int64)
    np.add.at(ref_nkw, (c.tokens[cb.flat_index[cb.mask]], z[cb.mask]), 1)
    assert np.array_equal(nkw.astype(np.int64), ref_nkw)

    z_b = z.reshape(-1, cb.chunk)[cb.src_chunks].reshape(cb.d_local.shape)
    ndk = np.asarray(blocked_label_counts(
        jnp.asarray(cb.d_local), jnp.asarray(z_b), jnp.asarray(cb.win_d),
        jnp.asarray(cb.first_d), nwin=cb.nwin_d, vspan=512, num_labels=K
    ))[:num_docs]
    ref_ndk = np.zeros((num_docs, K), np.int64)
    np.add.at(ref_ndk,
              (c.token_doc_ids()[cb.flat_index[cb.mask]], z[cb.mask]), 1)
    assert np.array_equal(ndk.astype(np.int64), ref_ndk)


def test_inverse_cdf_draw_distribution():
    """Chi-square goodness of fit of the fused inverse-CDF categorical draw
    (the z-draw core in models/ggs.py), mirroring the reference's
    WalkerAliasTableTest style (§4 style 1)."""
    import jax
    from scipy import stats as sps
    K = 6
    p_row = np.array([0.05, 0.3, 0.02, 0.4, 0.13, 0.1], np.float32)
    n = 100000
    probs = jnp.asarray(np.tile(p_row, (n, 1)))
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    cdf = jax.lax.dot(probs, tri, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    u = jax.random.uniform(jax.random.key(7, impl="rbg"), (n, 1),
                           jnp.float32) * cdf[:, -1:]
    z = np.asarray(jnp.minimum(
        jnp.sum((cdf <= u).astype(jnp.int32), -1), K - 1))
    obs = np.bincount(z, minlength=K).astype(np.float64)
    exp = (p_row / p_row.sum()).astype(np.float64) * obs.sum()
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert sps.chi2.sf(chi2, K - 1) > 1e-4


def test_vectorised_builder_matches_reference_oracle():
    """build_cell_blocks (vectorised) is bit-identical to the loop-form
    specification across corpus shapes, spans, and edge cases (empty
    windows, single-window, tiny corpora)."""
    import numpy as np
    from ldagroupedgibbssampler_tpu.corpus.ragged import (
        build_cell_blocks, build_cell_blocks_reference)

    rng = np.random.default_rng(0)
    cases = [
        # (num_types, num_docs, n_tokens, block, vspan, dspan, chunk)
        (700, 90, 5000, 1024, 128, 128, 128),
        (700, 90, 5000, 512, 256, 64, 64),
        (50, 10, 200, 256, 16, 8, 64),
        (300, 500, 8000, 1024, 128, 512, 128),
        (40, 7, 31, 256, 128, 128, 128),       # single w-window
        (1000, 50, 900, 512, 64, 16, 128),     # many empty windows
    ]
    for (v, d, n, block, vspan, dspan, chunk) in cases:
        toks = rng.integers(0, v, n).astype(np.int32)
        # skew: make low ids dominate so some windows are empty
        toks = np.minimum(toks, rng.integers(0, v, n)).astype(np.int32)
        docs = np.sort(rng.integers(0, d, n)).astype(np.int32)
        a = build_cell_blocks(toks, docs, v, d, block=block, vspan=vspan,
                              dspan=dspan, chunk=chunk)
        b = build_cell_blocks_reference(toks, docs, v, d, block=block,
                                        vspan=vspan, dspan=dspan,
                                        chunk=chunk)
        for name in ("w_local", "doc_ids", "mask", "win_w", "first_w",
                     "flat_index", "d_local_a", "win_d_chunks",
                     "src_chunks", "d_local", "win_d", "first_d"):
            np.testing.assert_array_equal(
                getattr(a, name), getattr(b, name),
                err_msg=f"{name} differs for case {(v, d, n, block, vspan, dspan, chunk)}")
        assert (a.nwin_w, a.nwin_d) == (b.nwin_w, b.nwin_d)


def test_native_builder_matches_reference_oracle():
    """The C++ builder (native/cell_blocks.cpp) is bit-identical to both
    Python builders."""
    import numpy as np
    import pytest
    from ldagroupedgibbssampler_tpu.corpus.native_blocks import (
        build_cell_blocks_native, native_available)
    from ldagroupedgibbssampler_tpu.corpus.ragged import (
        build_cell_blocks_reference)

    if not native_available():
        pytest.skip("no g++ available")
    rng = np.random.default_rng(1)
    for (v, d, n, block, vspan, dspan, chunk) in [
            (700, 90, 5000, 1024, 128, 128, 128),
            (50, 10, 200, 256, 16, 8, 64),
            (1000, 50, 900, 512, 64, 16, 128),
            (300, 500, 8000, 1024, 128, 512, 128)]:
        toks = np.minimum(rng.integers(0, v, n),
                          rng.integers(0, v, n)).astype(np.int32)
        docs = np.sort(rng.integers(0, d, n)).astype(np.int32)
        a = build_cell_blocks_native(toks, docs, v, d, block=block,
                                     vspan=vspan, dspan=dspan, chunk=chunk)
        assert a is not None
        b = build_cell_blocks_reference(toks, docs, v, d, block=block,
                                        vspan=vspan, dspan=dspan,
                                        chunk=chunk)
        for name in ("w_local", "doc_ids", "mask", "win_w", "first_w",
                     "flat_index", "d_local_a", "win_d_chunks",
                     "src_chunks", "d_local", "win_d", "first_d"):
            np.testing.assert_array_equal(
                getattr(a, name), getattr(b, name), err_msg=name)


def test_stream_builder_native_matches_numpy():
    """The C++ StreamBlocks builder (native/stream_blocks.cpp) is
    bit-identical to the NumPy builder across corpus shapes."""
    import numpy as np
    import pytest
    from ldagroupedgibbssampler_tpu.corpus.native_blocks import (
        build_stream_blocks_native, stream_native_available)
    from ldagroupedgibbssampler_tpu.corpus.ragged import (
        build_stream_blocks_seq)

    if not stream_native_available():
        pytest.skip("no g++ available")
    rng = np.random.default_rng(2)
    for (v, d, n, block, vspan, dspan, chunk) in [
            (700, 90, 5000, 1024, 128, 128, 128),
            (50, 10, 200, 256, 16, 8, 64),
            (1000, 50, 900, 512, 64, 16, 128),
            (300, 500, 8000, 1024, 128, 128, 128),
            (40, 7, 31, 256, 128, 128, 128)]:
        toks = np.minimum(rng.integers(0, v, n),
                          rng.integers(0, v, n)).astype(np.int32)
        docs = np.sort(rng.integers(0, d, n)).astype(np.int32)
        a = build_stream_blocks_native(toks, docs, v, d, block=block,
                                       vspan=vspan, dspan=dspan,
                                       chunk=chunk)
        assert a is not None
        b = build_stream_blocks_seq(toks, docs, v, d, block=block,
                                    vspan=vspan, dspan=dspan, chunk=chunk)
        for name in ("w_local", "d_local", "mask", "flat_index",
                     "win_w_chunks", "win_d_chunks"):
            np.testing.assert_array_equal(
                getattr(a, name), getattr(b, name), err_msg=name)
        assert (a.nwin_w, a.nwin_d) == (b.nwin_w, b.nwin_d)


def test_blocked_label_counts_kpad_gate(monkeypatch):
    """num_labels past kpad=4096 must route to the XLA scatter-add even
    when the backend reports TPU: the count kernel's one-hot temps grow
    with kpad and the compile crashes the worker at kpad=8192 (round-4
    probe). On this CPU test host the pallas path would fail to lower at
    all, so a correct result here proves the gate took the XLA branch."""
    import jax
    from ldagroupedgibbssampler_tpu.ops import pallas_counts
    monkeypatch.setattr(pallas_counts.jax, "default_backend",
                        lambda: "tpu")
    K = 4200  # kpad -> 4224 > 4096
    c = _corpus(30, 120, seed=7)
    cb = c.cell_blocks(block=256, vspan=128, dspan=128, chunk=128)
    rng = np.random.default_rng(9)
    z = rng.integers(0, K, cb.mask.shape).astype(np.int32)
    nkw = np.asarray(blocked_label_counts(
        jnp.asarray(cb.w_local), jnp.asarray(z), jnp.asarray(cb.win_w),
        jnp.asarray(cb.first_w), nwin=cb.nwin_w, vspan=128, num_labels=K
    ))[:120]
    ref = np.zeros((120, K), np.int64)
    np.add.at(ref, (c.tokens[cb.flat_index[cb.mask]], z[cb.mask]), 1)
    assert np.array_equal(nkw.astype(np.int64), ref)
