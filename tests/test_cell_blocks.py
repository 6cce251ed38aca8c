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
