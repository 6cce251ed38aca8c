"""Fused PCGS sweep kernel: layout contract, interpret-mode semantics,
draw distribution, gating.

Unlike the GGS kernel (TPU-only Mosaic, validated on-chip), the PCGS sweep
kernel runs under the pltpu TPU-semantics interpreter, so its count
bookkeeping and conditional distribution are validated portably here
(SURVEY.md §4 styles 1 and 3). On-chip validation is in
benchmarks/tpu_kernel_checks.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.pcgs import (
    LDAPartiallyCollapsedGibbsSampler)
from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
    FLAG_ROWS, fused_pcgs_sweep, fused_pcgs_vmem_bytes)


def _rand_corpus(seed=0, docs=70, vocab=300, max_len=60):
    rng = np.random.default_rng(seed)
    toks = [list(rng.integers(0, vocab, rng.integers(3, max_len)))
            for _ in range(docs)]
    return Corpus.from_token_lists(toks, [f"w{i}" for i in range(vocab)])


@pytest.mark.parametrize("vspan,dspan,block", [(128, 128, 512),
                                               (256, 64, 512),
                                               (128, 128, 1024)])
def test_seq_layout_invariants(vspan, dspan, block):
    c = _rand_corpus()
    b = c.cell_blocks_seq(block=block, vspan=vspan, dspan=dspan, chunk=128)
    nch = b.w_local.size // b.chunk
    did = b.doc_ids.reshape(nch, b.chunk)
    m = b.mask.reshape(nch, b.chunk)
    # THE invariant the kernel's correctness rests on: no chunk holds two
    # tokens of the same document
    for r in range(nch):
        d = did[r][m[r]].tolist()
        assert len(d) == len(set(d))
        if d:
            # one d-window per chunk (the table-slice contract)
            assert (did[r][m[r]] // dspan == b.win_d_chunks[r]).all()
    # every token placed exactly once; ids reconstruct; pads sentineled
    fi = b.flat_index[b.mask]
    assert sorted(fi) == list(range(c.num_tokens))
    wg = b.w_local + b.win_w[:, None] * vspan
    assert np.array_equal(wg[b.mask], c.tokens[b.flat_index[b.mask]])
    assert np.all(b.w_local[~b.mask] == vspan)
    assert np.all(b.d_local_a[~b.mask] == dspan)
    recon = (b.win_d_chunks.reshape(nch, 1) * dspan
             + b.d_local_a.reshape(nch, b.chunk))
    assert np.array_equal(recon[m], did[m])
    assert np.all(np.diff(b.win_w) >= 0)
    assert b.first_w.sum() == b.nwin_w


def _run_sweep(c, K, z_flat, doc_mask, phi, alpha, seed=123, vspan=128,
               nk_plus=None, beta=None, u24_override=None):
    b = c.cell_blocks_seq(block=512, vspan=vspan, dspan=128, chunk=128)
    nb = b.w_local.shape[0]
    chunks = b.w_local.shape[1] // b.chunk
    sh3 = (nb, chunks, b.chunk)
    fi3 = b.flat_index.reshape(sh3)
    z_old = np.zeros(sh3, np.int32)
    z_old[fi3 >= 0] = z_flat[fi3[fi3 >= 0]]
    ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ndk, (c.token_doc_ids(), z_flat), 1)
    kpad = max(128, -(-K // 128) * 128)
    table = np.zeros((kpad + FLAG_ROWS, b.nwin_d * 128), np.float32)
    table[:K, :c.num_docs] = (ndk + alpha).T
    table[kpad, :c.num_docs] = doc_mask
    # injected uniforms: InterpretParams lowers the in-kernel PRNG to
    # zeros, so the portable path supplies the 24-bit draws as an operand
    u24 = np.random.default_rng(seed).integers(
        0, 2 ** 24, sh3, dtype=np.int64).astype(np.int32)
    if u24_override is not None:
        u24 = u24_override(b, sh3, u24)
    z, nkw, table_out = fused_pcgs_sweep(
        jnp.asarray(b.w_local.reshape(sh3)),
        jnp.asarray(b.d_local_a.reshape(sh3)),
        jnp.asarray(z_old), jnp.asarray(table), jnp.asarray(phi),
        jnp.asarray([seed], jnp.int32), jnp.asarray(b.win_w),
        jnp.asarray(b.first_w), jnp.asarray(b.win_d_chunks),
        jnp.asarray(u24),
        None if nk_plus is None else jnp.asarray(nk_plus, jnp.float32),
        beta,
        nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=vspan, dspan=128,
        num_topics=K, interpret=jax.default_backend() != "tpu")
    z_out = np.zeros(c.num_tokens, np.int32)
    z_out[fi3[fi3 >= 0]] = np.asarray(z)[fi3 >= 0]
    kept_pads = (np.asarray(z)[fi3 < 0] == z_old[fi3 < 0]).all()
    return z_out, np.asarray(nkw), np.asarray(table_out), kept_pads


def test_fused_sweep_count_semantics():
    """Count conservation + doc-mask semantics (§4 style 3): the returned
    N_kw / n_dk table must equal histograms of the returned z; unselected
    docs and padding keep z; the flag row survives the sweep."""
    rng = np.random.default_rng(1)
    c = _rand_corpus(1)
    K, V = 7, c.num_types
    alpha = np.full(K, 0.4, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    doc_mask = np.ones(c.num_docs, np.float32)
    doc_mask[::3] = 0.0
    phi = rng.dirichlet(np.full(V, 0.1), K).T.astype(np.float32)
    z_out, nkw, table_out, kept_pads = _run_sweep(
        c, K, z_flat, doc_mask, phi, alpha)
    assert kept_pads
    dall = c.token_doc_ids()
    unsel = doc_mask[dall] == 0
    assert (z_out[unsel] == z_flat[unsel]).all()
    assert (z_out[~unsel] != z_flat[~unsel]).any()
    ref_nkw = np.zeros((V, K), np.int64)
    np.add.at(ref_nkw, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref_nkw)
    ref_ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ref_ndk, (dall, z_out), 1)
    kpad = 128
    got = table_out[:K, :c.num_docs].T - alpha[None, :]
    np.testing.assert_allclose(got, ref_ndk, atol=1e-3)
    assert np.array_equal(table_out[kpad, :c.num_docs], doc_mask)


def test_fused_sweep_draw_distribution():
    """Chi-square goodness of fit of the in-kernel draw against the exact
    PCGS conditional (n_dk + alpha_k) * phi[k][w] (§4 style 1,
    UncollapsedParallelLDA.java:1509-1513). 4000 single-token docs with
    identical counts give iid draws from a known distribution (single-token
    docs also make the sweep's sequential update a no-op across tokens)."""
    from scipy import stats as sps
    D, K = 4000, 5
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    # old z = 0 for all; after the in-kernel decrement n_d = alpha
    z_flat = np.zeros(D, np.int32)
    alpha = np.array([0.5, 1.0, 2.0, 0.25, 1.25], np.float32)
    phi = np.array([[0.9, 0.5, 0.1, 0.4, 0.2],
                    [0.1, 0.5, 0.9, 0.6, 0.8]], np.float32)  # [V=2, K]
    p = alpha * phi[0]
    p = p / p.sum()
    z_out, _, _, _ = _run_sweep(c, K, z_flat,
                                np.ones(D, np.float32), phi, alpha, seed=9)
    obs = np.bincount(z_out, minlength=K).astype(np.float64)
    chi2 = float(((obs - p * D) ** 2 / (p * D)).sum())
    assert sps.chi2.sf(chi2, K - 1) > 1e-4, (obs, p * D)


def test_fused_sweep_sequential_updates():
    """The in-sweep n_dk update is visible to later tokens of the same doc:
    with phi uniform and alpha tiny, a doc's tokens must pile onto the
    topic its first-drawn token lands on (the rich-get-richer dynamic only
    happens if updates apply within the sweep)."""
    rng = np.random.default_rng(3)
    D, L, K = 40, 30, 8
    c = Corpus.from_token_lists(
        [list(rng.integers(0, 50, L)) for _ in range(D)],
        [f"w{i}" for i in range(50)])
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    alpha = np.full(K, 1e-4, np.float32)
    phi = np.full((50, K), 1.0 / 50, np.float32)
    # zero starting counts: table holds alpha only -> first token of each
    # doc is ~uniform, later tokens follow the in-sweep counts
    z0 = np.zeros(c.num_tokens, np.int32)
    ndk0 = np.zeros((D, K), np.int64)
    np.add.at(ndk0, (c.token_doc_ids(), z0), 1)
    # subtract the old-z counts so effective n_dk - onehot(z_old) == 0:
    # done by passing z_flat=z0 with counts matching z0 (the kernel
    # decrements each token's own assignment, leaving ~alpha for token 1)
    z_out, _, _, _ = _run_sweep(c, K, z0, np.ones(D, np.float32), phi,
                                alpha, seed=17)
    dall = c.token_doc_ids()
    # each doc should be nearly single-topic (>= 80% majority) vs the
    # uniform draw's expected max share of ~1/8 + noise
    for d in range(D):
        zs = z_out[dall == d]
        share = np.bincount(zs, minlength=K).max() / len(zs)
        assert share >= 0.8, (d, share)


def test_fused_sweep_collapsed_distribution():
    """Collapsed (ADLDA) mode: chi-square of single-token-doc draws against
    the exact conditional (n_dk+alpha_k)(beta+N_kw-own)/(Vbeta+n_k-own)
    (MyWorkerRunnable.java:65-215 semantics). All D tokens share word 0 and
    z_old=0. The kernel keeps counts LIVE, so sweep-entry counts are made
    LARGE (1e6 per topic): <= D reassignments drift the conditional by
    <= 0.2%, statistically invisible at D draws."""
    from scipy import stats as sps
    D, K, V = 2000, 5, 2
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    z_flat = np.zeros(D, np.int32)
    alpha = np.array([0.5, 1.0, 2.0, 0.25, 1.25], np.float32)
    beta = 0.3
    base = np.array([1.0e6, 1.1e6, 0.9e6, 1.2e6, 0.8e6])
    nkw_entry = np.zeros((K, V), np.float64)
    nkw_entry[:, 0] = base
    nkw_entry[0, 0] += 0  # z_old mass (all topic 0) already inside base
    nk_entry = nkw_entry.sum(1)
    counts = nkw_entry.T.astype(np.float32)              # [V, K]
    nk_plus = (beta * V + nk_entry).astype(np.float32)   # [K]
    own = np.zeros(K)
    own[0] = 1.0  # every token's own assignment is topic 0
    p = alpha * (beta + nkw_entry[:, 0] - own) / (beta * V + nk_entry - own)
    p = p / p.sum()
    z_out, nkw, _, _ = _run_sweep(c, K, z_flat, np.ones(D, np.float32),
                                  counts, alpha, seed=21, nk_plus=nk_plus,
                                  beta=beta)
    obs = np.bincount(z_out, minlength=K).astype(np.float64)
    chi2 = float(((obs - p * D) ** 2 / (p * D)).sum())
    assert sps.chi2.sf(chi2, K - 1) > 1e-4, (obs, p * D)
    # LIVE bookkeeping: N_kw out = entry counts + (new - old) histograms
    d_new = np.zeros((V, K), np.int64)
    np.add.at(d_new, (c.tokens, z_out), 1)
    d_old = np.zeros((V, K), np.int64)
    np.add.at(d_old, (c.tokens, z_flat), 1)
    ref = nkw_entry.T.astype(np.int64) + d_new - d_old
    assert np.array_equal(nkw[:V].astype(np.int64), ref)


def _freshness_case():
    """Two selected single-token docs of the same word in DIFFERENT chunks
    (d-windows 0 and 1 via 127 empty filler docs), all z_old = 0: force the
    first-executed token to topic 1 with its injected uniform, then u=0.5
    on the second token discriminates LIVE counts (p(topic0)=3/7 -> draws
    topic 1) from sweep-stale counts (p(topic0)=4/7 -> would draw topic 0).
    Margins are ~7%, far beyond bf16 rounding."""
    c = Corpus.from_token_lists([[0]] + [[]] * 127 + [[0]], ["w0", "w1"])
    assert c.num_docs == 129 and c.num_tokens == 2
    K, beta = 2, 1.0
    alpha = np.ones(K, np.float32)
    z_flat = np.zeros(2, np.int32)
    counts = np.array([[2.0, 0.0], [0.0, 0.0]], np.float32)  # [V, K]
    nk_plus = np.array([2.0 * beta + 2.0, 2.0 * beta + 0.0], np.float32)

    def override(b, sh3, u24):
        fi3 = b.flat_index.reshape(sh3)
        slots = {}
        for tok in (0, 1):
            blk, ch, lane = map(int, np.argwhere(fi3 == tok)[0])
            slots[tok] = (blk, ch, lane)
        order = sorted((0, 1), key=lambda t: slots[t][:2])
        first, second = order
        assert slots[first][:2] != slots[second][:2], "need distinct chunks"
        u = np.copy(u24)
        u[slots[first]] = int(0.8 * 2 ** 24)   # -> topic 1 (boundary 4/7)
        u[slots[second]] = int(0.5 * 2 ** 24)  # live: 3/7<0.5 -> topic 1
        return u

    return c, K, z_flat, counts, alpha, nk_plus, beta, override


def test_fused_sweep_collapsed_live_freshness():
    c, K, z_flat, counts, alpha, nk_plus, beta, override = _freshness_case()
    z_out, nkw, _, _ = _run_sweep(
        c, K, z_flat, np.ones(c.num_docs, np.float32), counts, alpha,
        seed=5, nk_plus=nk_plus, beta=beta, u24_override=override)
    assert z_out.tolist() == [1, 1], z_out
    assert nkw[0, :K].tolist() == [0, 2]


def test_streamed_sweep_collapsed_live_freshness():
    c, K, z_flat, counts, alpha, nk_plus, beta, override = _freshness_case()
    z_out, nkw, _ = _run_stream_sweep(
        c, K, z_flat, np.ones(c.num_docs, np.float32), counts, alpha,
        seed=5, nk_plus=nk_plus, beta=beta, u24_override=override)
    assert z_out.tolist() == [1, 1], z_out
    assert nkw[0, :K].tolist() == [0, 2]


def test_collapsed_live_bookkeeping_resident_and_streamed():
    """With an arbitrary (consistent-totals) sweep-entry N_kw that is NOT
    the z_old histogram, the output must equal entry + (new - old): the
    collapsed kernels carry the live table, not a from-scratch recount."""
    rng = np.random.default_rng(7)
    c = _rand_corpus(7, docs=90, vocab=260)
    K, V, beta = 6, c.num_types, 0.2
    alpha = np.full(K, 0.4, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    hist_old = np.zeros((V, K), np.int64)
    np.add.at(hist_old, (c.tokens, z_flat), 1)
    offset = rng.integers(0, 4, (V, K)).astype(np.int64)
    entry = hist_old + offset                               # [V, K]
    nk_plus = (beta * V + entry.sum(0)).astype(np.float32)
    doc_mask = np.ones(c.num_docs, np.float32)
    doc_mask[::4] = 0.0
    for runner in (_run_sweep, _run_stream_sweep):
        out = runner(c, K, z_flat, doc_mask, entry.astype(np.float32),
                     alpha, seed=11, nk_plus=nk_plus, beta=beta)
        z_out, nkw = out[0], out[1]
        unsel = doc_mask[c.token_doc_ids()] == 0
        assert (z_out[unsel] == z_flat[unsel]).all()
        d_new = np.zeros((V, K), np.int64)
        np.add.at(d_new, (c.tokens, z_out), 1)
        ref = entry + d_new - hist_old
        assert np.array_equal(nkw[:V].astype(np.int64), ref)


def _run_stream_sweep(c, K, z_flat, doc_mask, word, alpha, seed=123,
                      nk_plus=None, beta=None, u24_override=None):
    from ldagroupedgibbssampler_tpu.corpus.ragged import (
        build_stream_blocks_seq)
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
        fused_pcgs_sweep_streamed)
    b = build_stream_blocks_seq(c.tokens, c.token_doc_ids(), c.num_types,
                                c.num_docs, block=512, vspan=128,
                                dspan=128, chunk=128)
    nb = b.w_local.shape[0]
    chunks = b.w_local.shape[1] // b.chunk
    sh3 = (nb, chunks, b.chunk)
    fi3 = b.flat_index.reshape(sh3)
    z_old = np.zeros(sh3, np.int32)
    z_old[fi3 >= 0] = z_flat[fi3[fi3 >= 0]]
    ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ndk, (c.token_doc_ids(), z_flat), 1)
    kpad = max(128, -(-K // 128) * 128)
    table = np.zeros((kpad + FLAG_ROWS, b.nwin_d * 128), np.float32)
    table[:K, :c.num_docs] = (ndk + alpha).T
    table[kpad, :c.num_docs] = doc_mask
    u24 = np.random.default_rng(seed).integers(
        0, 2 ** 24, sh3, dtype=np.int64).astype(np.int32)
    if u24_override is not None:
        u24 = u24_override(b, sh3, u24)
    z, nkw, table_out = fused_pcgs_sweep_streamed(
        jnp.asarray(b.w_local.reshape(sh3)),
        jnp.asarray(b.d_local.reshape(sh3)),
        jnp.asarray(z_old), jnp.asarray(table), jnp.asarray(word),
        jnp.asarray([seed], jnp.int32), jnp.asarray(b.win_w_chunks),
        jnp.asarray(b.win_d_chunks), jnp.asarray(u24),
        None if nk_plus is None else jnp.asarray(nk_plus, jnp.float32),
        beta,
        nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=128, dspan=128,
        num_topics=K, interpret=jax.default_backend() != "tpu")
    z_out = np.zeros(c.num_tokens, np.int32)
    z_out[fi3[fi3 >= 0]] = np.asarray(z)[fi3 >= 0]
    return z_out, np.asarray(nkw), np.asarray(table_out)


@pytest.mark.parametrize("K,docs,vocab", [(7, 300, 500), (300, 300, 500),
                                          (7, 800, 1500)])
def test_streamed_sweep_count_semantics(K, docs, vocab):
    """The HBM-streamed variant (d-window-major StreamBlocks, table/phi/
    N_kw windows DMAed on window change with lookahead prefetch) must
    satisfy the same count semantics as the resident kernel — including
    multi-tile K (kpad=384) and dense window grids (12 w-windows x 7
    d-windows: ~80 switch/prefetch cycles)."""
    rng = np.random.default_rng(1)
    c = _rand_corpus(1, docs=docs, vocab=vocab)
    V = c.num_types
    alpha = np.full(K, 0.4, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    doc_mask = np.ones(c.num_docs, np.float32)
    doc_mask[::3] = 0.0
    phi = rng.dirichlet(np.full(V, 0.1), K).T.astype(np.float32)
    z_out, nkw, table_out = _run_stream_sweep(c, K, z_flat, doc_mask, phi,
                                              alpha)
    dall = c.token_doc_ids()
    unsel = doc_mask[dall] == 0
    assert (z_out[unsel] == z_flat[unsel]).all()
    assert (z_out[~unsel] != z_flat[~unsel]).any()
    ref_nkw = np.zeros((V, K), np.int64)
    np.add.at(ref_nkw, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref_nkw)
    ref_ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ref_ndk, (dall, z_out), 1)
    kpad = max(128, -(-K // 128) * 128)
    got = table_out[:K, :c.num_docs].T - alpha[None, :]
    np.testing.assert_allclose(got, ref_ndk, atol=1e-3)
    assert np.array_equal(table_out[kpad, :c.num_docs], doc_mask)


def test_streamed_sweep_draw_distribution():
    """Chi-square of the streamed variant against the exact PCGS
    conditional (single-token docs, as test_fused_sweep_draw_distribution
    for the resident kernel)."""
    from scipy import stats as sps
    D, K = 4000, 5
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    alpha = np.array([0.5, 1.0, 2.0, 0.25, 1.25], np.float32)
    phi = np.array([[0.9, 0.5, 0.1, 0.4, 0.2],
                    [0.1, 0.5, 0.9, 0.6, 0.8]], np.float32)
    p = alpha * phi[0]
    p = p / p.sum()
    z_out, _, _ = _run_stream_sweep(c, K, np.zeros(D, np.int32),
                                    np.ones(D, np.float32), phi, alpha,
                                    seed=9)
    obs = np.bincount(z_out, minlength=K).astype(np.float64)
    chi2 = float(((obs - p * D) ** 2 / (p * D)).sum())
    assert sps.chi2.sf(chi2, K - 1) > 1e-4, (obs, p * D)


def test_fused_gate_off_tpu_and_vmem():
    c = _rand_corpus(2)
    m = LDAPartiallyCollapsedGibbsSampler(
        LDAConfig(scheme="pcgs", topics=5, alpha=0.5, beta=0.1, seed=3,
                  exec_time=-1, iterations=2))
    m.add_instances(c)
    if jax.default_backend() != "tpu":
        assert not m._use_fused_sweep()
    m.sample(2)  # XLA doc-sequential fallback end to end
    assert np.asarray(m.state.nkw).sum() == c.num_tokens
    # the VMEM gate formula: 1M docs at K=100 exceeds 10 MB
    assert fused_pcgs_vmem_bytes(1_000_000, 100, 128) > 10 * 2 ** 20
    assert fused_pcgs_vmem_bytes(10_000, 100, 128) <= 10 * 2 ** 20


def test_fused_sweep_large_k_semantics_and_support():
    """K > 128 exercises the multi-tile (K > 128) per-tile tril
    inverse-CDF cdf_draw (the hierarchical tile-totals variant was
    measured slower and rejected — PERF.md): count semantics must hold,
    and with zero-support phi columns (Polya-Urn/VS-style sparsity) no
    draw may land on a zero-probability topic — the exact masked-iota
    last-nonzero clamp."""
    rng = np.random.default_rng(11)
    c = _rand_corpus(2)
    K, V = 200, c.num_types
    alpha = np.full(K, 0.3, np.float32)
    support = np.zeros(K, bool)
    support[::3] = True  # topics 0, 3, 6, ... have support in both tiles
    phi = rng.dirichlet(np.full(V, 0.1), K).T.astype(np.float32)
    phi[:, ~support] = 0.0
    z_flat = rng.choice(np.flatnonzero(support),
                        c.num_tokens).astype(np.int32)
    doc_mask = np.ones(c.num_docs, np.float32)
    z_out, nkw, table_out, kept_pads = _run_sweep(
        c, K, z_flat, doc_mask, phi, alpha)
    assert kept_pads
    assert support[z_out].all()
    assert (z_out != z_flat).any()
    ref_nkw = np.zeros((V, K), np.int64)
    np.add.at(ref_nkw, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref_nkw)
    ref_ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ref_ndk, (c.token_doc_ids(), z_out), 1)
    got = table_out[:K, :c.num_docs].T - alpha[None, :]
    np.testing.assert_allclose(got, ref_ndk, atol=1e-3)


def test_fused_sweep_large_k_distribution():
    """Chi-square at K = 200 (two topic tiles) against the exact PCGS
    conditional, mass spread across both tiles, pooled into 8 buckets."""
    from scipy import stats as sps
    rng = np.random.default_rng(13)
    D, K = 8000, 200
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    z_flat = np.zeros(D, np.int32)
    alpha = (rng.gamma(1.0, 1.0, K) + 0.05).astype(np.float32)
    # in-kernel decrement of the old z=0 makes the effective doc count
    # alpha again only if n_d0 entered as alpha+1; _run_sweep builds the
    # table from z_flat's histogram, so doc 0 carries +1 on topic 0 which
    # the kernel removes before drawing — the conditional is alpha * phi.
    phi = np.stack([np.full(K, 0.7, np.float32),
                    np.full(K, 0.3, np.float32)])  # [V=2, K]
    p = alpha * phi[0]
    p = p / p.sum()
    z_out, _, _, _ = _run_sweep(c, K, z_flat,
                                np.ones(D, np.float32), phi, alpha, seed=17)
    edges = np.linspace(0, K, 9).astype(int)
    obs = np.add.reduceat(np.bincount(z_out, minlength=K), edges[:-1])
    exp = np.add.reduceat(p * D, edges[:-1])
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert sps.chi2.sf(chi2, len(exp) - 1) > 1e-4, (obs, exp)


def test_streamed_vmem_gate_counts_k_temps():
    """The streamed-sweep gate must include the kernels' K-proportional
    scoped-VMEM compute temps (round-3 fix, calibrated against a
    measured compile-time OOM at kpad=4096). At kpad >= KTILE_MIN the
    K-TILED chunk body replaces them with the staged probs_buf + an
    O(tile) allowance, so K=4096 PCGS/ADLDA streamed configs now FIT
    (at the 1024-token block _streamed_block caps them to) instead of
    falling back to the XLA sweep; the MH kernel's two bf16 word-table
    slot sets still exceed the budget at K=4096."""
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
        fused_pcgs_streamed_vmem_bytes)
    budget = 14 * 2 ** 20
    # K=1000: fits at vspan<=256 (the measured 7c row runs fused)
    assert fused_pcgs_streamed_vmem_bytes(1000, 256, 128, 4096) <= budget
    # K=4096 PCGS (spalias 7d) and collapsed (ADLDA) fit via the tiled
    # body at vspan=128, block=1024
    assert fused_pcgs_streamed_vmem_bytes(4096, 128, 128, 1024) <= budget
    assert fused_pcgs_streamed_vmem_bytes(
        4096, 128, 128, 1024, collapsed=True) <= budget
    # MH kernel (2 word tables) at K=1000 must also remain eligible at
    # the minimum vspan (the measured 9_lightpclda_20ng_k1000 row)
    assert fused_pcgs_streamed_vmem_bytes(
        1000, 128, 128, 4096, num_word_tables=2) <= budget
    # ... but its NBUF x 2 bf16 word slots (~6.3 MB at kpad=4096) keep
    # K=4096 lightpclda on the XLA fallback (PERF.md row 9c)
    assert fused_pcgs_streamed_vmem_bytes(
        4096, 128, 128, 1024, num_word_tables=2) > budget


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_streamed_sweep_ktiled_count_semantics():
    """The K-TILED streamed chunk body (kpad >= KTILE_MIN: probs staged
    through the [kpad, 128] bf16 scratch, per-tile table/word selects,
    running tril offsets, per-tile delta updates) must satisfy the same
    count semantics as the untiled body — returned N_kw / n_dk equal
    histograms of the returned z, doc-mask and flag-row preserved."""
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import KTILE_MIN
    rng = np.random.default_rng(5)
    c = _rand_corpus(5, docs=150, vocab=400, max_len=40)
    K, V = KTILE_MIN, c.num_types  # kpad == KTILE_MIN engages the tiling
    alpha = np.full(K, 0.05, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    doc_mask = np.ones(c.num_docs, np.float32)
    doc_mask[::4] = 0.0
    phi = rng.dirichlet(np.full(V, 0.1), K).T.astype(np.float32)
    z_out, nkw, table_out = _run_stream_sweep(c, K, z_flat, doc_mask, phi,
                                              alpha)
    dall = c.token_doc_ids()
    unsel = doc_mask[dall] == 0
    assert (z_out[unsel] == z_flat[unsel]).all()
    assert (z_out[~unsel] != z_flat[~unsel]).any()
    ref_nkw = np.zeros((V, K), np.int64)
    np.add.at(ref_nkw, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref_nkw)
    ref_ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ref_ndk, (dall, z_out), 1)
    got = table_out[:K, :c.num_docs].T - alpha[None, :]
    np.testing.assert_allclose(got, ref_ndk, atol=1e-3)
    assert np.array_equal(table_out[K, :c.num_docs], doc_mask)


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_streamed_sweep_ktiled_draw_distribution():
    """Chi-square of the K-TILED body's draws against the exact PCGS
    conditional at K = KTILE_MIN: the tiled inverse-CDF runs with
    RUNNING offsets accumulated from the tril row-127 totals and a
    separately-computed VPU grand total scaling u — a subtly wrong
    offset bookkeeping would shift mass between tile boundaries while
    still conserving counts, so count tests alone cannot catch it."""
    from scipy import stats as sps
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import KTILE_MIN
    rng = np.random.default_rng(23)
    D, K = 6000, KTILE_MIN
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    alpha = (rng.gamma(1.0, 1.0, K) + 0.05).astype(np.float32)
    phi = np.stack([np.full(K, 0.7, np.float32),
                    np.full(K, 0.3, np.float32)])  # [V=2, K]
    p = alpha * phi[0]
    p = p / p.sum()
    z_out, _, _ = _run_stream_sweep(c, K, np.zeros(D, np.int32),
                                    np.ones(D, np.float32), phi, alpha,
                                    seed=41)
    # pool the K=2048 cells into 16 equal-index buckets spanning all
    # topic tiles (expected counts ~375 per bucket)
    edges = np.linspace(0, K, 17).astype(int)
    obs = np.add.reduceat(np.bincount(z_out, minlength=K), edges[:-1])
    exp = np.add.reduceat(p * D, edges[:-1])
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert sps.chi2.sf(chi2, len(exp) - 1) > 1e-4, (obs, exp)


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_streamed_sweep_ktiled_collapsed_and_support():
    """Tiled body, collapsed (ADLDA live-count) mode: counts conserve and
    the live N_kw output equals an exact recount of the returned z; with
    zero-support word columns no draw lands outside the support (the
    per-tile masked-iota lastnz clamp survives the tiling)."""
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import KTILE_MIN
    rng = np.random.default_rng(7)
    c = _rand_corpus(7, docs=120, vocab=300, max_len=30)
    K, V = KTILE_MIN, c.num_types
    alpha = np.full(K, 0.05, np.float32)
    beta = 0.01
    support = np.zeros(K, bool)
    support[::5] = True
    z_flat = rng.choice(np.flatnonzero(support),
                        c.num_tokens).astype(np.int32)
    doc_mask = np.ones(c.num_docs, np.float32)
    nkw0 = np.zeros((V, K), np.float32)
    np.add.at(nkw0, (c.tokens, z_flat), 1.0)
    nk = nkw0.sum(axis=0)
    # zero-support check rides the PCGS (phi) mode: phi columns without
    # support are exactly zero
    phi = rng.dirichlet(np.full(V, 0.1), K).T.astype(np.float32)
    phi[:, ~support] = 0.0
    z_sup, _, _ = _run_stream_sweep(c, K, z_flat, doc_mask, phi, alpha,
                                    seed=31)
    assert support[z_sup].all()
    assert (z_sup != z_flat).any()
    # collapsed live-count mode at tiled K
    z_out, nkw, table_out = _run_stream_sweep(
        c, K, z_flat, doc_mask, nkw0, alpha, seed=32,
        nk_plus=(V * beta + nk).astype(np.float32), beta=beta)
    ref_nkw = np.zeros((V, K), np.int64)
    np.add.at(ref_nkw, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref_nkw)
    ref_ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ref_ndk, (c.token_doc_ids(), z_out), 1)
    got = table_out[:K, :c.num_docs].T - alpha[None, :]
    np.testing.assert_allclose(got, ref_ndk, atol=1e-3)
