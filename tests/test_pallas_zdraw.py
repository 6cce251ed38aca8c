"""Tests for the fused z-draw kernel: layout contract, fallback gating,
and portable statistical validation under the pltpu interpreter with
injected uniforms (the in-kernel PRNG only lowers on real TPU; on-chip
validation with the real PRNG is benchmarks/tpu_kernel_checks.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler
from ldagroupedgibbssampler_tpu.ops.pallas_zdraw import fused_zdraw_nkw


def _rand_corpus(seed=0, docs=90, vocab=700):
    rng = np.random.default_rng(seed)
    lens = rng.integers(5, 120, docs)
    toks = [list(rng.integers(0, vocab, n).astype(int)) for n in lens]
    return Corpus.from_token_lists(toks, [f"w{i}" for i in range(vocab)])


@pytest.mark.parametrize("vspan,dspan,chunk", [(128, 128, 128),
                                               (256, 128, 128),
                                               (128, 512, 128)])
def test_layout_a_doc_metadata(vspan, dspan, chunk):
    corpus = _rand_corpus()
    blocks = corpus.cell_blocks(block=1024, vspan=vspan, dspan=dspan,
                                chunk=chunk)
    nchunks_total = blocks.w_local.size // chunk
    d_local = blocks.d_local_a.reshape(nchunks_total, chunk)
    mask = blocks.mask.reshape(nchunks_total, chunk)
    doc_ids = blocks.doc_ids.reshape(nchunks_total, chunk)
    assert blocks.win_d_chunks.shape == (nchunks_total,)
    # valid slots: win_d * dspan + d_local == global doc id, d_local in range
    recon = blocks.win_d_chunks[:, None] * dspan + d_local
    assert (recon[mask] == doc_ids[mask]).all()
    assert (d_local[mask] >= 0).all() and (d_local[mask] < dspan).all()
    # padding slots carry the sentinel (never matched by the one-hot)
    assert (d_local[~mask] == dspan).all()
    # every chunk holds at most one d-window (the kernel's slicing contract)
    for r in range(nchunks_total):
        if mask[r].any():
            wins = doc_ids[r][mask[r]] // dspan
            assert (wins == blocks.win_d_chunks[r]).all()


def test_fused_zdraw_gating_off_tpu():
    corpus = _rand_corpus(1)
    model = LDAGroupedGibbsSampler(
        LDAConfig(scheme="ggs", topics=5, alpha=0.5, beta=0.1, iterations=2,
                  seed=3, exec_time=-1))
    model.add_instances(corpus)
    if jax.default_backend() != "tpu":
        assert not model._use_fused_zdraw()
    model.sample(2)  # the XLA fallback still runs end to end
    nkw = np.asarray(model.state.nkw)
    assert nkw.sum() == corpus.num_tokens


def test_fused_zdraw_kpad_gate(monkeypatch):
    """Past kpad=4096 the fused z-draw must NOT be selected even on TPU:
    the kernel's per-chunk scoped-VMEM temps grow with kpad and the
    compile crashes the remote worker at kpad=8192 (round-4 probe). The
    gate falls back to the segmented XLA z-draw instead."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    mk = lambda k: LDAGroupedGibbsSampler(
        LDAConfig(scheme="ggs", topics=k, alpha=0.5, beta=0.1,
                  iterations=1, seed=3, exec_time=-1))
    assert mk(4096)._use_fused_zdraw()
    assert not mk(4097)._use_fused_zdraw()
    assert not mk(8192)._use_fused_zdraw()


def test_zdraw_kernel_xla_forced():
    corpus = _rand_corpus(2)
    model = LDAGroupedGibbsSampler(
        LDAConfig(scheme="ggs", topics=4, alpha=0.5, beta=0.1, iterations=1,
                  seed=3, exec_time=-1, zdraw_kernel="xla"))
    model.add_instances(corpus)
    assert not model._use_fused_zdraw()


def _run_zdraw(c, K, z_flat, theta, phi, seed=11, precise=False,
               stream=False):
    b = c.cell_blocks(block=512, vspan=128, dspan=128, chunk=128)
    nb = b.w_local.shape[0]
    chunks = b.w_local.shape[1] // b.chunk
    sh3 = (nb, chunks, b.chunk)
    fi3 = b.flat_index.reshape(sh3)
    z_old = np.zeros(sh3, np.int32)
    z_old[fi3 >= 0] = z_flat[fi3[fi3 >= 0]]
    u24 = np.random.default_rng(seed).integers(
        0, 2 ** 24, sh3, dtype=np.int64).astype(np.int32)
    z, nkw = fused_zdraw_nkw(
        jnp.asarray(b.w_local.reshape(sh3)),
        jnp.asarray(b.d_local_a.reshape(sh3)), jnp.asarray(z_old),
        jnp.asarray(theta), jnp.asarray(phi),
        jnp.asarray([seed], jnp.int32), jnp.asarray(b.win_w),
        jnp.asarray(b.first_w), jnp.asarray(b.win_d_chunks),
        jnp.asarray(u24), nwin_w=b.nwin_w, nwin_d=b.nwin_d,
        vspan=128, dspan=128, num_topics=K, precise=precise,
        stream_theta=stream, interpret=jax.default_backend() != "tpu")
    z_out = np.zeros(c.num_tokens, np.int32)
    z_out[fi3[fi3 >= 0]] = np.asarray(z)[fi3 >= 0]
    return z_out, np.asarray(nkw)


@pytest.mark.parametrize("precise,stream", [(False, False), (True, False),
                                            (False, True)])
def test_zdraw_kernel_semantics_interpret(precise, stream):
    """One-hot theta forces planted topics; zeroed-theta docs keep z;
    N_kw matches a histogram of the returned z — the interpreter run of
    the on-chip checks (benchmarks/tpu_kernel_checks.py tests 1-2)."""
    rng = np.random.default_rng(0)
    D, V, K = 90, 400, 13
    c = Corpus.from_token_lists(
        [list(rng.integers(0, V, rng.integers(3, 60))) for _ in range(D)],
        [f"w{i}" for i in range(V)])
    doc_topic = (np.arange(D) % K).astype(np.int32)
    theta = np.zeros((D, K), np.float32)
    theta[np.arange(D), doc_topic] = 1.0
    theta[::5] = 0.0  # random-scan: unselected docs
    phi = np.full((V, K), 1.0 / V, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    z_out, nkw = _run_zdraw(c, K, z_flat, theta, phi, precise=precise,
                            stream=stream)
    dall = c.token_doc_ids()
    sel = (dall % 5) != 0
    assert np.array_equal(z_out[sel], doc_topic[dall][sel])
    assert np.array_equal(z_out[~sel], z_flat[~sel])
    ref = np.zeros((V, K), np.int64)
    np.add.at(ref, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref)


def test_zdraw_kernel_distribution_interpret():
    """Chi-square of the kernel's draws against the exact conditional
    theta_d[k] * phi[k][w] (single-token docs, identical rows)."""
    from scipy import stats as sps
    D, K = 6000, 5
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    theta = np.tile(np.array([0.1, 0.3, 0.05, 0.35, 0.2], np.float32),
                    (D, 1))
    phi = np.array([[0.5, 0.1, 0.3, 0.05, 0.05],
                    [0.5, 0.9, 0.7, 0.95, 0.95]], np.float32)
    p = theta[0] * phi[0]
    p = p / p.sum()
    z_out, _ = _run_zdraw(c, K, np.zeros(D, np.int32), theta, phi, seed=23)
    obs = np.bincount(z_out, minlength=K).astype(np.float64)
    chi2 = float(((obs - p * D) ** 2 / (p * D)).sum())
    assert sps.chi2.sf(chi2, K - 1) > 1e-4, (obs, p * D)


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_xla_fallback_segmentation_invariant(monkeypatch):
    """The segmented fallback (large-K memory bound) draws the SAME z as the
    monolithic formulation: uniforms are drawn over the global token axis
    before segmentation."""
    from ldagroupedgibbssampler_tpu.models import ggs as ggs_mod

    def run():
        corpus = _rand_corpus(7, docs=60, vocab=500)
        model = LDAGroupedGibbsSampler(
            LDAConfig(scheme="ggs", topics=6, alpha=0.5, beta=0.1, seed=4,
                      exec_time=-1, token_block=512, zdraw_kernel="xla"))
        model.add_instances(corpus)
        model.sample(3)
        return model.get_z_indicators()

    z1 = run()
    monkeypatch.setattr(ggs_mod, "_XLA_ZDRAW_TEMP_BYTES", 4096)  # force many
    z2 = run()
    np.testing.assert_array_equal(z1, z2)


@pytest.mark.parametrize("precise,stream", [(False, False), (False, True)])
def test_zdraw_kernel_semantics_large_k_interpret(precise, stream):
    """K > 128 exercises the multi-tile (K > 128) per-tile tril
    inverse-CDF with the masked-iota last-nonzero clamp (the shipped
    cdf_draw; the hierarchical tile-totals variant was measured slower
    and rejected — PERF.md): planted one-hot topics across both topic
    tiles must be drawn exactly, zeroed-theta docs keep z, and N_kw
    matches a histogram of the returned z."""
    rng = np.random.default_rng(3)
    D, V, K = 210, 300, 200
    c = Corpus.from_token_lists(
        [list(rng.integers(0, V, rng.integers(3, 40))) for _ in range(D)],
        [f"w{i}" for i in range(V)])
    doc_topic = (np.arange(D) % K).astype(np.int32)
    theta = np.zeros((D, K), np.float32)
    theta[np.arange(D), doc_topic] = 1.0
    theta[::7] = 0.0
    phi = np.full((V, K), 1.0 / V, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    z_out, nkw = _run_zdraw(c, K, z_flat, theta, phi, precise=precise,
                            stream=stream)
    dall = c.token_doc_ids()
    sel = (dall % 7) != 0
    assert np.array_equal(z_out[sel], doc_topic[dall][sel])
    assert np.array_equal(z_out[~sel], z_flat[~sel])
    ref = np.zeros((V, K), np.int64)
    np.add.at(ref, (c.tokens, z_out), 1)
    assert np.array_equal(nkw[:V].astype(np.int64), ref)


def test_zdraw_kernel_distribution_large_k_interpret():
    """Chi-square at K = 200 (two topic tiles): mass split across both
    tiles, pooled into 8 buckets spanning the tile boundary."""
    from scipy import stats as sps
    rng = np.random.default_rng(5)
    D, K = 8000, 200
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    w = rng.gamma(1.0, 1.0, K).astype(np.float32) + 0.05
    theta = np.tile(w / w.sum(), (D, 1))
    phi = np.stack([np.full(K, 0.6, np.float32),
                    np.full(K, 0.4, np.float32)])
    p = theta[0] * phi[0]
    p = p / p.sum()
    z_out, _ = _run_zdraw(c, K, np.zeros(D, np.int32), theta, phi, seed=31)
    edges = np.linspace(0, K, 9).astype(int)
    obs = np.add.reduceat(np.bincount(z_out, minlength=K), edges[:-1])
    exp = np.add.reduceat(p * D, edges[:-1])
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert sps.chi2.sf(chi2, len(exp) - 1) > 1e-4, (obs, exp)
