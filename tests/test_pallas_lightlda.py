"""Fused LightLDA MH sweep kernel: count semantics and the exact two-step
MH transition distribution (interpreter path with injected uniforms;
SURVEY.md §4 styles 1+3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.lightlda import (
    CollapsedLightLDA, LightPCLDA)
from ldagroupedgibbssampler_tpu.ops.pallas_lightlda import (
    fused_lightlda_sweep)
from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import FLAG_ROWS


def _run_mh(c, K, z_flat, doc_mask, tw, qw, alpha, seed=123,
            streamed=False):
    interp = jax.default_backend() != "tpu"
    kpad = max(128, -(-K // 128) * 128)
    ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ndk, (c.token_doc_ids(), z_flat), 1)
    if streamed:
        from ldagroupedgibbssampler_tpu.corpus.ragged import (
            build_stream_blocks_seq)
        from ldagroupedgibbssampler_tpu.ops.pallas_lightlda import (
            fused_lightlda_sweep_streamed)
        b = build_stream_blocks_seq(c.tokens, c.token_doc_ids(),
                                    c.num_types, c.num_docs, block=512,
                                    vspan=128, dspan=128, chunk=128)
        d_loc = b.d_local
    else:
        b = c.cell_blocks_seq(block=512, vspan=128, dspan=128, chunk=128)
        d_loc = b.d_local_a
    nb = b.w_local.shape[0]
    chunks = b.w_local.shape[1] // b.chunk
    sh3 = (nb, chunks, b.chunk)
    fi3 = b.flat_index.reshape(sh3)
    z_old = np.zeros(sh3, np.int32)
    z_old[fi3 >= 0] = z_flat[fi3[fi3 >= 0]]
    table = np.zeros((kpad + FLAG_ROWS, b.nwin_d * 128), np.float32)
    table[:K, :c.num_docs] = (ndk + alpha).T
    table[kpad, :c.num_docs] = doc_mask
    u24 = np.random.default_rng(seed).integers(
        0, 2 ** 24, (nb, 4 * chunks, b.chunk), dtype=np.int64
    ).astype(np.int32)
    if streamed:
        z, nkw, table_out = fused_lightlda_sweep_streamed(
            jnp.asarray(b.w_local.reshape(sh3)),
            jnp.asarray(d_loc.reshape(sh3)),
            jnp.asarray(z_old), jnp.asarray(table), jnp.asarray(tw),
            jnp.asarray(qw), jnp.asarray([seed], jnp.int32),
            jnp.asarray(b.win_w_chunks), jnp.asarray(b.win_d_chunks),
            jnp.asarray(u24), nwin_w=b.nwin_w, nwin_d=b.nwin_d,
            vspan=128, dspan=128, num_topics=K, interpret=interp)
    else:
        z, nkw, table_out = fused_lightlda_sweep(
            jnp.asarray(b.w_local.reshape(sh3)),
            jnp.asarray(d_loc.reshape(sh3)),
            jnp.asarray(z_old), jnp.asarray(table), jnp.asarray(tw),
            jnp.asarray(qw), jnp.asarray([seed], jnp.int32),
            jnp.asarray(b.win_w), jnp.asarray(b.first_w),
            jnp.asarray(b.win_d_chunks), jnp.asarray(u24),
            nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=128, dspan=128,
            num_topics=K, interpret=interp)
    z_out = np.zeros(c.num_tokens, np.int32)
    z_out[fi3[fi3 >= 0]] = np.asarray(z)[fi3 >= 0]
    return z_out, np.asarray(nkw), np.asarray(table_out)


def test_mh_count_semantics():
    rng = np.random.default_rng(1)
    c = Corpus.from_token_lists(
        [list(rng.integers(0, 300, rng.integers(3, 60)))
         for _ in range(70)], [f"w{i}" for i in range(300)])
    K, V = 7, 300
    alpha = np.full(K, 0.4, np.float32)
    z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
    doc_mask = np.ones(c.num_docs, np.float32)
    doc_mask[::3] = 0.0
    phi = rng.dirichlet(np.full(V, 0.1), K).astype(np.float32)  # [K, V]
    z_out, nkw, table_out = _run_mh(c, K, z_flat, doc_mask, phi.T, phi.T,
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


def _mh_oracle(z0, nd, tw_w, qw_w):
    """Exact distribution of z2 after one two-step MH transition from z0
    with fixed nd (= n^{-i}+alpha), word target column tw_w, proposal
    column qw_w — enumerating all (k1, accept, k2, accept) paths. The doc
    proposal draws from ndq = bf16(nd) and its acceptance uses ndq for the
    proposal ratio and nd for the target, matching the kernel."""
    K = len(nd)
    ndq = np.asarray(jnp.asarray(nd, jnp.float32).astype(jnp.bfloat16),
                     np.float64)
    q1 = qw_w / qw_w.sum()
    qd = ndq / ndq.sum()
    p1 = np.zeros(K)  # distribution of z1
    for k1 in range(K):
        a1 = min(1.0, (nd[k1] * tw_w[k1] * qw_w[z0])
                 / (nd[z0] * tw_w[z0] * qw_w[k1]))
        p1[k1] += q1[k1] * a1
        p1[z0] += q1[k1] * (1 - a1)
    p2 = np.zeros(K)
    for z1 in range(K):
        if p1[z1] == 0:
            continue
        for k2 in range(K):
            a2 = min(1.0, (nd[k2] * tw_w[k2] * ndq[z1])
                     / (nd[z1] * tw_w[z1] * ndq[k2]))
            p2[k2] += p1[z1] * qd[k2] * a2
            p2[z1] += p1[z1] * qd[k2] * (1 - a2)
    return p2


@pytest.mark.parametrize("streamed", [False, True])
@pytest.mark.parametrize("alpha_row", [
    [0.5, 1.0, 2.0, 0.25, 1.25],   # bf16-exact alphas (ndq == nd)
    [0.1, 0.3, 0.7, 0.11, 0.23],   # non-bf16-exact: exercises the
                                   # quantised doc-proposal correction
])
def test_mh_transition_distribution(alpha_row, streamed):
    """Chi-square of the kernel's one-sweep draws for single-token docs
    against the exactly enumerated two-step MH transition distribution
    (bf16-quantised tables, as the kernel uses)."""
    from scipy import stats as sps
    D, K = 8000, 5
    c = Corpus.from_token_lists([[0]] * D, ["w0", "w1"])
    z_flat = np.zeros(D, np.int32)
    alpha = np.array(alpha_row, np.float32)
    tw = np.array([[0.5, 0.1, 0.3, 0.05, 0.05],
                   [0.1, 0.4, 0.1, 0.2, 0.2]], np.float32)   # [V=2, K]
    qw = np.array([[0.2, 0.3, 0.1, 0.25, 0.15],
                   [0.3, 0.1, 0.2, 0.2, 0.2]], np.float32)
    twq = np.asarray(jnp.asarray(tw).astype(jnp.bfloat16), np.float64)
    qwq = np.asarray(jnp.asarray(qw).astype(jnp.bfloat16), np.float64)
    # single token, z0=0: after the own-count decrement nd = alpha
    p = _mh_oracle(0, alpha.astype(np.float64), twq[0], qwq[0])
    z_out, _, _ = _run_mh(c, K, z_flat, np.ones(D, np.float32), tw, qw,
                          alpha, seed=33, streamed=streamed)
    obs = np.bincount(z_out, minlength=K).astype(np.float64)
    chi2 = float(((obs - p * D) ** 2 / (p * D)).sum())
    assert sps.chi2.sf(chi2, K - 1) > 1e-4, (obs, p * D)


def test_mh_sequential_concentration():
    """In-sweep n_dk visibility: with uniform word terms and tiny alpha the
    doc-proposal step must concentrate each document onto few topics."""
    rng = np.random.default_rng(3)
    D, L, K, V = 40, 40, 8, 50
    c = Corpus.from_token_lists(
        [list(rng.integers(0, V, L)) for _ in range(D)],
        [f"w{i}" for i in range(V)])
    alpha = np.full(K, 1e-4, np.float32)
    uni = np.full((V, K), 1.0 / V, np.float32)
    z0 = np.zeros(c.num_tokens, np.int32)
    z_out, _, _ = _run_mh(c, K, z0, np.ones(D, np.float32), uni, uni,
                          alpha, seed=17)
    dall = c.token_doc_ids()
    shares = [np.bincount(z_out[dall == d], minlength=K).max() / L
              for d in range(D)]
    assert np.mean(shares) >= 0.6, np.mean(shares)


@pytest.mark.parametrize("cls,scheme", [(LightPCLDA, "lightpclda"),
                                        (CollapsedLightLDA,
                                         "lightcollapsed")])
def test_mh_gate_and_xla_fallback(cls, scheme):
    rng = np.random.default_rng(5)
    c = Corpus.from_token_lists(
        [list(rng.integers(0, 200, rng.integers(5, 50)))
         for _ in range(50)], [f"w{i}" for i in range(200)])
    m = cls(LDAConfig(scheme=scheme, topics=5, alpha=0.5, beta=0.1,
                      seed=3, exec_time=-1))
    m.add_instances(c)
    if jax.default_backend() != "tpu":
        assert not m._use_fused_sweep()
    m.sample(2)
    assert np.asarray(m.state.nkw).sum() == c.num_tokens
