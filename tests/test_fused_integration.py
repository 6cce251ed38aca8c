"""End-to-end integration of the fused sweep paths on CPU via
zdraw_kernel="interpret" (the pltpu interpreter).

The interpreter lowers the in-kernel PRNG to zeros, so the chains are
statistically degenerate here — what these tests pin is the full model
wiring around the kernels (block layout build, n_dk table construction,
word-table orientation, count extraction, accessors, checkpoint) that
only executes when the fused gate is on, i.e. exactly the code the
CPU suite would otherwise never run. Statistical validation of the same
paths: tests/test_pallas_pcgs.py / test_pallas_lightlda.py (injected
uniforms) and benchmarks/tpu_pcgs_checks.py (real PRNG, on-chip).
"""

import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.registry import create_model


def _tiny_corpus(seed=0, docs=30, vocab=120, max_len=30):
    rng = np.random.default_rng(seed)
    toks = [list(rng.integers(0, vocab, rng.integers(2, max_len)))
            for _ in range(docs)]
    return Corpus.from_token_lists(toks, [f"w{i}" for i in range(vocab)])


@pytest.mark.parametrize("scheme", ["pcgs", "uncollapsed", "spalias",
                                    "adlda", "ppu_hdplda", "lightpclda",
                                    "lightcollapsed", "polyaurn",
                                    "nzvsspalias", "ppu_hlda",
                                    "efficient_uncollapsed",
                                    "lightpcldaw2"])
def test_fused_path_end_to_end(scheme):
    c = _tiny_corpus()
    m = create_model(LDAConfig(scheme=scheme, topics=6, alpha=0.5,
                               beta=0.1, seed=7, exec_time=-1,
                               zdraw_kernel="interpret", token_block=512))
    m.add_instances(c)
    assert m._use_fused_sweep()
    m.sample(2)
    st = m.state
    assert int(np.asarray(st.nkw).sum()) == c.num_tokens
    assert int(np.asarray(st.ndk).sum()) == c.num_tokens
    # z accessors roundtrip through the block layout
    z = m.get_z_indicators()
    assert z.shape == (c.num_tokens,)
    ref_nkw = np.zeros((c.num_types, 6), np.int64)
    np.add.at(ref_nkw, (c.tokens, z), 1)
    nkw = np.asarray(m._nkw_kv())
    assert np.array_equal(nkw.T.astype(np.int64), ref_nkw)
    m.set_z_indicators(z)
    np.testing.assert_array_equal(m.get_z_indicators(), z)


@pytest.mark.parametrize("scheme", ["pcgs", "adlda", "ppu_hdplda",
                                    "lightpclda", "lightcollapsed"])
def test_streamed_path_end_to_end(scheme, monkeypatch):
    """Force the HBM-streamed fused sweep (the large-KxD mode) by
    shrinking the VMEM budget; same wiring invariants as the resident
    path."""
    from ldagroupedgibbssampler_tpu.models import fused_sweep as fs
    monkeypatch.setattr(fs, "_FUSED_PCGS_VMEM_BUDGET", 1)
    c = _tiny_corpus(2)
    m = create_model(LDAConfig(scheme=scheme, topics=6, alpha=0.5,
                               beta=0.1, seed=7, exec_time=-1,
                               zdraw_kernel="interpret", token_block=512))
    m.add_instances(c)
    assert m._fused_mode() == "streamed"
    m.sample(2)
    st = m.state
    assert int(np.asarray(st.nkw).sum()) == c.num_tokens
    z = m.get_z_indicators()
    ref_nkw = np.zeros((c.num_types, 6), np.int64)
    np.add.at(ref_nkw, (c.tokens, z), 1)
    assert np.array_equal(np.asarray(m._nkw_kv()).T.astype(np.int64),
                          ref_nkw)
    ref_ndk = np.zeros((c.num_docs, 6), np.int64)
    np.add.at(ref_ndk, (c.token_doc_ids(), z), 1)
    assert np.array_equal(np.asarray(st.ndk).astype(np.int64), ref_ndk)


@pytest.mark.parametrize("scheme", ["pcgs", "adlda"])
def test_ktiled_body_equals_untiled(scheme, monkeypatch):
    """The K-tiled streamed chunk body must be draw-for-draw IDENTICAL
    to the untiled streamed body given the same injected uniforms
    (round-3 VERDICT item 4): both compute the same per-128-row tril
    cdf with running offsets and the same HIGHEST-precision selects, so
    at K=130 (kpad=256, TWO K-tiles — the running-offset seam is
    exercised) the chains must agree exactly. Equality transfers the
    untiled body's Geweke validation to the tiled body."""
    from ldagroupedgibbssampler_tpu.models import fused_sweep as fs
    monkeypatch.setattr(fs, "_FUSED_PCGS_VMEM_BUDGET", 1)
    c = _tiny_corpus(3, docs=20, vocab=60, max_len=20)
    zs, counts = [], []
    for force in (False, True):
        m = create_model(LDAConfig(scheme=scheme, topics=130, alpha=0.4,
                                   beta=0.1, seed=11, exec_time=-1,
                                   zdraw_kernel="interpret",
                                   token_block=512))
        m._force_ktile = force
        m.add_instances(c)
        assert m._fused_mode() == "streamed"
        m.sample(2)
        zs.append(m.get_z_indicators())
        counts.append(np.asarray(m._nkw_kv()))
    np.testing.assert_array_equal(zs[0], zs[1])
    np.testing.assert_array_equal(counts[0], counts[1])


def test_fused_checkpoint_roundtrip(tmp_path):
    c = _tiny_corpus(1)
    cfg = LDAConfig(scheme="pcgs", topics=5, alpha=0.5, beta=0.1, seed=3,
                    exec_time=-1, zdraw_kernel="interpret", token_block=512)
    m1 = create_model(cfg)
    m1.add_instances(c)
    m1.sample(2)
    ckpt = str(tmp_path / "st.npz")
    m1.save_checkpoint(ckpt)
    # load into an XLA-path model: the flat-z checkpoint must port across
    # the layout boundary
    m2 = create_model(cfg.replace(zdraw_kernel="xla"))
    m2.add_instances(c)
    m2.load_checkpoint(ckpt)
    np.testing.assert_array_equal(m2.get_z_indicators(),
                                  m1.get_z_indicators())
    np.testing.assert_array_equal(np.asarray(m2.state.ndk),
                                  np.asarray(m1.state.ndk))


def test_streamed_vmem_gate():
    """The streamed-variant VMEM gate (ADVICE round-1 item 1): scratch
    estimate shrinks vspan when over budget and disables the streamed
    path entirely when even vspan=128 exceeds it."""
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models import fused_sweep as fs
    from ldagroupedgibbssampler_tpu.models.adlda import ADLDA
    from ldagroupedgibbssampler_tpu.models.pcgs import (
        LDAPartiallyCollapsedGibbsSampler)
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
        fused_pcgs_streamed_vmem_bytes)

    # estimator monotonic in K and vspan
    assert fused_pcgs_streamed_vmem_bytes(1000, 128, 128, 4096) < \
        fused_pcgs_streamed_vmem_bytes(4096, 128, 128, 4096)
    assert fused_pcgs_streamed_vmem_bytes(1000, 128, 128, 4096) < \
        fused_pcgs_streamed_vmem_bytes(1000, 512, 128, 4096)
    # collapsed live-count mode needs NO word-table stream (the N_kw rmw
    # window doubles as the table): cheaper than the bf16 phi stream in
    # the untiled regime (3 slots); at tiled K (nbuf=2) the saved phi
    # slots exactly equal the live-n_k scratch it adds, so tie allowed
    assert fused_pcgs_streamed_vmem_bytes(1000, 128, 128, 4096,
                                          collapsed=True) < \
        fused_pcgs_streamed_vmem_bytes(1000, 128, 128, 4096)
    assert fused_pcgs_streamed_vmem_bytes(4096, 128, 128, 4096,
                                          collapsed=True) <= \
        fused_pcgs_streamed_vmem_bytes(4096, 128, 128, 4096)
    # MH double word table in between
    assert fused_pcgs_streamed_vmem_bytes(4096, 128, 128, 4096,
                                          num_word_tables=2) > \
        fused_pcgs_streamed_vmem_bytes(4096, 128, 128, 4096)

    # PCGS at K=1000 with an oversized configured vspan shrinks to fit
    m = LDAPartiallyCollapsedGibbsSampler(
        LDAConfig(scheme="pcgs", topics=1000, vocab_span=1024))
    v = m._streamed_vspan()
    assert 128 <= v < 1024
    assert fused_pcgs_streamed_vmem_bytes(
        1000, v, 128, m.config.token_block) <= fs._STREAMED_VMEM_BUDGET

    # K=4096 PCGS-family streamed configs are fused-eligible via the
    # K-TILED chunk body (round 3, second half): the untiled kernels'
    # K-proportional scoped-VMEM temps (~7*kpad*128*4 B) compile-OOM'd
    # at kpad=4096 (scoped 26.25M vs the 16M limit), but at
    # kpad >= KTILE_MIN the kernels stage probs through a [kpad, 128]
    # bf16 scratch, bound every other temp at one 128-row K-tile, and
    # run 2 window slots — measured fused on-chip at 3.51M (spalias) /
    # 2.70M (ADLDA) tokens/s, BENCH_MATRIX rows 7d/8d.
    ma = ADLDA(LDAConfig(scheme="adlda", topics=4096))
    assert ma._streamed_vspan() >= 128
    assert ma._streamed_block() <= 1024  # compile-size cap at tiled K
    mp = LDAPartiallyCollapsedGibbsSampler(
        LDAConfig(scheme="pcgs", topics=4096))
    assert mp._streamed_vspan() >= 128
    # K=1000 remains fused-eligible for every family (untiled body,
    # full token_block)
    m1k = LDAPartiallyCollapsedGibbsSampler(
        LDAConfig(scheme="pcgs", topics=1000))
    assert m1k._streamed_vspan() >= 128
    assert m1k._streamed_block() == m1k.config.token_block
    assert ADLDA(
        LDAConfig(scheme="adlda", topics=1000))._streamed_vspan() >= 128
    # the MH kernel has no tiled body: K=4096 lightpclda stays gate-OFF
    from ldagroupedgibbssampler_tpu.models.lightlda import LightPCLDA
    assert LightPCLDA(
        LDAConfig(scheme="lightpclda", topics=4096))._streamed_vspan() == 0
    # ... and keeps the full token block at large K (the 1024 cap exists
    # only for the K-tiled PCGS/ADLDA bodies; ADVICE round-3 item 3)
    mmh = LightPCLDA(LDAConfig(scheme="lightpclda", topics=4096))
    assert mmh._streamed_block() == mmh.config.token_block


def test_resident_streamed_decision_pinned():
    """Regression pin of the resident/streamed gate decision for the
    measured BENCH_MATRIX rows (ADVICE round-3 item 2): the resident
    gate reuses the streamed kernels' 7*kpad*128*4 temp calibration as a
    conservative bound, and this test catches any recalibration that
    silently flips a measured-resident config to the streamed path (a
    semantically equivalent but perf-relevant change)."""
    from ldagroupedgibbssampler_tpu.models import fused_sweep as fs
    from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
        fused_pcgs_vmem_bytes)

    bench_docs = 11269  # the 20NG-scale bench corpus (bench.py)
    # K=100 rows (2/6/8/...) were measured on the RESIDENT path
    assert fused_pcgs_vmem_bytes(bench_docs, 100, 128) \
        <= fs._FUSED_PCGS_VMEM_BUDGET
    assert fused_pcgs_vmem_bytes(bench_docs, 100, 128, collapsed=True) \
        <= fs._FUSED_PCGS_VMEM_BUDGET
    # K=1000 rows (5/7/...) were measured on the STREAMED path
    assert fused_pcgs_vmem_bytes(bench_docs, 1000, 128) \
        > fs._FUSED_PCGS_VMEM_BUDGET
    # the tiny test corpora used by the interpret-mode suites stay
    # resident (table + temps far under budget)
    assert fused_pcgs_vmem_bytes(30, 6, 128) <= fs._FUSED_PCGS_VMEM_BUDGET
