"""Tests for the fused z-draw kernel's layout contract and fallback.

The kernel itself needs TPU hardware (Mosaic); its statistical and exact
gather-correctness validation runs on-chip via
benchmarks/tpu_kernel_checks.py (executed on the real chip; results in
PERF.md). What CAN be validated portably:

  - the layout-A doc-side metadata (d_local_a / win_d_chunks) added for the
    kernel reconstructs every token's global doc id, with sentinels on pads;
  - on non-TPU backends the GGS step must select the XLA fallback;
  - zdraw_kernel="fused" off-TPU raises, "xla" is always honoured.
"""

import numpy as np
import pytest

import jax

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler


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


def test_zdraw_kernel_xla_forced():
    corpus = _rand_corpus(2)
    model = LDAGroupedGibbsSampler(
        LDAConfig(scheme="ggs", topics=4, alpha=0.5, beta=0.1, iterations=1,
                  seed=3, exec_time=-1, zdraw_kernel="xla"))
    model.add_instances(corpus)
    assert not model._use_fused_zdraw()


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
