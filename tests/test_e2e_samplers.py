"""End-to-end sampler smoke tests on the bundled cats corpus and a
planted-topic synthetic corpus — the TPU analogue of SmokeTest.java:17-74 and
the integration style of §4.4 (SURVEY.md)."""

import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.config import LDAConfig
from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
    model_log_likelihood)
from ldagroupedgibbssampler_tpu.models.registry import create_model

CORE_SCHEMES = ["ggs", "pcgs", "uncollapsed", "collapsed", "adlda",
                "spalias", "efficient_uncollapsed"]
EXTENDED_SCHEMES = ["ggs_test", "polyaurn", "nzvsspalias", "lightpclda",
                    "lightpcldaw2", "lightcollapsed", "ppu_hdplda",
                    "ppu_hlda", "ppu_hdplda_all_topics", "spalias_priors",
                    "ggs_aliasmh"]


def _run(scheme, corpus, iterations=30, topics=3, **kw):
    cfg = LDAConfig(scheme=scheme, topics=topics, alpha=1.0, beta=0.01,
                    iterations=iterations, seed=7, exec_time=-1,
                    topic_interval=iterations, token_block=512,
                    paranoid=True, **kw)
    model = create_model(cfg)
    model.add_instances(corpus)
    model.sample(iterations)
    return model


@pytest.mark.parametrize("scheme", CORE_SCHEMES)
def test_scheme_runs_and_counts_consistent(scheme, cats_corpus):
    model = _run(scheme, cats_corpus, iterations=10)
    st = model.state
    assert int(np.asarray(st.nkw).sum()) == cats_corpus.num_tokens
    assert int(np.asarray(st.ndk).sum()) == cats_corpus.num_tokens
    z = model.get_z_indicators()
    assert z.shape == (cats_corpus.num_tokens,)
    assert z.min() >= 0 and z.max() < 3
    phi = model.get_phi()
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-4)


@pytest.mark.parametrize("scheme", EXTENDED_SCHEMES)
def test_extended_scheme_runs(scheme, synthetic_corpus):
    """All 18 registry schemes run and keep count invariants
    (createModel parity, tui/ParallelLDA.java:401-490)."""
    model = _run(scheme, synthetic_corpus, iterations=8)
    st = model.state
    assert int(np.asarray(st.nkw).sum()) == synthetic_corpus.num_tokens
    z = model.get_z_indicators()
    assert z.min() >= 0 and z.max() < 3


@pytest.mark.parametrize("scheme", ["lightpclda", "lightcollapsed",
                                    "polyaurn"])
def test_extended_schemes_learn(scheme, synthetic_corpus):
    """MH and sparse-phi samplers also recover the planted structure."""
    model = _run(scheme, synthetic_corpus, iterations=60)
    nkw = model.get_topic_type_counts()
    blocks = nkw.reshape(3, 3, 10).sum(axis=2)
    purity = blocks.max(axis=1) / np.maximum(blocks.sum(axis=1), 1)
    assert purity.mean() > 0.6, (scheme, purity)


def test_aliasmh_packed_unpacked_identical(synthetic_corpus):
    """ggs_aliasmh's two table layouts (packed [.,2] f32 rows vs direct
    gathers from state arrays) are the same chain bit-for-bit: the
    unpacked path exists purely to drop the 8*(VK+DK)-byte packed
    tables at large D*K (advisor round-4)."""
    zs = []
    for mode in ("packed", "unpacked"):
        m = _run("ggs_aliasmh", synthetic_corpus, iterations=5,
                 aliasmh_packed=mode)
        zs.append(m.get_z_indicators())
    np.testing.assert_array_equal(zs[0], zs[1])


def test_aliasmh_canonical_counts_equal_blocked(synthetic_corpus):
    """The canonical-token scatter rebuild used in the scheme's home
    regime (kpad > 4096 on TPU — the blocked path's XLA-fallback zone,
    where the 2.2x block padding makes padded scatter 2.2x the cost)
    must equal the blocked windowed rebuild exactly. This pins the
    slot<->canonical index plumbing (_mh_slot_of_can / _mh_w / _mh_d)
    the branch relies on; the branch itself was equality-verified
    on-chip at 20NG K=8192 (round 5, PERF.md negative-result note)."""
    import jax.numpy as jnp

    m = _run("ggs_aliasmh", synthetic_corpus, iterations=3)
    z = m.state.z
    z_can = z[m._mh_slot_of_can]
    K = m.config.topics
    nkw_can = np.asarray(jnp.zeros((m.corpus.num_types, K), jnp.int32)
                         .at[m._mh_w, z_can].add(1))
    ndk_can = np.asarray(jnp.zeros((m.corpus.num_docs, K), jnp.int32)
                         .at[m._mh_d, z_can].add(1))
    np.testing.assert_array_equal(nkw_can, np.asarray(m._count_nkw(z)))
    np.testing.assert_array_equal(ndk_can, np.asarray(m._count_ndk(z)))


def test_hdp_activates_topics(synthetic_corpus):
    """HDP grows from hdp_start_topics toward the 3 planted topics."""
    cfg = LDAConfig(scheme="ppu_hdplda_all_topics", topics=10, alpha=1.0,
                    beta=0.01, iterations=40, seed=5, exec_time=-1,
                    topic_interval=40, hdp_start_topics=1, hdp_gamma=1.0)
    from ldagroupedgibbssampler_tpu.models.registry import create_model as cm
    model = cm(cfg)
    model.add_instances(synthetic_corpus)
    model.sample(40)
    hist = model.get_active_topic_history()
    assert hist[0] >= 1
    assert hist[-1] >= 3, hist[-5:]
    assert hist[-1] <= 10


@pytest.mark.parametrize("scheme", ["ggs", "pcgs", "collapsed", "adlda"])
def test_likelihood_improves(scheme, synthetic_corpus):
    model = _run(scheme, synthetic_corpus, iterations=40)
    lls = [ll for _it, ll in model.get_log_likelihoods()]
    st = model.state
    ll_final = float(model_log_likelihood(st.ndk, st.nkw, st.alpha,
                                          float(st.beta)))
    # vs. the expected LL of a uniform-random z assignment
    rng = np.random.default_rng(0)
    z0 = rng.integers(0, 3, synthetic_corpus.num_tokens)
    doc_ids = synthetic_corpus.token_doc_ids()
    ndk0 = np.zeros((synthetic_corpus.num_docs, 3), np.int32)
    np.add.at(ndk0, (doc_ids, z0), 1)
    nkw0 = np.zeros((3, synthetic_corpus.num_types), np.int32)
    np.add.at(nkw0, (z0, synthetic_corpus.tokens), 1)
    ll_random = float(model_log_likelihood(ndk0, nkw0, model.state.alpha,
                                           float(model.state.beta)))
    assert ll_final > ll_random + 100, (scheme, ll_final, ll_random)


@pytest.mark.parametrize("scheme", ["ggs", "pcgs", "adlda", "collapsed"])
def test_recovers_planted_topics(scheme, synthetic_corpus):
    """Binomial-test analogue of SmokeTest.java:46-74: each planted topic's
    vocabulary block should dominate one learned topic."""
    model = _run(scheme, synthetic_corpus, iterations=60)
    nkw = model.get_topic_type_counts()  # [3, 30]
    # fraction of each learned topic's mass on its best vocab block
    blocks = nkw.reshape(3, 3, 10).sum(axis=2)  # [learned, planted]
    purity = blocks.max(axis=1) / np.maximum(blocks.sum(axis=1), 1)
    assert purity.mean() > 0.7, (scheme, purity)
    # all three planted blocks should be claimed by distinct learned topics
    assert len(set(blocks.argmax(axis=1))) == 3, blocks


def test_determinism_fixed_seed(synthetic_corpus):
    """Fixed-key determinism (the TPU analogue of
    TestBetweenProcessInitialization.java:23)."""
    m1 = _run("ggs", synthetic_corpus, iterations=5)
    m2 = _run("ggs", synthetic_corpus, iterations=5)
    np.testing.assert_array_equal(m1.get_z_indicators(),
                                  m2.get_z_indicators())
    np.testing.assert_allclose(m1.get_phi(), m2.get_phi(), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path, synthetic_corpus):
    m1 = _run("ggs", synthetic_corpus, iterations=5)
    ckpt = str(tmp_path / "state.npz")
    m1.save_checkpoint(ckpt)
    m1.sample(3)

    cfg = m1.config
    m2 = create_model(cfg)
    m2.add_instances(synthetic_corpus)
    m2.load_checkpoint(ckpt)
    m2.sample(3)
    np.testing.assert_array_equal(m1.get_z_indicators(),
                                  m2.get_z_indicators())


@pytest.mark.parametrize("scheme", ["ggs", "pcgs", "ppu_hdplda"])
def test_checkpoint_z_is_layout_portable(tmp_path, synthetic_corpus,
                                         scheme):
    """Checkpoints store z in flat canonical token order, so a checkpoint
    written under one internal layout (fused block layouts on TPU,
    w_sorted for GGS, doc-major on CPU) loads under any other."""
    m1 = _run(scheme, synthetic_corpus, iterations=4)
    ckpt = str(tmp_path / "state.npz")
    m1.save_checkpoint(ckpt)
    d = np.load(ckpt)
    assert d["z"].shape == (synthetic_corpus.num_tokens,)
    np.testing.assert_array_equal(d["z"], m1.get_z_indicators())
    m2 = create_model(m1.config)
    m2.add_instances(synthetic_corpus)
    m2.load_checkpoint(ckpt)
    np.testing.assert_array_equal(m2.get_z_indicators(),
                                  m1.get_z_indicators())
    np.testing.assert_array_equal(np.asarray(m2.state.ndk),
                                  np.asarray(m1.state.ndk))


def test_set_z_indicators_rebuilds_counts(cats_corpus):
    model = _run("pcgs", cats_corpus, iterations=3)
    z = model.get_z_indicators()
    perm = np.random.default_rng(1).integers(0, 3, z.shape)
    model.set_z_indicators(perm)
    st = model.state
    assert int(np.asarray(st.nkw).sum()) == cats_corpus.num_tokens
    np.testing.assert_array_equal(model.get_z_indicators(), perm)


def test_hdp_k_percentile_statistic(synthetic_corpus):
    """calc_k matches the reference convention and the per-iteration
    history is recorded (hdp_k_percentile)."""
    from ldagroupedgibbssampler_tpu.models.hdp import calc_k
    # 3 equal topics: top-1 share 1/3 <= 0.8, top-2 2/3 <= 0.8, top-3 1.0
    # -> first index exceeding is j=2
    assert calc_k(0.8, [100, 100, 100, 0]) == 2
    assert calc_k(0.5, [90, 5, 5]) == 0       # top topic alone covers 90%
    # degenerate no-token case: the reference's loop never exceeds the
    # percentile and falls through to ecdf.length
    assert calc_k(0.99, [0, 0]) == 2
    cfg = LDAConfig(scheme="ppu_hdplda_all_topics", topics=10, alpha=1.0,
                    beta=0.01, iterations=10, seed=5, exec_time=-1,
                    hdp_start_topics=1, hdp_gamma=1.0, hdp_k_percentile=0.8)
    from ldagroupedgibbssampler_tpu.models.registry import create_model as cm
    model = cm(cfg)
    model.add_instances(synthetic_corpus)
    model.sample(10)
    hist = model.get_k_percentile_history()
    assert len(hist) == 10
    assert all(0 <= k <= 10 for k in hist)


@pytest.mark.parametrize("scheme", ["ggs", "pcgs"])
def test_scan_chunk_fusion_bit_identical(scheme, synthetic_corpus):
    """scan_chunk>1 fuses event-free iterations into one scanned dispatch
    with BIT-IDENTICAL results to single-stepping (same _step, same masks,
    same key threading)."""
    def run(chunk):
        cfg = LDAConfig(scheme=scheme, topics=3, alpha=1.0, beta=0.05,
                        seed=13, exec_time=-1, token_block=256,
                        scan_chunk=chunk, topic_interval=-1)
        m = create_model(cfg)
        m.add_instances(synthetic_corpus)
        m.sample(7)   # 7 = 2 fused groups of 3 + 1 single tail at chunk=3
        return m.get_z_indicators(), np.asarray(m.state.phi)

    z1, phi1 = run(1)
    z3, phi3 = run(3)
    np.testing.assert_array_equal(z1, z3)
    np.testing.assert_allclose(phi1, phi3, rtol=1e-6)


def test_scan_chunk_respects_logging_events(tmp_path, synthetic_corpus):
    """Fusion never swallows a logging iteration: likelihood.txt rows match
    the unfused run exactly."""
    from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger

    def run(chunk):
        logger = RunLogger.create_run_suite(str(tmp_path), f"c{chunk}")
        cfg = LDAConfig(scheme="ggs", topics=3, alpha=1.0, beta=0.05,
                        seed=13, exec_time=-1, token_block=256,
                        scan_chunk=chunk, topic_interval=4)
        m = create_model(cfg, logger=logger)
        m.add_instances(synthetic_corpus)
        m.sample(10)
        import os
        with open(os.path.join(logger.run_dir, "likelihood.txt")) as f:
            return f.read()

    assert run(1) == run(4)
