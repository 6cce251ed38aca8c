"""Multi-device tests the reference never had (SURVEY.md §4 implication):
sharded GGS on an 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.config import LDAConfig
from ldagroupedgibbssampler_tpu.parallel.mesh import make_mesh
from ldagroupedgibbssampler_tpu.parallel.sharded_ggs import (
    ShardedGGS, partition_documents)


def _cfg(**kw):
    defaults = dict(scheme="ggs", topics=3, alpha=1.0, beta=0.01, seed=7,
                    exec_time=-1, topic_interval=10, token_block=128,
                    paranoid=True)
    defaults.update(kw)
    return LDAConfig(**defaults)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh((8,), ("data",))


def test_partition_documents_balanced(synthetic_corpus):
    bounds = partition_documents(synthetic_corpus, 8)
    assert bounds[0] == 0 and bounds[-1] == synthetic_corpus.num_docs
    assert all(bounds[i] <= bounds[i + 1] for i in range(8))


def test_sharded_ggs_runs(mesh8, synthetic_corpus):
    model = ShardedGGS(_cfg(), mesh=mesh8)
    model.add_instances(synthetic_corpus)
    model.sample(20)
    st = model.state
    assert int(np.asarray(st.nkw).sum()) == synthetic_corpus.num_tokens
    assert int(np.asarray(st.ndk).sum()) == synthetic_corpus.num_tokens
    z = model.get_z_indicators()
    assert z.shape == (synthetic_corpus.num_tokens,)
    ndk = model.get_document_topic_matrix()
    np.testing.assert_array_equal(
        ndk.sum(axis=1), synthetic_corpus.doc_lengths())


def test_sharded_ggs_learns_planted_topics(mesh8, synthetic_corpus):
    model = ShardedGGS(_cfg(), mesh=mesh8)
    model.add_instances(synthetic_corpus)
    model.sample(60)
    nkw = model.get_topic_type_counts()
    blocks = nkw.reshape(3, 3, 10).sum(axis=2)
    purity = blocks.max(axis=1) / np.maximum(blocks.sum(axis=1), 1)
    assert purity.mean() > 0.7, purity


@pytest.mark.slow
def test_sharded_vs_single_chip_statistics(mesh8, synthetic_corpus):
    """1-chip vs 8-chip GGS agree in distribution: final LLs within a
    tolerant band (they are different chains — same stationary dist)."""
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler

    single = LDAGroupedGibbsSampler(_cfg())
    single.add_instances(synthetic_corpus)
    single.sample(50)
    sharded = ShardedGGS(_cfg(), mesh=mesh8)
    sharded.add_instances(synthetic_corpus)
    sharded.sample(50)
    ll1 = float(model_log_likelihood(single.get_document_topic_matrix(),
                                     single.get_topic_type_counts(),
                                     single.state.alpha, 0.01))
    ll8 = float(model_log_likelihood(sharded.get_document_topic_matrix(),
                                     sharded.get_topic_type_counts(),
                                     sharded.state.alpha, 0.01))
    # both should be in the converged band; allow 5% relative slack
    assert abs(ll1 - ll8) / abs(ll1) < 0.05, (ll1, ll8)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(len(jax.devices()))


def test_sharded_adlda_runs_and_conserves(mesh8, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.parallel.sharded_adlda import ShardedADLDA
    cfg = LDAConfig(scheme="adlda", topics=3, alpha=0.5, beta=0.01, seed=9,
                    exec_time=-1)
    m = ShardedADLDA(cfg, mesh=mesh8)
    m.add_instances(synthetic_corpus)
    m.sample(15)
    nkw = m.get_topic_type_counts()
    assert nkw.sum() == synthetic_corpus.num_tokens
    ndk = m.get_document_topic_matrix()
    assert ndk.sum() == synthetic_corpus.num_tokens
    # learns the planted 3-block structure
    import numpy as np
    from ldagroupedgibbssampler_tpu.evaluation.topwords import top_words
    top = top_words(nkw, synthetic_corpus.vocab, 5)
    pure = sum(1 for ws in top if len({w.split("_")[0] for w in ws}) == 1)
    assert pure >= 2, top


# ----------------------------------------------------------------------
# VocabShardedGGS: the fused-kernel multi-chip composition (vocab windows
# sharded; ndk psum + nkw placement psum are the only collectives).
# ----------------------------------------------------------------------
def _vcfg(**kw):
    defaults = dict(scheme="ggs", topics=3, alpha=1.0, beta=0.01, seed=7,
                    exec_time=-1, token_block=256, vocab_span=4, doc_span=16)
    defaults.update(kw)
    return LDAConfig(**defaults)


def test_partition_windows_balanced():
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        partition_windows)
    tf = np.array([100, 5, 5, 3, 2, 2, 1, 1, 1, 1, 1, 1] + [1] * 20)
    bounds = partition_windows(tf, 4, 4)
    assert bounds[0] == 0 and bounds[-1] == -(-len(tf) // 4)
    assert all(bounds[i] < bounds[i + 1] for i in range(4))


def test_vocab_sharded_ggs_conserves_and_learns(mesh8, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        VocabShardedGGS)
    model = VocabShardedGGS(_vcfg(), mesh=mesh8)
    model.add_instances(synthetic_corpus)
    model.sample(60)
    st = model.state
    n = synthetic_corpus.num_tokens
    assert int(np.asarray(st.nkw).sum()) == n
    assert int(np.asarray(st.ndk).sum()) == n
    # nkw/ndk must equal histograms of the z indicators
    z = model.get_z_indicators()
    w = synthetic_corpus.tokens
    d = synthetic_corpus.token_doc_ids()
    ref_nkw = np.zeros((synthetic_corpus.num_types, 3), np.int64)
    np.add.at(ref_nkw, (w, z), 1)
    np.testing.assert_array_equal(np.asarray(st.nkw), ref_nkw)
    ref_ndk = np.zeros((synthetic_corpus.num_docs, 3), np.int64)
    np.add.at(ref_ndk, (d, z), 1)
    np.testing.assert_array_equal(np.asarray(st.ndk), ref_ndk)
    # learns the planted 3-block structure
    nkw_kv = np.asarray(st.nkw).T
    blocks = nkw_kv.reshape(3, 3, 10).sum(axis=2)
    purity = blocks.max(axis=1) / np.maximum(blocks.sum(axis=1), 1)
    assert purity.mean() > 0.7, purity


@pytest.mark.slow
def test_vocab_sharded_vs_single_chip_statistics(mesh8, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        VocabShardedGGS)

    single = LDAGroupedGibbsSampler(_vcfg())
    single.add_instances(synthetic_corpus)
    single.sample(50)
    sharded = VocabShardedGGS(_vcfg(), mesh=mesh8)
    sharded.add_instances(synthetic_corpus)
    sharded.sample(50)
    ll1 = float(model_log_likelihood(single.get_document_topic_matrix(),
                                     single.get_topic_type_counts(),
                                     single.state.alpha, 0.01))
    ll8 = float(model_log_likelihood(sharded.get_document_topic_matrix(),
                                     sharded.get_topic_type_counts(),
                                     sharded.state.alpha, 0.01))
    assert abs(ll1 - ll8) / abs(ll1) < 0.05, (ll1, ll8)


def test_vocab_sharded_z_roundtrip(mesh8, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        VocabShardedGGS)
    model = VocabShardedGGS(_vcfg(), mesh=mesh8)
    model.add_instances(synthetic_corpus)
    z0 = np.asarray(
        np.arange(synthetic_corpus.num_tokens) % 3, np.int32)
    model.set_z_indicators(z0)
    np.testing.assert_array_equal(model.get_z_indicators(), z0)
    w = synthetic_corpus.tokens
    ref = np.zeros((synthetic_corpus.num_types, 3), np.int64)
    np.add.at(ref, (w, z0), 1)
    np.testing.assert_array_equal(np.asarray(model.state.nkw), ref)


def test_sharded_schemes_in_registry(mesh8, synthetic_corpus):
    """Multi-chip samplers are reachable through the scheme registry
    (config-driven, like ParallelLDA.createModel's scheme strings)."""
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    cfg = _vcfg(scheme="vocab_sharded_ggs", mesh_shape=(8,))
    m = create_model(cfg)
    m.add_instances(synthetic_corpus)
    m.sample(3)
    assert int(np.asarray(m.state.nkw).sum()) == synthetic_corpus.num_tokens
    with pytest.raises(ValueError, match="Invalid model type"):
        create_model(_vcfg(scheme="bogus"))


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_vocab_sharded_determinism(mesh8, synthetic_corpus):
    """Fixed-key determinism holds across runs of the multi-chip sampler
    (the sharded analogue of TestBetweenProcessInitialization.java:23)."""
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        VocabShardedGGS)
    outs = []
    for _ in range(2):
        m = VocabShardedGGS(_vcfg(), mesh=mesh8)
        m.add_instances(synthetic_corpus)
        m.sample(5)
        outs.append((m.get_z_indicators(), np.asarray(m.state.phi)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)


def test_sharded_pcgs_runs_conserves_and_agrees(mesh8, synthetic_corpus):
    """Sharded PCGS: count conservation, planted-topic recovery, and
    LL agreement with the single-chip PCGS chain (exact decomposition:
    documents are conditionally independent given phi)."""
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    from ldagroupedgibbssampler_tpu.models.pcgs import (
        LDAPartiallyCollapsedGibbsSampler)
    from ldagroupedgibbssampler_tpu.parallel.sharded_pcgs import ShardedPCGS

    cfg = LDAConfig(scheme="pcgs", topics=3, alpha=1.0, beta=0.01, seed=7,
                    exec_time=-1)
    m = ShardedPCGS(cfg, mesh=mesh8)
    m.add_instances(synthetic_corpus)
    m.sample(50)
    nkw = m.get_topic_type_counts()
    assert nkw.sum() == synthetic_corpus.num_tokens
    ndk = m.get_document_topic_matrix()
    assert ndk.sum() == synthetic_corpus.num_tokens
    np.testing.assert_array_equal(
        ndk.sum(axis=1), synthetic_corpus.doc_lengths())
    blocks = nkw.reshape(3, 3, 10).sum(axis=2)
    purity = blocks.max(axis=1) / np.maximum(blocks.sum(axis=1), 1)
    assert purity.mean() > 0.7, purity

    single = LDAPartiallyCollapsedGibbsSampler(cfg)
    single.add_instances(synthetic_corpus)
    single.sample(50)
    ll1 = float(model_log_likelihood(single.get_document_topic_matrix(),
                                     single.get_topic_type_counts(),
                                     single.state.alpha, 0.01))
    ll8 = float(model_log_likelihood(ndk, nkw, m.state.alpha, 0.01))
    assert abs(ll1 - ll8) / abs(ll1) < 0.05, (ll1, ll8)


def test_sharded_pcgs_in_registry(mesh8, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    cfg = LDAConfig(scheme="sharded_pcgs", topics=3, alpha=1.0, beta=0.01,
                    seed=7, exec_time=-1, mesh_shape=(8,))
    m = create_model(cfg)
    m.add_instances(synthetic_corpus)
    m.sample(3)
    assert int(np.asarray(m.state.nkw).sum()) == synthetic_corpus.num_tokens


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_interleave_permutation_balances_zipf(mesh8):
    """Zipf-headed vocabularies defeat contiguous-window balancing (the
    head lands in window 0); the frequency-interleaved relabeling deals
    ranks round-robin so shard token masses even out (measured 4.1x
    max/mean before on PubMed stats, benchmarks/pubmed_rehearsal.py)."""
    from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        VocabShardedGGS, interleave_permutation)

    rng = np.random.default_rng(3)
    v, d = 512, 200
    ranks = np.arange(1, v + 1)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()
    docs = [list(rng.choice(v, size=60, p=probs)) for _ in range(d)]
    corpus = Corpus.from_token_lists(docs, [f"w{i}" for i in range(v)])

    perm, inv = interleave_permutation(corpus.type_frequencies(), 4)
    assert sorted(perm) == list(range(v))      # bijection
    np.testing.assert_array_equal(inv[perm], np.arange(v))

    model = VocabShardedGGS(_vcfg(vocab_span=4), mesh=mesh8)
    model.add_instances(corpus)
    toks = model.shard_token_counts
    mean = sum(toks) / len(toks)
    imb = max(toks) / mean
    # a single type cannot be split across shards, so the achievable bound
    # is the head type's mass; interleaving must get within 15% of it...
    tf = corpus.type_frequencies()
    head_bound = max(1.0, tf.max() / mean)
    assert imb <= head_bound * 1.15 + 0.05, (imb, head_bound, toks)
    # ...and beat the contiguous-id partition (Zipf head all in window 0)
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        partition_windows)
    wb = partition_windows(tf, 4, 8)
    per_win = np.zeros(128, np.int64)
    np.add.at(per_win, np.arange(v) // 4, tf)
    contig = max(per_win[wb[s]:wb[s + 1]].sum() for s in range(8)) / mean
    assert imb < contig, (imb, contig)
    # counts still come back in ORIGINAL type ids
    model.sample(2)
    z = model.get_z_indicators()
    ref = np.zeros((v, 3), np.int64)
    np.add.at(ref, (corpus.tokens, z), 1)
    np.testing.assert_array_equal(np.asarray(model.state.nkw), ref)


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_vocab_sharded_ndk_i16_guard(mesh8, synthetic_corpus):
    """The int16 n_dk psum engages only when every doc is shorter than
    int16 max (per-shard partials and their sum are bounded by doc
    length); a pathological long doc falls back to int32 and both paths
    conserve counts."""
    from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
    from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs import (
        VocabShardedGGS)
    m = VocabShardedGGS(_vcfg(), mesh=mesh8)
    m.add_instances(synthetic_corpus)
    assert m._ndk_i16
    m.sample(3)
    assert int(np.asarray(m.state.ndk).sum()) == synthetic_corpus.num_tokens

    rng = np.random.default_rng(0)
    toks = [list(rng.integers(0, 30, 2 ** 15))] + [
        list(rng.integers(0, 30, 20)) for _ in range(7)]
    long_c = Corpus.from_token_lists(toks, [f"w{i}" for i in range(30)])
    m2 = VocabShardedGGS(_vcfg(), mesh=mesh8)
    m2.add_instances(long_c)
    assert not m2._ndk_i16
    m2.sample(3)
    assert int(np.asarray(m2.state.ndk).sum()) == long_c.num_tokens
