"""Corpus-layer and config-layer tests (ConfigTest.java:1-186,
TestPerplexityDatasetBuilder, tokenizer/pruning behaviour)."""

import os
import textwrap

import numpy as np

from ldagroupedgibbssampler_tpu.config.ini import parse_ini
from ldagroupedgibbssampler_tpu.corpus import (build_corpus, load_dataset,
                                               read_uci_file)
from ldagroupedgibbssampler_tpu.corpus.perplexity import (
    build_perplexity_split, cross_validation_folds)
from ldagroupedgibbssampler_tpu.corpus.pipeline import (keep_tfidf_top,
                                                        prune_rare)
from ldagroupedgibbssampler_tpu.corpus.tokenizer import tokenize
from ldagroupedgibbssampler_tpu.corpus.uci import RawDoc

CATS = "/root/reference/src/main/resources/datasets/cats.txt"
PLDA_CFG = "/root/reference/src/main/resources/configuration/plda-cats-test.cfg"


def test_uci_reader_cats():
    docs = read_uci_file(CATS)
    assert len(docs) == 23
    assert docs[0].doc_id == "1"
    assert docs[0].label == "X"
    assert "wild" in docs[0].text


def test_tokenizer_modes():
    text = "Hello World-2 under_score 42 a"
    assert tokenize(text) == ["hello", "world", "under", "score"]
    assert tokenize(text, mode="numeric") == ["hello", "world", "under",
                                              "score", "42"]
    assert "under_score" in tokenize(text, mode="connector")
    assert tokenize(text, stoplist=frozenset(["hello"]))[0] == "world"


def test_tokenizer_mode_matrix():
    """The 4-mode matrix against reference expectations (VERDICT item 8):
    SimpleTokenizerLarge / NumericAlsoTokenizer /
    KeepConnectorPunctuationTokenizerLarge / …NumericAlsoTokenizer
    (selection at util/LDAUtils.java:531-560)."""
    from ldagroupedgibbssampler_tpu.corpus.tokenizer import tokenizer_mode
    assert tokenizer_mode(False, False) == "simple"
    assert tokenizer_mode(True, False) == "numeric"
    assert tokenizer_mode(False, True) == "connector"
    assert tokenizer_mode(True, True) == "connector_numeric"

    text = "ip-addr x86_64 3rd a+b we~ird"
    # digits are TRANSPARENT (skipped without delimiting) outside numeric
    # modes — the silent else branch, SimpleTokenizerLarge.java:111-115;
    # '-' (DASH_PUNCTUATION) and '_' (outside connector modes) delimit;
    # math symbols (+ ~) are transparent.
    assert tokenize(text) == ["ip", "addr", "rd", "ab", "weird"]
    assert tokenize(text, mode="numeric") == \
        ["ip", "addr", "x86", "64", "3rd", "ab", "weird"]
    # connector: '_' joins, '-' still delimits, digits transparent
    assert tokenize(text, mode="connector") == \
        ["ip", "addr", "x_", "rd", "ab", "weird"]
    # composed mode keeps digits AND '_' (the round-1 gap: the two flags
    # were mutually exclusive)
    assert tokenize(text, mode="connector_numeric") == \
        ["ip", "addr", "x86_64", "3rd", "ab", "weird"]


def test_tokenizer_unicode_categories():
    """Non-ASCII letters (Ll/Lo) are token chars; Pc beyond '_' joins in
    connector mode (undertie U+203F is CONNECTOR_PUNCTUATION)."""
    assert tokenize("café naïve") == ["café", "naïve"]
    assert tokenize("a‿b c", mode="connector") == ["a‿b"]
    assert tokenize("a‿b cd", mode="simple") == ["cd"]


def test_predicate_filter_pipe():
    """TokenSequencePredicateMatcher equivalent
    (pipe/TokenSequencePredicateMatcher.java:22-34)."""
    from ldagroupedgibbssampler_tpu.corpus.tokenizer import predicate_filter
    docs = [["alpha", "beta", "gamma"], ["beta", "delta"]]
    out = predicate_filter(docs, lambda t: t.startswith("b") or t == "delta")
    assert out == [["beta"], ["beta", "delta"]]


def test_prune_rare_and_tfidf():
    docs = [["a", "a", "a", "b"], ["a", "b", "c"], ["a", "d"]]
    assert prune_rare(docs, 2) == {"a", "b"}
    kept = keep_tfidf_top(docs, 2)
    assert len(kept) == 2
    assert "a" not in kept  # appears in every doc -> idf 0


def test_build_corpus_roundtrip():
    raw = [RawDoc("1", "X", "apple banana apple"),
           RawDoc("2", "Y", "banana cherry")]
    c = build_corpus(raw, rare_threshold=0)
    assert c.num_docs == 2
    assert c.num_types == 3
    assert c.num_tokens == 5
    np.testing.assert_array_equal(c.doc_lengths(), [3, 2])
    w_pad, mask = c.to_padded(4)
    assert w_pad.shape[1] % 4 == 0
    assert mask.sum() == 5


def test_load_dataset_cats_counts():
    c = load_dataset(CATS, rare_threshold=0)
    assert c.num_docs == 23
    assert c.num_tokens > 5000
    # rare pruning shrinks vocabulary
    c_pruned = load_dataset(CATS, rare_threshold=10)
    assert c_pruned.num_types < c.num_types


def test_perplexity_split(synthetic_corpus):
    train, est, evl = build_perplexity_split(synthetic_corpus, 0.2, seed=1)
    assert train.num_docs + est.num_docs == synthetic_corpus.num_docs
    assert est.num_docs == evl.num_docs
    # halves partition each test doc
    for d in range(est.num_docs):
        le = est.doc_lengths()[d]
        lv = evl.doc_lengths()[d]
        assert abs(int(le) - int(lv)) <= 1


def test_cross_validation_folds():
    folds = cross_validation_folds(100, 5, seed=3)
    assert len(folds) == 5
    all_test = np.concatenate([t for _tr, t in folds])
    assert sorted(all_test) == list(range(100))


def test_parse_reference_cfg():
    """Parse the reference's canonical GGS-paper config
    (plda-cats-test.cfg) end-to-end."""
    parsed = parse_ini(PLDA_CFG)
    assert parsed.sub_config_names() == ["adlda", "cgs", "pcgs", "pcgs-old",
                                         "ggs"]
    cfg = parsed.activate("ggs")
    assert cfg.scheme == "ggs"
    assert cfg.topics == 3
    assert cfg.alpha == 5.0
    assert cfg.beta == 7.0
    assert cfg.iterations == 200
    assert cfg.seed == 2019
    assert cfg.exec_time == 1800
    assert cfg.keep_numbers is True
    assert cfg.symmetric_alpha is True
    assert cfg.hyperparam_optim_interval == -1
    assert cfg.topic_interval == 1
    cgs = parsed.activate("cgs")
    assert cgs.scheme == "collapsed"
    old = parsed.activate("pcgs-old")
    assert old.scheme == "uncollapsed"


def test_subconfig_shadowing_and_overrides(tmp_path):
    cfg_text = textwrap.dedent("""\
        configs = a, b
        topics = 10
        alpha = 1.0 # trailing comment
        [a]
        topics = 20
        [b]
        scheme = pcgs
    """)
    p = tmp_path / "t.cfg"
    p.write_text(cfg_text)
    parsed = parse_ini(str(p))
    a = parsed.activate("a")
    assert a.topics == 20 and a.alpha == 1.0
    b = parsed.activate("b", overrides={"topics": "99"})
    assert b.topics == 99 and b.scheme == "pcgs"


def test_classname_mapping(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text(
        "configs = a\n[a]\n"
        "batch_building_scheme = utils.randomscan.document."
        "PercentageBatchBuilder\n"
        "topic_index_building_scheme = utils.randomscan.topic."
        "DeltaNTopicIndexBuilder\n")
    cfg = parse_ini(str(p)).activate("a")
    assert cfg.batch_building_scheme == "percentage"
    assert cfg.topic_index_building_scheme == "delta_n"


class TestTopicBatchBuilders:
    def test_even_split_selects_all(self):
        from ldagroupedgibbssampler_tpu.config import LDAConfig
        from ldagroupedgibbssampler_tpu.models import randomscan
        cfg = LDAConfig(topics=8, seed=3)
        b = randomscan.make_topic_batch_builder(cfg)
        assert b.topic_mask(1).all()

    def test_percentage_selects_fraction(self):
        from ldagroupedgibbssampler_tpu.config import LDAConfig
        from ldagroupedgibbssampler_tpu.models import randomscan
        cfg = LDAConfig(topics=10, seed=3,
                        topic_batch_building_scheme="percentage",
                        percentage_split_size_topic=0.3)
        b = randomscan.make_topic_batch_builder(cfg)
        m1, m2 = b.topic_mask(1), b.topic_mask(2)
        assert m1.sum() == 3 and m2.sum() == 3
        assert m1.shape == (10,)

    def test_percentage_rows_kept_in_sampler(self, synthetic_corpus):
        """Unselected phi rows must keep their previous values across an
        iteration (exact conditional, rows independent given counts)."""
        import numpy as np

        from ldagroupedgibbssampler_tpu.config import LDAConfig
        from ldagroupedgibbssampler_tpu.models.ggs import (
            LDAGroupedGibbsSampler)
        cfg = LDAConfig(scheme="ggs", topics=6, alpha=0.5, beta=0.01,
                        seed=5, exec_time=-1,
                        topic_batch_building_scheme="percentage",
                        percentage_split_size_topic=0.34)
        m = LDAGroupedGibbsSampler(cfg)
        m.add_instances(synthetic_corpus)
        phi0 = m.get_phi()
        m.sample(1)
        phi1 = m.get_phi()
        unchanged = np.all(np.isclose(phi0, phi1, atol=0), axis=1)
        assert unchanged.sum() == 3          # ceil(0.34*6)=3 redrawn, 3 kept

    def test_meta_topic_index_builder_round_robin(self, synthetic_corpus):
        from ldagroupedgibbssampler_tpu.config import LDAConfig
        from ldagroupedgibbssampler_tpu.models import randomscan
        cfg = LDAConfig(topics=4, seed=3,
                        topic_index_building_scheme="meta",
                        sub_topic_index_builders=("all", "mandelbrot"),
                        percent_top_tokens=0.1, full_phi_period=-1)
        b = randomscan.make_topic_index_builder(cfg, synthetic_corpus)
        m1 = b.type_mask(1)
        m2 = b.type_mask(2)
        assert m1.all()                      # "all" builder first
        assert 0 < m2.sum() < len(m2)        # then mandelbrot top-10%


class TestIntervalDumps:
    def test_diagnostic_interval_snapshots(self, tmp_path, synthetic_corpus):
        """Binary phi/N/M snapshots + z CSV written inside the
        diagnostic_interval window (UncollapsedParallelLDA.java:829-833)."""
        import glob
        import os

        from ldagroupedgibbssampler_tpu.config import LDAConfig
        from ldagroupedgibbssampler_tpu.models.ggs import (
            LDAGroupedGibbsSampler)
        from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger
        from ldagroupedgibbssampler_tpu.utils.matrix_io import (
            read_binary_double_matrix)
        cfg = LDAConfig(scheme="ggs", topics=3, alpha=0.5, beta=0.01,
                        seed=4, exec_time=-1,
                        diagnostic_interval=(3, 4),
                        dn_diagnostic_interval=(2, 5))
        logger = RunLogger(str(tmp_path / "run"))
        m = LDAGroupedGibbsSampler(cfg, logger=logger)
        m.add_instances(synthetic_corpus)
        m.sample(6)
        phis = sorted(glob.glob(str(tmp_path / "run" / "phi_*.BINARY")))
        assert len(phis) == 2      # iterations 3 and 4
        V = synthetic_corpus.num_types
        phi = read_binary_double_matrix(phis[0], 3, V)
        import numpy as np
        np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-4)
        assert glob.glob(str(tmp_path / "run" / "N_*.BINARY"))
        assert glob.glob(str(tmp_path / "run" / "M_*.BINARY"))
        assert os.path.exists(tmp_path / "run" / "z_3.csv")
        with open(tmp_path / "run" / "delta_n.txt") as f:
            rows = [l.split("\t") for l in f]
        assert [int(r[0]) for r in rows] == [2, 3, 4, 5]
        assert all(int(r[1]) > 0 for r in rows)


def test_example_configs_parse_and_resolve():
    """examples/*.cfg stay parseable and every subconfig resolves to a
    registered scheme (the configs are documentation; this pins them to
    the key surface)."""
    import glob as _glob
    from ldagroupedgibbssampler_tpu.config.ini import parse_ini
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = sorted(_glob.glob(os.path.join(root, "examples", "*.cfg")))
    assert len(cfgs) >= 3
    for path in cfgs:
        pc = parse_ini(path)
        assert pc.sub_config_names()
        for name in pc.sub_config_names():
            cfg = pc.activate(name)
            create_model(cfg)  # raises on unknown scheme
