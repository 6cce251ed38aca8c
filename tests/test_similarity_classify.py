"""Tests for the similarity + classification layer (SURVEY.md §2.8).

Mirrors the reference's test styles: formula-level checks against plain
NumPy implementations of each metric, end-to-end planted-topic
classification (the SmokeTest.java pattern), and BM25 self-retrieval.
"""

import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.classify import (EnhancedConfusionMatrix,
                                                 KLDivergenceClassifier)
from ldagroupedgibbssampler_tpu.config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.evaluation.foldin import fold_in
from ldagroupedgibbssampler_tpu.similarity import (BM25Searcher,
                                                   CorpusStatistics,
                                                   Distance, bm25f)

LOG2 = np.log(2.0)


def _rand_probs(rng, n, k):
    x = rng.gamma(1.0, 1.0, (n, k))
    return x / x.sum(axis=1, keepdims=True)


def _np_sym_kl(p, q):
    ok = (p > 0) & (q > 0)
    d1 = np.sum(np.where(ok, p * np.log(np.where(ok, p / q, 1.0)), 0)) / LOG2
    d2 = np.sum(np.where(ok, q * np.log(np.where(ok, q / p, 1.0)), 0)) / LOG2
    return (d1 + d2) / 2


class TestDistances:
    """Each metric vs an independent NumPy implementation of the Java
    formula (similarity/*.java)."""

    rng = np.random.default_rng(0)
    X = _rand_probs(rng, 4, 8)
    Y = _rand_probs(rng, 5, 8)

    def pair_check(self, name, np_pair_fn, atol=1e-5):
        d = Distance(name)
        got = d.pairwise(self.X, self.Y)
        assert got.shape == (4, 5)
        for i in range(4):
            for j in range(5):
                assert got[i, j] == pytest.approx(
                    np_pair_fn(self.X[i].astype(np.float64),
                               self.Y[j].astype(np.float64)), abs=atol), \
                    (name, i, j)

    def test_kl(self):
        self.pair_check("kl", _np_sym_kl)

    def test_js(self):
        def js(p, q):
            a = (p + q) / 2
            return (_np_sym_kl(p, a) + _np_sym_kl(q, a)) / 2
        self.pair_check("js", js)

    def test_hellinger(self):
        self.pair_check(
            "hellinger",
            lambda p, q: np.sum((np.sqrt(p) - np.sqrt(q)) ** 2), atol=1e-4)

    def test_euclidean(self):
        self.pair_check("euclidean",
                        lambda p, q: np.sqrt(np.sum((p - q) ** 2)), atol=1e-4)

    def test_manhattan(self):
        self.pair_check("manhattan", lambda p, q: np.sum(np.abs(p - q)))

    def test_chebychev(self):
        self.pair_check("chebychev", lambda p, q: np.max(np.abs(p - q)))

    def test_canberra(self):
        self.pair_check(
            "canberra",
            lambda p, q: np.sum(np.abs(p - q) / (np.abs(p) + np.abs(q))))

    def test_cosine(self):
        self.pair_check(
            "cosine",
            lambda p, q: 1 - p @ q / np.sqrt((p @ p) * (q @ q)))

    def test_jaccard(self):
        self.pair_check(
            "jaccard",
            lambda p, q: 1 - np.sum(np.minimum(p, q)) / np.sum(
                np.maximum(p, q)))

    def test_statistical(self):
        self.pair_check(
            "statistical",
            lambda p, q: 1 - np.corrcoef(p, q)[0, 1], atol=1e-4)

    def test_t(self):
        def t_stat(p, q):
            k = len(p)
            return ((p.mean() - q.mean())
                    / np.sqrt(p.var(ddof=1) / k + q.var(ddof=1) / k))
        self.pair_check("t", t_stat, atol=1e-4)

    def test_ks(self):
        try:
            from scipy.stats import ks_2samp
        except ImportError:
            pytest.skip("scipy unavailable")
        self.pair_check(
            "ks", lambda p, q: ks_2samp(p, q).statistic, atol=1e-5)

    def test_uber_is_mean_of_components(self):
        names = ["canberra", "chebychev", "cosine", "euclidean", "jaccard",
                 "kl", "manhattan"]
        parts = [Distance(n).pairwise(self.X, self.Y) for n in names]
        got = Distance("uber").pairwise(self.X, self.Y)
        np.testing.assert_allclose(got, sum(parts) / len(parts), atol=1e-4)

    def test_identical_vectors(self):
        v = self.X[0]
        for name in ("kl", "js", "hellinger", "euclidean", "manhattan",
                     "chebychev", "canberra", "cosine", "ks"):
            assert Distance(name).calculate(v, v) == pytest.approx(
                0.0, abs=1e-5), name


def _mini_corpus():
    # doc0: a a b | doc1: b c | doc2: a
    vocab = ["a", "b", "c"]
    docs = [[0, 0, 1], [1, 2], [0]]
    return Corpus.from_token_lists(docs, vocab)


class TestCorpusStatistics:
    def test_counts(self):
        cs = CorpusStatistics(_mini_corpus())
        np.testing.assert_array_equal(cs.type_counts, [3, 2, 1])
        np.testing.assert_array_equal(cs.doc_freqs, [2, 2, 1])
        assert cs.corpus_size == 3
        assert cs.corpus_word_count == 6
        assert cs.avg_doc_len == pytest.approx(2.0)

    def test_inverted_index(self):
        cs = CorpusStatistics(_mini_corpus())
        docs, cnts = cs.postings(0)       # type "a": doc0 x2, doc2 x1
        np.testing.assert_array_equal(docs, [0, 2])
        np.testing.assert_array_equal(cnts, [2, 1])
        dense = cs.term_doc_counts()
        np.testing.assert_array_equal(
            dense, [[2, 0, 1], [1, 1, 0], [0, 1, 0]])

    def test_frequency_order(self):
        cs = CorpusStatistics(_mini_corpus())
        np.testing.assert_array_equal(cs.type_frequency_index, [0, 1, 2])
        np.testing.assert_allclose(cs.type_frequency_cumsum,
                                   [3 / 6, 5 / 6, 1.0])

    def test_query_candidates(self):
        cs = CorpusStatistics(_mini_corpus())
        np.testing.assert_array_equal(cs.query_candidates([2]), [1])
        np.testing.assert_array_equal(cs.query_candidates([0, 2]), [0, 1, 2])


class TestBM25:
    def test_bm25f_formula(self):
        # hand-computed: tf=2, N=10, dl=5, avgdl=4, df=3, k1=1.2, b=0.75
        K = 1.2 * ((1 - 0.75) + 0.75 * 5 / 4)
        tf_part = (2.2 * 2) / (K + 2)
        idf = np.log((10 - 3 + 0.5) / (3 + 0.5))
        assert float(bm25f(2.0, 10.0, 5.0, 4.0, 3.0)) == pytest.approx(
            tf_part * max(idf, 0.1), rel=1e-5)

    def test_idf_floor(self):
        # df so high that idf < 0 -> floored at 0.1
        val = float(bm25f(1.0, 10.0, 5.0, 4.0, 9.0))
        K = 1.2 * ((1 - 0.75) + 0.75 * 5 / 4)
        assert val == pytest.approx((2.2 * 1) / (K + 1) * 0.1, rel=1e-5)

    def test_self_retrieval(self):
        rng = np.random.default_rng(3)
        V, D = 50, 12
        # each doc emphasises its own type block
        docs = []
        for d in range(D):
            own = rng.integers(d * 4, d * 4 + 4, 30)
            noise = rng.integers(0, V, 5)
            docs.append(list(np.concatenate([own, noise])))
        corpus = Corpus.from_token_lists(docs, [f"w{i}" for i in range(V)])
        searcher = BM25Searcher(corpus)
        idx, scores = searcher.search(corpus, top_n=1)
        assert (idx[:, 0] == np.arange(D)).mean() >= 0.9
        assert np.all(scores > 0)

    def test_quirk_mode_matches_reference_scale(self):
        corpus = _mini_corpus()
        s_std = BM25Searcher(corpus).score(corpus)
        s_ref = BM25Searcher(corpus, reference_doclen_quirk=True).score(corpus)
        assert s_std.shape == s_ref.shape == (3, 3)
        # quirk uses dl=V constant: still positive, generally smaller tf part
        assert np.all(s_ref >= 0)


class TestFoldIn:
    def test_recovers_planted_mixture(self):
        # two topics with disjoint vocab; phi known exactly
        V, K = 8, 2
        phi = np.zeros((K, V))
        phi[0, :4] = 0.25
        phi[1, 4:] = 0.25
        docs = [[0, 1, 2, 3, 0, 1], [4, 5, 6, 7, 4, 5], [0, 1, 4, 5]]
        corpus = Corpus.from_token_lists(docs,
                                         [f"w{i}" for i in range(V)])
        import jax
        ndk, theta = fold_in(jax.random.key(0), phi, corpus, 0.1,
                             iterations=50)
        assert ndk.shape == (3, K)
        np.testing.assert_array_equal(ndk.sum(axis=1), [6, 6, 4])
        assert theta[0, 0] > 0.9
        assert theta[1, 1] > 0.9
        assert 0.2 < theta[2, 0] < 0.8


class TestConfusionMatrix:
    def test_counts_and_accuracy(self):
        m = EnhancedConfusionMatrix([0, 0, 1, 1, 2], [0, 1, 1, 1, 0],
                                    ["a", "b", "c"])
        np.testing.assert_array_equal(
            m.values, [[1, 1, 0], [0, 2, 0], [1, 0, 0]])
        assert m.num_correct == 3
        assert m.average_accuracy == pytest.approx(0.6)

    def test_combined(self):
        m1 = EnhancedConfusionMatrix([0, 1], [0, 1], ["a", "b"])
        m2 = EnhancedConfusionMatrix([0, 1], [1, 1], ["a", "b"])
        c = EnhancedConfusionMatrix.combined([m1, m2])
        assert c.total == 4
        assert c.num_correct == 3
        np.testing.assert_array_equal(c.values, [[1, 1], [0, 2]])

    def test_csv(self):
        m = EnhancedConfusionMatrix([0, 1], [0, 1], ["x", "y"])
        csv = m.to_csv()
        assert csv.splitlines()[0].startswith("Label (R=true C=Predicted)")
        assert "x,1,0,1" in csv


class TestKLClassifier:
    def test_planted_classes(self, synthetic_corpus):
        cfg = LDAConfig(scheme="spalias", topics=3, alpha=0.5, beta=0.01,
                        seed=7, iterations=60, exec_time=-1)
        clf = KLDivergenceClassifier(cfg, fold_in_iterations=60)
        clf.train(synthetic_corpus, iterations=60)
        cm = clf.evaluate(synthetic_corpus)
        # planted 3-class disjoint-vocab corpus: should be near-perfect
        assert cm.average_accuracy >= 0.8, cm.to_csv()


class TestLDADistancer:
    def test_distance_matrix(self, synthetic_corpus):
        from ldagroupedgibbssampler_tpu.similarity import LDADistancer
        cfg = LDAConfig(scheme="spalias", topics=3, alpha=0.5, beta=0.01,
                        seed=7, iterations=40, exec_time=-1)
        distancer = LDADistancer(cfg)
        distancer.train(synthetic_corpus, iterations=40)
        test = synthetic_corpus.subset(np.arange(6))
        D = distancer.distance(test, fold_in_iterations=40)
        assert D.shape == (6, synthetic_corpus.num_docs)
        assert np.all(np.isfinite(D))
        # same-class train docs should be nearer than other-class on average
        labels = np.asarray([int(c) for c in synthetic_corpus.labels])
        same = np.asarray([D[i, labels == labels[i]].mean()
                           for i in range(6)])
        other = np.asarray([D[i, labels != labels[i]].mean()
                            for i in range(6)])
        assert (same < other).mean() >= 0.8

    def test_zero_length_docs(self):
        from ldagroupedgibbssampler_tpu.similarity import LDADistancer
        vocab = ["a", "b"]
        train = Corpus.from_token_lists([[0, 1, 0], [], [1, 1]], vocab)
        cfg = LDAConfig(scheme="ggs", topics=2, alpha=0.5, beta=0.01,
                        seed=3, iterations=10, exec_time=-1)
        distancer = LDADistancer(cfg, scheme="ggs")
        distancer.train(train, iterations=10)
        test = Corpus.from_token_lists([[0], []], vocab)
        D = distancer.distance(test, fold_in_iterations=10)
        assert D[0, 1] == np.inf       # non-empty vs empty
        assert D[1, 1] == 0.0          # empty vs empty
        assert D[1, 0] == np.inf       # empty vs non-empty
