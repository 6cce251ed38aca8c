"""Topic-space document classification by symmetric-KL to class centroids.

Replaces ``cc.mallet.classify.KLDivergenceClassifier``
(classify/KLDivergenceClassifier.java:24-) and
``KLDivergenceClassifierMultiCorpus`` (KLDivergenceClassifierMultiCorpus.java:20-).

Reference behaviour reproduced:
  - train(): fit a Spalias sampler on the full training set, compute per-
    class centroids as the alpha-smoothed mean zbar of the class's docs
    (KLDivergenceClassifier.java:calculateCentroids).
  - classify(): fold the test doc into the trained phi (sampleZGivenPhi,
    300 iterations), normalise its zbar with alpha, score each class as
    1 / symmetric-KL(centroid, doc) (classify:48-56).
  - MultiCorpus variant trains ONE sampler PER CLASS and folds the test
    doc into each class's model, scoring against that model's centroid.

TPU redesign: all test documents fold in at once (evaluation/foldin.py) and
the (num_test × num_classes) symmetric-KL matrix is one batched device
program — the reference classifies one doc at a time with a fresh sampler
per doc.
"""

from __future__ import annotations

import jax
import numpy as np

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.evaluation.foldin import fold_in
from ldagroupedgibbssampler_tpu.similarity.distances import Distance


def _class_index(labels):
    names = sorted(set(labels))
    idx = {c: i for i, c in enumerate(names)}
    return names, np.asarray([idx[c] for c in labels], np.int64)


class KLDivergenceClassifier:
    def __init__(self, config: LDAConfig, scheme: str = "spalias",
                 fold_in_iterations: int = 300):
        self.config = config
        self.scheme = scheme
        self.fold_in_iterations = fold_in_iterations
        self.alpha = float(config.alpha)
        self.dist = Distance("kl")
        self.trained_sampler = None
        self.class_names: list[str] = []
        self.centroids: np.ndarray | None = None   # (C, K)
        self.sampled_test_topics: np.ndarray | None = None

    def train(self, corpus: Corpus, iterations: int | None = None):
        assert corpus.labels, "training corpus needs labels"
        from ldagroupedgibbssampler_tpu.models.registry import create_model
        model = create_model(self.config, self.scheme)
        model.add_instances(corpus)
        model.sample(iterations or self.config.iterations)
        self.trained_sampler = model
        self.class_names, y = _class_index(corpus.labels)
        zbar = model.get_zbar()                     # (D, K)
        C = len(self.class_names)
        sums = np.zeros((C, zbar.shape[1]))
        np.add.at(sums, y, zbar)
        cnt = np.bincount(y, minlength=C).astype(np.float64)
        # (sum + alpha) / count — the reference's exact normalisation
        # (calculateCentroids, KLDivergenceClassifier.java)
        self.centroids = (sums + self.alpha) / cnt[:, None]
        return model

    def _test_doc_topics(self, test_corpus: Corpus) -> np.ndarray:
        key = jax.random.key(self.config.effective_seed() + 31)
        ndk, _ = fold_in(key, self.trained_sampler.get_phi(), test_corpus,
                         self.trained_sampler.get_alpha(),
                         iterations=self.fold_in_iterations)
        ndk = ndk.astype(np.float64)
        zbar = ndk / np.maximum(ndk.sum(axis=1, keepdims=True), 1.0)
        # normalise with alpha as in classify() (KLDivergenceClassifier.java)
        zbar = (zbar + self.alpha)
        zbar /= zbar.sum(axis=1, keepdims=True)
        return zbar

    def score(self, test_corpus: Corpus) -> np.ndarray:
        """(num_test, num_classes) scores = 1 / symmetric KL."""
        assert self.trained_sampler is not None, "call train() first"
        docs = self._test_doc_topics(test_corpus)
        self.sampled_test_topics = docs
        D = self.dist.pairwise(self.centroids, docs)      # (C, T)
        return (1.0 / np.maximum(D.T, 1e-12))             # (T, C)

    def classify(self, test_corpus: Corpus) -> np.ndarray:
        """Predicted class index per test doc."""
        return np.argmax(self.score(test_corpus), axis=1)

    def evaluate(self, test_corpus: Corpus):
        """Classify + confusion matrix against the corpus's own labels."""
        from ldagroupedgibbssampler_tpu.classify.confusion import (
            EnhancedConfusionMatrix)
        assert test_corpus.labels
        pred = self.classify(test_corpus)
        # classes unseen in training (possible in small CV folds) extend the
        # label set; they can never be predicted, only missed
        names = list(self.class_names) + sorted(
            set(test_corpus.labels) - set(self.class_names))
        idx = {c: i for i, c in enumerate(names)}
        y = np.asarray([idx[c] for c in test_corpus.labels], np.int64)
        return EnhancedConfusionMatrix(y, pred, names)

    def cross_validate(self, corpus: Corpus, folds: int = 5,
                       iterations: int | None = None):
        """k-fold cross-validation returning one confusion matrix ("trial")
        per fold (Classifier.crossValidate as used by
        tui/KLClassifier.java:126-131). Re-trains from scratch each fold."""
        from ldagroupedgibbssampler_tpu.corpus.perplexity import (
            cross_validation_folds)
        trials = []
        for train_idx, test_idx in cross_validation_folds(
                corpus.num_docs, folds, seed=self.config.effective_seed()):
            fold_clf = type(self)(self.config, scheme=self.scheme,
                                  fold_in_iterations=self.fold_in_iterations)
            fold_clf.train(corpus.subset(train_idx), iterations=iterations)
            trials.append(fold_clf.evaluate(corpus.subset(test_idx)))
        return trials


class KLDivergenceClassifierMultiCorpus(KLDivergenceClassifier):
    """One sampler per class (KLDivergenceClassifierMultiCorpus.java:105-118):
    fold the test docs into EVERY class model and score each against that
    model's own centroid."""

    def train(self, corpus: Corpus, iterations: int | None = None):
        assert corpus.labels, "training corpus needs labels"
        from ldagroupedgibbssampler_tpu.models.registry import create_model
        self.class_names, y = _class_index(corpus.labels)
        self.models = {}
        self.centroids_per_class = {}
        for ci, cname in enumerate(self.class_names):
            sub = corpus.subset(np.flatnonzero(y == ci))
            model = create_model(self.config, self.scheme)
            model.add_instances(sub)
            model.sample(iterations or self.config.iterations)
            zbar = model.get_zbar()
            self.models[cname] = model
            self.centroids_per_class[cname] = (
                (zbar.sum(axis=0) + self.alpha) / zbar.shape[0])
        return self.models

    def score(self, test_corpus: Corpus) -> np.ndarray:
        assert self.models, "call train() first"
        T = test_corpus.num_docs
        scores = np.zeros((T, len(self.class_names)))
        for ci, cname in enumerate(self.class_names):
            model = self.models[cname]
            key = jax.random.key(self.config.effective_seed() + 31 + ci)
            ndk, _ = fold_in(key, model.get_phi(), test_corpus,
                             model.get_alpha(),
                             iterations=self.fold_in_iterations)
            ndk = ndk.astype(np.float64)
            zbar = ndk / np.maximum(ndk.sum(axis=1, keepdims=True), 1.0)
            zbar = zbar + self.alpha
            zbar /= zbar.sum(axis=1, keepdims=True)
            cen = self.centroids_per_class[cname][None, :]
            D = self.dist.pairwise(zbar, cen)[:, 0]
            scores[:, ci] = 1.0 / np.maximum(D, 1e-12)
        return scores
