"""Document similarity in topic space.

Replaces ``cc.mallet.similarity.LDADistancer`` (LDADistancer.java:15-185):
train a sampler on the training corpus, fold held-out documents into the
trained phi, and measure distances between the held-out theta and every
training document's theta. The reference folds in one document at a time
(fresh SpaliasUncollapsedParallelLDA + 2000 sampleZGivenPhi iterations per
query, LDADistancer.java:distance); here every query folds in at once and
the full (num_test × num_train) distance matrix is one batched device
program (similarity/distances.py).

Zero-length documents follow the reference: distance 0 if both docs are
empty, +inf if exactly one is (LDADistancer.java:distance zero-length
branches).
"""

from __future__ import annotations

import jax
import numpy as np

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.evaluation.foldin import fold_in
from ldagroupedgibbssampler_tpu.similarity.distances import Distance


class LDADistancer:
    """`train()` then `distance()`; `set_dist` switches the metric
    (default symmetric KL, LDADistancer.java:30)."""

    def __init__(self, config: LDAConfig, distance: str = "kl",
                 scheme: str | None = None):
        self.config = config
        self.dist = Distance(distance)
        # reference hard-codes Spalias (LDADistancer.java:train); any
        # registered scheme works here
        self.scheme = scheme or "spalias"
        self.trained_sampler = None
        self.train_thetas = None
        self._train_lengths = None
        self.sampled_test_topics = None

    def set_dist(self, distance: str):
        self.dist = Distance(distance)

    def train(self, corpus: Corpus, iterations: int | None = None):
        from ldagroupedgibbssampler_tpu.models.registry import create_model
        self.train_corpus = corpus
        model = create_model(self.config, self.scheme)
        model.add_instances(corpus)
        model.sample(iterations or self.config.iterations)
        self.trained_sampler = model
        self.train_thetas = model.get_theta_estimate()
        self._train_lengths = corpus.doc_lengths()
        return model

    def distance(self, test_corpus: Corpus, fold_in_iterations: int = 200
                 ) -> np.ndarray:
        """(num_test, num_train) distance matrix."""
        assert self.trained_sampler is not None, "call train() first"
        key = jax.random.key(self.config.effective_seed() + 17)
        _, theta_test = fold_in(key, self.trained_sampler.get_phi(),
                                test_corpus,
                                self.trained_sampler.get_alpha(),
                                iterations=fold_in_iterations)
        self.sampled_test_topics = theta_test
        D = self.dist.pairwise(theta_test, self.train_thetas)
        # zero-length doc handling (reference semantics)
        test_len = test_corpus.doc_lengths()
        both = (test_len[:, None] == 0) & (self._train_lengths[None, :] == 0)
        either = (test_len[:, None] == 0) ^ (self._train_lengths[None, :] == 0)
        D = np.where(either, np.inf, D)
        D = np.where(both, 0.0, D)
        return D

    def closest(self, test_corpus: Corpus, n: int = 1,
                fold_in_iterations: int = 200):
        """Indices of the n nearest training docs per test doc."""
        D = self.distance(test_corpus, fold_in_iterations)
        order = np.argsort(D, axis=1)[:, :n]
        return order, np.take_along_axis(D, order, axis=1)
