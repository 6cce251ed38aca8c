"""Anchor-word topic priors, scheme `spalias_priors`.

Reference: topics/SpaliasUncollapsedParallelWithPriors.java (381 LoC).
Prior-spec file format (one line per topic, `#` comments):

    <topic>, word1, word2, ...

Each listed word is *anchored* to that topic: it is zeroed out of every
other topic's phi row unless another line also keeps it there
(extractPriorSpec, :125-167 — toZeroOut minus toKeep). Unknown words warn
and are skipped (:88-94); a topic or word with all-zero prior raises
(ensureConsistentPriors, :102-121). Phi rows are masked by the prior at
every draw (initialSamplePhi :63-73; conditional sampling respects the
zeroed types).

TPU-first: the prior is a [K, V] 0/1 mask; phi concentration is multiplied
by it before the Gamma draw so masked coordinates come out exactly 0, and
the sweep's word logits are -inf there.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.models.polyaurn import NEG_INF, _EPS
from ldagroupedgibbssampler_tpu.models.pcgs import UncollapsedParallelLDA
from ldagroupedgibbssampler_tpu.models.base import LDAState
from ldagroupedgibbssampler_tpu.ops import random as rnd


def parse_prior_spec(lines, num_topics: int):
    """-> (keep[topic] sets, zero_out[topic] sets) of words
    (extractPriorSpec semantics)."""
    to_keep = [set() for _ in range(num_topics)]
    to_zero = [set() for _ in range(num_topics)]
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        spec = [s.strip() for s in line.split(",")]
        topic = int(spec[0])
        for word in spec[1:]:
            if not word:
                continue
            for k in range(num_topics):
                (to_keep if k == topic else to_zero)[k].add(word)
    for k in range(num_topics):
        to_zero[k] -= to_keep[k]
    return to_keep, to_zero


def calculate_priors(path: str, num_topics: int, vocab: list[str]
                     ) -> np.ndarray:
    """[K, V] 0/1 prior matrix (calculatePriors, :74-99)."""
    with open(path, "r", encoding="utf-8") as f:
        lines = f.readlines()
    _keep, zero_out = parse_prior_spec(lines, num_topics)
    index = {w: i for i, w in enumerate(vocab)}
    priors = np.ones((num_topics, len(vocab)), np.float32)
    warned = set()
    for k in range(num_topics):
        for word in zero_out[k]:
            idx = index.get(word)
            if idx is None:
                if word not in warned:
                    print(f"WARNING: calculate_priors: Word \"{word}\" does "
                          "not exist in the dictionary!", file=sys.stderr)
                    warned.add(word)
                continue
            priors[k, idx] = 0.0
    _ensure_consistent_priors(priors, vocab)
    return priors


def _ensure_consistent_priors(priors: np.ndarray, vocab):
    if (priors.sum(axis=1) == 0).any():
        raise ValueError("Inconsistent prior spec, one topic has all Zero "
                         "priors!")
    zero_cols = np.where(priors.sum(axis=0) == 0)[0]
    if len(zero_cols):
        words = [vocab[i] for i in zero_cols]
        raise ValueError(f"Inconsistent prior spec, '{words}' has all Zero "
                         "priors!")


class SpaliasUncollapsedParallelWithPriors(UncollapsedParallelLDA):
    layout = "doc_major"
    smooth_phi = True
    # prior-masked phi rows carry exact zeros: keep the last-nonzero scan
    fused_positive_support = False

    def add_instances(self, corpus, key=None):
        self.topic_priors = None
        if self.config.topic_prior_filename:
            self.topic_priors = jnp.asarray(calculate_priors(
                self.config.topic_prior_filename, self.config.topics,
                corpus.vocab))
        return super().add_instances(corpus, key)

    def get_topic_priors(self):
        """LDASamplerWithPriors.getTopicPriors
        (topics/LDASamplerWithPriors.java:3-5)."""
        return None if self.topic_priors is None else np.asarray(
            self.topic_priors)

    def _masked_conc(self, nkw, beta):
        conc = nkw.astype(jnp.float32) + beta
        if self.topic_priors is not None:
            conc = conc * self.topic_priors
        return conc

    def _initial_phi(self, key, nkw, beta):
        return self._sample_phi(key, nkw, beta, None, None)

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        conc = self._masked_conc(nkw, beta)
        g = jnp.where(conc > 0, jnp.maximum(rnd.gamma(key, conc), _EPS), 0.0)
        phi = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), _EPS)
        if type_mask is not None:
            phi = jnp.where(type_mask[None, :], phi, prev_phi)
            phi = phi / jnp.maximum(jnp.sum(phi, axis=-1, keepdims=True),
                                    _EPS)
        return phi

    def _word_weights_t(self, state: LDAState):
        # zeroed (prior-masked) phi coordinates get exactly zero probability
        return state.phi.T, None
