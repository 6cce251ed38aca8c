"""Held-out log-likelihood: Wallach left-to-right particle estimator.

Reference: topics/MarginalProbEstimatorPlain.java — `evaluateLeftToRight`
(:85) runs `numParticles` independent left-to-right passes per document
(:97-100) with `usingResampling = false` (:125) and combines them as
log mean_r p_r(w_n) per position (:105, logNumParticles :89). Word
probabilities come from the dense type-topic counts:
p(w|k) = (beta + n_kw) / (V beta + n_k). The estimator is constructed from
the sampler's current counts each evaluation
(UncollapsedParallelLDA.java:604-622).

TPU-first: the reference loops docs × particles × positions serially. Here a
single `lax.scan` over token *position* is vectorised over all test docs and
all particles simultaneously — carry is the particle doc-topic counts
[R, D, K]; per position we compute all R×D predictive probabilities at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus

_EPS = 1e-30


def left_to_right_from_counts(key, w_pad, mask_pad, nkw, nk, alpha,
                              beta: float, num_particles: int = 100):
    """Core estimator on padded test docs. Returns total held-out LL."""
    num_types = nkw.shape[1]
    word_prob = ((beta + nkw.astype(jnp.float32))
                 / (beta * num_types + nk.astype(jnp.float32))[:, None])
    return left_to_right_from_word_prob(key, w_pad, mask_pad, word_prob,
                                        alpha, num_particles)


def left_to_right_from_word_prob(key, w_pad, mask_pad, word_prob, alpha,
                                 num_particles: int = 100):
    num_docs, length = w_pad.shape
    num_topics = word_prob.shape[0]
    alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), (num_topics,))
    alpha_sum = jnp.sum(alpha)
    word_prob_t = word_prob.T                                # [V, K]
    keys = jax.random.split(key, length)

    def step(carry, xs):
        counts, ll = carry                                    # [R, D, K], [D]
        kt, wt, mt = xs                                       # [D], [D]
        theta = ((counts + alpha[None, None, :])
                 / (jnp.sum(counts, axis=-1, keepdims=True) + alpha_sum))
        scores = theta * word_prob_t[wt][None, :, :]          # [R, D, K]
        p = jnp.sum(scores, axis=-1)                          # [R, D]
        ll = ll + jnp.where(mt, jnp.log(jnp.mean(p, axis=0) + _EPS), 0.0)
        # advance particles: z ~ scores, counts += onehot(z) (masked)
        g = jax.random.gumbel(kt, scores.shape, dtype=jnp.float32)
        z = jnp.argmax(jnp.log(scores + _EPS) + g, axis=-1)   # [R, D]
        counts = counts + jax.nn.one_hot(z, num_topics, dtype=jnp.float32) \
            * mt[None, :, None].astype(jnp.float32)
        return (counts, ll), None

    init = (jnp.zeros((num_particles, num_docs, num_topics), jnp.float32),
            jnp.zeros((num_docs,), jnp.float32))
    (counts, ll), _ = jax.lax.scan(step, init,
                                   (keys, w_pad.T, mask_pad.T))
    return jnp.sum(ll)


_jitted = jax.jit(left_to_right_from_counts, static_argnames=("num_particles",))


def left_to_right_log_likelihood(key, test_corpus: Corpus, phi_or_counts,
                                 alpha, num_particles: int = 100,
                                 nkw=None, nk=None, beta: float | None = None):
    """Convenience wrapper over a `Corpus`.

    If `nkw`/`nk`/`beta` are given, uses the count-based word probabilities
    (exact reference semantics); otherwise treats `phi_or_counts` as a
    row-normalised phi matrix.
    """
    w_pad, mask_pad = test_corpus.to_padded()
    key = key if hasattr(key, "dtype") else jax.random.key(int(key))
    if nkw is not None:
        return float(_jitted(key, jnp.asarray(w_pad), jnp.asarray(mask_pad),
                             jnp.asarray(nkw), jnp.asarray(nk),
                             jnp.asarray(alpha, jnp.float32),
                             float(beta), num_particles))
    phi = jnp.asarray(np.asarray(phi_or_counts), jnp.float32)
    phi = phi / jnp.maximum(jnp.sum(phi, axis=1, keepdims=True), _EPS)
    return float(jax.jit(left_to_right_from_word_prob,
                         static_argnames=("num_particles",))(
        key, jnp.asarray(w_pad), jnp.asarray(mask_pad), phi,
        jnp.asarray(alpha, jnp.float32), num_particles))
