"""Fold-in: sample z for held-out documents under a FIXED phi.

Replaces ``sampleZGivenPhi`` (topics/UncollapsedParallelLDA.java:975-1014),
which the reference invokes one-test-document-at-a-time from
similarity/LDADistancer.java:distance and classify/KLDivergenceClassifier.java
:classify — spinning up a fresh sampler instance per document. Here ALL
held-out documents fold in simultaneously: one `lax.scan` over iterations
whose body draws theta_d ~ Dir(n_dk + alpha) for every doc and all token
topics in parallel given (theta, phi) — the same grouped-Gibbs move the GGS
z-step uses, which is exact when phi is held fixed.

Returns both the running post-burn-in mean of theta (getThetaEstimate) and
the final doc-topic counts (getZbar's numerator).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd


@partial(jax.jit, static_argnames=("num_docs", "iterations", "burnin"))
def _fold_in_jit(key, w, doc_ids, mask, log_phi_vk, alpha, num_docs,
                 iterations, burnin):
    K = log_phi_vk.shape[1]
    k_init, k_scan = jax.random.split(key)
    z0 = jnp.where(mask, jax.random.randint(k_init, w.shape, 0, K,
                                            dtype=jnp.int32), 0)
    ndk0 = count_ops.doc_topic_counts(z0, doc_ids, mask, num_docs, K)
    token_log_phi = log_phi_vk[w]                     # (N, K) gather once

    def body(carry, it):
        key, _z_prev, ndk, theta_sum, n_acc = carry
        key, k_theta, k_z = jax.random.split(key, 3)
        theta = rnd.dirichlet(k_theta, ndk.astype(jnp.float32) + alpha)
        log_scores = jnp.log(theta)[doc_ids] + token_log_phi
        g = jax.random.gumbel(k_z, log_scores.shape, jnp.float32)
        z = jnp.argmax(log_scores + g, axis=-1).astype(jnp.int32)
        z = jnp.where(mask, z, 0)
        ndk = count_ops.doc_topic_counts(z, doc_ids, mask, num_docs, K)
        keep = (it >= burnin).astype(jnp.float32)
        return (key, z, ndk, theta_sum + keep * theta, n_acc + keep), None

    init = (k_scan, z0, ndk0, jnp.zeros((num_docs, K), jnp.float32),
            jnp.float32(0.0))
    (key, z, ndk, theta_sum, n_acc), _ = jax.lax.scan(
        body, init, jnp.arange(iterations))
    theta_mean = theta_sum / jnp.maximum(n_acc, 1.0)
    return z, ndk, theta_mean


def fold_in(key, phi_kv, corpus: Corpus, alpha, iterations: int = 100,
            burnin: int | None = None, token_block: int = 256):
    """Fold `corpus` into a trained model with topic-word matrix `phi_kv`
    ([K, V], rows normalised). Returns (ndk [D,K] int32, theta_mean [D,K]).
    """
    if burnin is None:
        burnin = iterations // 2
    phi_kv = jnp.asarray(phi_kv, jnp.float32)
    log_phi_vk = jnp.log(jnp.maximum(phi_kv.T, 1e-30))
    w, doc_ids, mask = corpus.flat_padded(token_block)
    alpha = jnp.asarray(alpha, jnp.float32)
    if alpha.ndim == 0:
        alpha = jnp.full((phi_kv.shape[0],), alpha)
    _, ndk, theta_mean = _fold_in_jit(key, jnp.asarray(w),
                                      jnp.asarray(doc_ids), jnp.asarray(mask),
                                      log_phi_vk, alpha, corpus.num_docs,
                                      int(iterations), int(burnin))
    return np.asarray(ndk), np.asarray(theta_mean)
