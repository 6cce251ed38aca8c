"""Model log-likelihood and log-posterior, computed on device.

  - `model_log_likelihood`: collapsed Dirichlet-multinomial marginal
    p(w, z | alpha, beta), mirroring ModifiedSimpleLDA.modelLogLikelihood
    (topics/ModifiedSimpleLDA.java:228-324) / MALLET SimpleLDA. Computed from
    the count matrices alone — no token loop.
  - `log_posterior`: the Doss & George augmented-state log posterior
    log p(z, theta, phi | w) up to a constant, mirroring
    SerialCollapsedLDA.computeLogPosterior (topics/SerialCollapsedLDA.java:
    371-433): sum_kv N_kw log phi + sum_dk (N_dk + alpha - 1) log theta
    + (beta - 1) sum_kv log phi, with the same 1e-12 stability epsilon.
  - `matrix_density`: fraction of non-zero entries
    (LDAUtils.calculateMatrixDensity:1734, calculatePhiDensity:1754).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

_EPS = 1e-12


def model_log_likelihood(ndk, nkw, alpha, beta: float):
    """Collapsed LL of (w, z). `alpha` may be scalar (symmetric) or [K].

    Formula (ModifiedSimpleLDA.java:228-324):
      sum_d [ sum_k log Gamma(alpha_k + n_dk) - log Gamma(alphaSum + n_d) ]
      + D [ log Gamma(alphaSum) - sum_k log Gamma(alpha_k) ]
      + sum_k [ sum_w log Gamma(beta + n_kw) - log Gamma(V beta + n_k) ]
      + K [ log Gamma(V beta) - V log Gamma(beta) ]
    """
    ndk = jnp.asarray(ndk, jnp.float32)
    nkw = jnp.asarray(nkw, jnp.float32)
    ndk = ndk.reshape(-1, ndk.shape[-1])  # accept sharded [S, Dp, K] layouts
    num_docs, num_topics = ndk.shape
    num_types = nkw.shape[1]
    alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), (num_topics,))
    alpha_sum = jnp.sum(alpha)
    doc_lengths = jnp.sum(ndk, axis=1)
    nk = jnp.sum(nkw, axis=1)

    doc_part = (jnp.sum(gammaln(alpha[None, :] + ndk))
                - jnp.sum(gammaln(alpha_sum + doc_lengths))
                + num_docs * (gammaln(alpha_sum) - jnp.sum(gammaln(alpha))))
    topic_part = (jnp.sum(gammaln(beta + nkw))
                  - jnp.sum(gammaln(num_types * beta + nk))
                  + num_topics * (gammaln(num_types * beta)
                                  - num_types * gammaln(beta)))
    return doc_part + topic_part


def log_posterior(ndk, nkw, theta, phi, alpha, beta: float):
    """Doss & George log posterior of the augmented state
    (SerialCollapsedLDA.java:371-433), vectorised:
    the reference's per-doc m_djt accumulation collapses to N_kw."""
    theta = jnp.asarray(theta, jnp.float32).reshape(-1, jnp.asarray(
        theta).shape[-1])
    ndk = jnp.asarray(ndk, jnp.float32).reshape(-1, theta.shape[-1])
    log_theta = jnp.log(theta + _EPS)
    log_phi = jnp.log(jnp.asarray(phi, jnp.float32) + _EPS)
    alpha = jnp.asarray(alpha, jnp.float32)
    lp = jnp.sum(jnp.asarray(nkw, jnp.float32) * log_phi)
    lp += jnp.sum((ndk + alpha - 1.0) * log_theta)
    lp += (beta - 1.0) * jnp.sum(log_phi)
    return lp


def matrix_density(mat) -> jnp.ndarray:
    """Fraction of non-zero entries (LDAUtils.java:1734-1770)."""
    mat = jnp.asarray(mat)
    return jnp.mean((mat != 0).astype(jnp.float32))


def perplexity(held_out_ll: float, num_tokens: int) -> float:
    """exp(-LL / N) (LDAUtils.perplexityToFile:914)."""
    return float(jnp.exp(-held_out_ll / max(num_tokens, 1)))
