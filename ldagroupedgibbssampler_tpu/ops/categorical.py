"""Vectorised categorical draws for the z-step.

The reference draws each token's topic with a sequential inverse-CDF scan over
K scores (UncollapsedParallelLDA.java:1519-1531) or an O(1) Walker alias table
(util/OptimizedGentleAliasMethod.java:94-107, SpaliasUncollapsedParallelLDA.java
:277-293). Neither mechanism is TPU-shaped: the idiomatic device equivalent is
the Gumbel-max trick — add iid Gumbel noise to the log-scores of a whole block
of tokens at once and take an argmax over the topic axis. This is exact
categorical sampling (same target distribution), fully parallel over tokens,
and maps onto the VPU with no data-dependent control flow.

For parity with alias-table *behaviour* at large K, `masked_gumbel_categorical`
supports exact-zero probabilities (sparse phi rows from the Polya-Urn path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-1e30)  # np scalar: no backend init at import time


def gumbel_categorical(key: jax.Array, log_scores: jax.Array,
                       axis: int = -1) -> jax.Array:
    """Draw one categorical sample per row of unnormalised log-scores.

    Exact replacement for the sequential inverse-CDF draw at
    UncollapsedParallelLDA.java:1519-1531: P(z=k) ∝ exp(log_scores[k]).
    """
    g = jax.random.gumbel(key, log_scores.shape, dtype=log_scores.dtype)
    return jnp.argmax(log_scores + g, axis=axis).astype(jnp.int32)


def masked_gumbel_categorical(key: jax.Array, log_scores: jax.Array,
                              mask: jax.Array, axis: int = -1) -> jax.Array:
    """Gumbel-max over only the positions where mask is True.

    Used for sparse phi (Polya-Urn exact zeros) and HDP inactive topics:
    masked-out categories have probability exactly 0, matching the reference's
    sparse alias tables that simply never contain them.
    """
    g = jax.random.gumbel(key, log_scores.shape, dtype=log_scores.dtype)
    return jnp.argmax(jnp.where(mask, log_scores + g, NEG_INF),
                      axis=axis).astype(jnp.int32)


def inverse_cdf_categorical(key: jax.Array, scores: jax.Array,
                            axis: int = -1) -> jax.Array:
    """Inverse-CDF categorical draw: u * sum(scores) then first index where the
    running cumsum crosses u.

    Statistically identical to `gumbel_categorical`; provided because the
    reference semantics tests (and the EfficientUncollapsedParallelLDA
    two-ended scan, topics/EfficientUncollapsedParallelLDA.java:86-100) are
    specified in terms of one uniform per token. Vectorised: cumsum over the
    topic axis + comparison + argmax of the indicator.
    """
    scores = jnp.asarray(scores)
    total = jnp.sum(scores, axis=axis, keepdims=True)
    u = jax.random.uniform(key, total.shape, dtype=scores.dtype) * total
    cdf = jnp.cumsum(scores, axis=axis)
    # First k with cdf[k] > u. argmax returns the first True.
    return jnp.argmax(cdf > u, axis=axis).astype(jnp.int32)
