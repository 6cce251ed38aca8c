"""Walker alias tables — O(1) categorical sampling.

Replaces `util/WalkerAliasTable.java:4-9` (interface),
`util/GentleAliasMethod.java` / `util/OptimizedGentleAliasMethod.java:9`
(Vose construction + `generateSample(u)`), and
`types/PoissonFixedCoeffSampler.java` (precomputed Poisson(λ) alias).

Role note (SURVEY.md §2.4/P5): the reference rebuilds per-type alias
tables every iteration to make scalar draws O(1)
(SpaliasUncollapsedParallelLDA.java:39-115). The TPU samplers do not need
them — a K-wide Gumbel-max is one VPU issue — so on-device categorical
draws use ops/categorical.py. The alias table remains useful where a
distribution is drawn from MANY times between rebuilds (fixed Poisson
coefficients, host-side tools), and is provided for full API parity.

`build_alias_table` is vectorised NumPy O(n α(n)); `alias_sample` is a
jittable device sampler (two gathers + a compare per draw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_alias_table(probs) -> tuple[np.ndarray, np.ndarray]:
    """Vose/Walker construction. Returns (prob[n], alias[n]) such that a
    draw is: i ~ U{0..n-1}; return i if u < prob[i] else alias[i]
    (OptimizedGentleAliasMethod.java:42-92 `generateAliasTable`)."""
    p = np.asarray(probs, np.float64)
    if p.sum() <= 0:
        raise ValueError("probabilities must sum to a positive value")
    n = len(p)
    scaled = p / p.sum() * n
    prob = np.zeros(n, np.float64)
    alias = np.arange(n, dtype=np.int64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in large:
        prob[i] = 1.0
    for i in small:  # numerical leftovers
        prob[i] = 1.0
    return prob, alias


def alias_sample(key: jax.Array, prob, alias, shape=()) -> jax.Array:
    """Vectorised draws from a built table — the `generateSample(u)` step
    (OptimizedGentleAliasMethod.java:94-107), batched on device."""
    prob = jnp.asarray(prob, jnp.float32)
    alias = jnp.asarray(alias, jnp.int32)
    n = prob.shape[0]
    k_i, k_u = jax.random.split(key)
    i = jax.random.randint(k_i, shape, 0, n, jnp.int32)
    u = jax.random.uniform(k_u, shape, jnp.float32)
    return jnp.where(u < prob[i], i, alias[i])


class WalkerAliasTable:
    """Object parity with util/WalkerAliasTable.java:4-9:
    initTable / generateSample / reGenerateAliasTable."""

    def __init__(self, probs=None):
        self.prob = None
        self.alias = None
        if probs is not None:
            self.init_table(probs)

    def init_table(self, probs):
        self.prob, self.alias = build_alias_table(probs)
        return self

    # reGenerateAliasTable in the reference reuses buffers; here it's a
    # rebuild (buffer reuse is meaningless for NumPy)
    regenerate = init_table

    def generate_sample(self, key, shape=()) -> np.ndarray:
        assert self.prob is not None, "init_table first"
        return np.asarray(alias_sample(key, self.prob, self.alias, shape))


class PoissonFixedCoeffSampler:
    """O(1) Poisson(λ) draws from a precomputed alias table over
    {0..cutoff}, mirroring types/PoissonFixedCoeffSampler.java (used by the
    Polya-Urn fixed-coefficient path for counts below
    `alias_poisson_threshold`, LDAConfiguration.java:44)."""

    def __init__(self, lam: float, cutoff: int | None = None):
        self.lam = float(lam)
        if cutoff is None:
            cutoff = int(lam + 10.0 * max(np.sqrt(lam), 1.0))
        ks = np.arange(cutoff + 1)
        log_pmf = ks * np.log(max(lam, 1e-300)) - lam - (
            np.cumsum(np.concatenate([[0.0], np.log(np.maximum(ks[1:], 1))])))
        pmf = np.exp(log_pmf - log_pmf.max())
        self.table = WalkerAliasTable(pmf)

    def next_poisson(self, key, shape=()) -> np.ndarray:
        return self.table.generate_sample(key, shape)
