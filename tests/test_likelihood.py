"""LL-formula agreement and evaluation-layer tests.

Mirrors LogLikelihoodTest.java:23 (collapsed and uncollapsed LL formulas
agree on identical z-state) and the §4.2 exact-equivalence style."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln as sp_gammaln

from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
    log_posterior, matrix_density, model_log_likelihood)
from ldagroupedgibbssampler_tpu.evaluation.marginal import (
    left_to_right_log_likelihood)


def _random_counts(rng, num_docs=20, num_topics=4, num_types=50,
                   tokens=2000):
    z = rng.integers(0, num_topics, tokens)
    w = rng.integers(0, num_types, tokens)
    d = rng.integers(0, num_docs, tokens)
    ndk = np.zeros((num_docs, num_topics), np.int32)
    nkw = np.zeros((num_topics, num_types), np.int32)
    np.add.at(ndk, (d, z), 1)
    np.add.at(nkw, (z, w), 1)
    return ndk, nkw


def test_model_ll_matches_numpy_reference():
    """Device formula == independent float64 NumPy implementation of the
    Dirichlet-multinomial marginal (ModifiedSimpleLDA.java:228-324)."""
    rng = np.random.default_rng(3)
    ndk, nkw = _random_counts(rng)
    alpha, beta = 0.7, 0.05
    num_docs, num_topics = ndk.shape
    num_types = nkw.shape[1]
    ll_dev = float(model_log_likelihood(ndk, nkw, alpha, beta))

    a = np.full(num_topics, alpha)
    doc = (sp_gammaln(a + ndk).sum()
           - sp_gammaln(a.sum() + ndk.sum(1)).sum()
           + num_docs * (sp_gammaln(a.sum()) - sp_gammaln(a).sum()))
    top = (sp_gammaln(beta + nkw).sum()
           - sp_gammaln(num_types * beta + nkw.sum(1)).sum()
           + num_topics * (sp_gammaln(num_types * beta)
                           - num_types * sp_gammaln(beta)))
    assert abs(ll_dev - (doc + top)) / abs(doc + top) < 1e-4


def test_log_posterior_matches_numpy():
    rng = np.random.default_rng(5)
    ndk, nkw = _random_counts(rng)
    theta = rng.dirichlet(np.ones(4), size=20)
    phi = rng.dirichlet(np.ones(50), size=4)
    alpha, beta = 1.5, 0.01
    lp_dev = float(log_posterior(ndk, nkw, theta, phi, alpha, beta))
    lp_np = (nkw * np.log(phi + 1e-12)).sum() \
        + ((ndk + alpha - 1.0) * np.log(theta + 1e-12)).sum() \
        + (beta - 1.0) * np.log(phi + 1e-12).sum()
    assert abs(lp_dev - lp_np) / abs(lp_np) < 1e-4


def test_matrix_density():
    m = np.zeros((4, 5))
    m[0, 0] = m[1, 2] = 1
    assert abs(float(matrix_density(m)) - 2 / 20) < 1e-6


def test_left_to_right_sane(synthetic_corpus):
    """Held-out LL should prefer the true phi over a uniform phi."""
    num_topics, num_types = 3, synthetic_corpus.num_types
    # true planted phi: block-diagonal
    phi_true = np.full((num_topics, num_types), 1e-3)
    for k in range(3):
        phi_true[k, k * 10:(k + 1) * 10] = 1.0
    phi_true /= phi_true.sum(1, keepdims=True)
    phi_unif = np.full((num_topics, num_types), 1.0 / num_types)
    key = jax.random.key(0)
    ll_true = left_to_right_log_likelihood(key, synthetic_corpus, phi_true,
                                           np.full(3, 0.5),
                                           num_particles=20)
    ll_unif = left_to_right_log_likelihood(key, synthetic_corpus, phi_unif,
                                           np.full(3, 0.5),
                                           num_particles=20)
    assert ll_true > ll_unif + 100, (ll_true, ll_unif)
    # and the count-based variant runs
    nkw = (phi_true * 1000).astype(np.int32)
    ll_counts = left_to_right_log_likelihood(
        key, synthetic_corpus, None, np.full(3, 0.5), num_particles=10,
        nkw=jnp.asarray(nkw), nk=jnp.asarray(nkw.sum(1)), beta=0.01)
    assert np.isfinite(ll_counts)


def test_hyperopt_recovers_concentration():
    """Minka fixed point recovers the generating alpha within a factor."""
    from ldagroupedgibbssampler_tpu.evaluation.hyperopt import (
        learn_dirichlet_parameters)
    rng = np.random.default_rng(11)
    true_alpha = np.asarray([0.5, 1.0, 2.0])
    theta = rng.dirichlet(true_alpha, size=2000)
    lengths = np.full(2000, 200)
    counts = np.stack([rng.multinomial(200, t) for t in theta])
    est = learn_dirichlet_parameters(np.ones(3), counts, lengths)
    np.testing.assert_allclose(est, true_alpha, rtol=0.25)
