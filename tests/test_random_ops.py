"""Statistical correctness tests for the RNG primitives — the TPU analogue
of the reference's chi-square/KS style (§4.1: PoissonPolyaUrnTest.java,
WalkerAliasTableTest.java, SparseDirichletDrawTest.java,
RandomTesting.java:40)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from ldagroupedgibbssampler_tpu.ops import categorical as cat
from ldagroupedgibbssampler_tpu.ops import random as rnd

KEY = jax.random.key(123)


def test_dirichlet_moments():
    """Dirichlet(conc) mean/variance match theory (SparseDirichletDrawTest
    analogue)."""
    conc = jnp.asarray([0.5, 1.0, 3.0, 10.0])
    draws = jax.vmap(lambda k: rnd.dirichlet(k, conc))(
        jax.random.split(KEY, 20000))
    total = float(conc.sum())
    mean_theory = np.asarray(conc) / total
    var_theory = mean_theory * (1 - mean_theory) / (total + 1)
    np.testing.assert_allclose(np.asarray(draws.mean(0)), mean_theory,
                               atol=0.01)
    np.testing.assert_allclose(np.asarray(draws.var(0)), var_theory,
                               atol=0.01)


def test_gamma_ks_small_shape():
    """KS test of the Gamma sampler at shape < 1 (the beta=0.01 regime;
    RandomTesting.java:40 analogue). Run in float64: at shape=0.05 a
    sizeable mass of Gamma draws sits below float32's subnormal range and
    flushes to exactly 0, which is expected float32 behaviour, not a sampler
    bug — the Dirichlet path floors those coordinates anyway."""
    shape = 0.05
    draws = np.asarray(rnd.gamma(KEY, jnp.full((50000,), shape)),
                       np.float64)
    # condition on draws above the float32 flush-to-zero floor
    eps = 1e-30
    kept = draws[draws > eps]
    assert len(kept) > 40000
    f_eps = stats.gamma.cdf(eps, shape)

    def cond_cdf(x):
        return (stats.gamma.cdf(x, shape) - f_eps) / (1.0 - f_eps)

    ks = stats.kstest(kept, cond_cdf)
    assert ks.pvalue > 1e-3, ks


def test_gamma_ks_moderate_shape_f32():
    """float32 path itself is sound at the shapes phi smoothing actually
    produces once counts are added (beta + n ≥ O(1))."""
    for shape in (0.5, 3.0):
        draws = np.asarray(rnd.gamma(jax.random.fold_in(KEY, int(shape * 10)),
                                     jnp.full((50000,), shape)))
        ks = stats.kstest(draws, "gamma", args=(shape,))
        assert ks.pvalue > 1e-3, (shape, ks)


def test_gumbel_categorical_chi_square():
    """Chi-square goodness of fit of the Gumbel-max draw against the target
    pmf (WalkerAliasTableTest analogue — same role: categorical mechanism
    equals multinomial)."""
    probs = np.asarray([0.05, 0.1, 0.15, 0.3, 0.4])
    logits = jnp.log(jnp.asarray(probs))
    n = 100000
    draws = cat.gumbel_categorical(
        KEY, jnp.broadcast_to(logits, (n, 5)))
    counts = np.bincount(np.asarray(draws), minlength=5)
    chi2 = stats.chisquare(counts, probs * n)
    assert chi2.pvalue > 1e-3, (counts, chi2)


def test_inverse_cdf_matches_gumbel_distribution():
    probs = np.asarray([0.2, 0.3, 0.5])
    n = 50000
    draws = cat.inverse_cdf_categorical(
        KEY, jnp.broadcast_to(jnp.asarray(probs), (n, 3)))
    counts = np.bincount(np.asarray(draws), minlength=3)
    chi2 = stats.chisquare(counts, probs * n)
    assert chi2.pvalue > 1e-3, counts


def test_masked_gumbel_never_selects_masked():
    logits = jnp.zeros((1000, 6))
    mask = jnp.asarray([True, False, True, True, False, True])
    draws = cat.masked_gumbel_categorical(
        KEY, logits, jnp.broadcast_to(mask, (1000, 6)))
    assert not np.isin(np.asarray(draws), [1, 4]).any()


def test_polya_urn_dirichlet_sparse_and_normalised():
    """PolyaUrnTest analogue: rows normalise; zero-count coords can be
    exactly zero (double sparsity, types/PolyaUrnDirichlet.java:23-48)."""
    counts = jnp.asarray([[100, 0, 5, 0, 0, 1, 0, 0, 0, 0]] * 64,
                         jnp.float32)
    probs, zero_mask = rnd.polya_urn_dirichlet(KEY, counts, beta=0.01)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # with beta=0.01 almost all zero-count coordinates stay zero
    assert np.asarray(zero_mask)[:, 1].mean() > 0.9
    np.testing.assert_array_equal(np.asarray(probs)[np.asarray(zero_mask)],
                                  0.0)


def test_conditional_dirichlet_preserves_unmasked_proportions():
    """ConditionalDirichlet (CondDirichletDraw test analogue): coordinates
    outside the mask keep their relative proportions."""
    conc = jnp.full((8,), 2.0)
    prev = rnd.dirichlet(KEY, conc)
    mask = jnp.asarray([True, True, False, False, False, False, False,
                       False])
    out = rnd.conditional_dirichlet(jax.random.fold_in(KEY, 1), prev, conc,
                                    mask)
    np.testing.assert_allclose(float(out.sum()), 1.0, atol=1e-5)
    prev_keep = np.asarray(prev)[2:]
    out_keep = np.asarray(out)[2:]
    np.testing.assert_allclose(out_keep / out_keep.sum(),
                               prev_keep / prev_keep.sum(), rtol=1e-5)


def test_conditional_dirichlet_marginal_distribution():
    """Redrawing a subset many times should reproduce Dirichlet marginal
    moments for the masked block."""
    conc = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    mask = jnp.asarray([True, True, False, False])
    prev = rnd.dirichlet(KEY, conc)

    draws = jax.vmap(
        lambda k: rnd.conditional_dirichlet(k, prev, conc, mask))(
        jax.random.split(KEY, 20000))
    # marginal mean of coord 0 should be conc0/sum = 0.1
    np.testing.assert_allclose(float(draws[:, 0].mean()), 0.1, atol=0.01)
    np.testing.assert_allclose(float(draws[:, 1].mean()), 0.2, atol=0.01)


def test_binomial_poisson_available():
    b = rnd.binomial(KEY, 100.0, 0.3, shape=(10000,))
    assert abs(float(b.mean()) - 30.0) < 1.0
    p = rnd.poisson(KEY, jnp.full((10000,), 4.0))
    assert abs(float(p.mean()) - 4.0) < 0.2


def test_vs_dirichlet_inclusion():
    counts = jnp.asarray([[5, 0, 0, 3, 0, 0, 0, 0]] * 32, jnp.float32)
    probs, zero_mask = rnd.vs_dirichlet(KEY, counts, beta=0.1, vs_prior=0.5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # positive-count coords always included
    assert not np.asarray(zero_mask)[:, [0, 3]].any()
