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


# --- VSDirichlet parity vs a NumPy transliteration of the Java -----------
# (VSDirichlet.java:35-120; VERDICT round-1 item 1)

def _java_vs_inclusion_prob(zero_phi, n_k, beta, vs_prior):
    """NumPy transliteration of calculateIndicatorProbIsOne
    (VSDirichlet.java:96-120). MALLET's logGammaStirling(0) is +inf (its
    shift loop subtracts log(0)), reproduced via the z<=0 guard."""
    from scipy.special import gammaln

    def lg(z):
        return np.inf if z <= 0 else gammaln(z)

    a = zero_phi * beta
    r = np.exp(lg(a + beta) + lg(a + n_k) - lg(a + beta + n_k) - lg(a)) \
        * vs_prior / (1.0 - vs_prior)
    return r / (1.0 + r)   # nan propagates like the Java (handled by caller)


def _java_vs_next_distribution(rng, counts, previous_phi, beta, vs_prior):
    """NumPy transliteration of VSDirichlet.nextDistribution
    (VSDirichlet.java:35-93): sequential zeroPhi chain over the row."""
    n_k = int(counts.sum())
    zero_phi = int((previous_phi == 0.0).sum())
    phi = np.zeros_like(previous_phi)
    for i in range(len(counts)):
        if counts[i] != 0:
            phi[i] = rng.gamma(counts[i] + beta)
        else:
            u = rng.uniform()
            p = _java_vs_inclusion_prob(zero_phi, n_k, beta, vs_prior)
            if u > p:    # NaN compares False -> include branch, like Java
                if previous_phi[i] != 0.0:
                    zero_phi += 1
                phi[i] = 0.0
            else:
                if previous_phi[i] == 0.0:
                    zero_phi -= 1
                phi[i] = rng.gamma(counts[i] + beta)
    return phi / phi.sum()


def test_vs_inclusion_prob_matches_java_formula():
    """vs_inclusion_prob == the Java log-gamma-ratio on a (zeroPhi, n_k)
    grid, including the zeroPhi=0 -> p=0 edge."""
    beta, vs_prior = 0.05, 0.3
    for zero_phi in [0, 1, 3, 10, 100, 5000]:
        for n_k in [1, 5, 50, 2000]:
            got = float(rnd.vs_inclusion_prob(
                jnp.float32(zero_phi), jnp.float32(n_k), beta, vs_prior))
            want = _java_vs_inclusion_prob(zero_phi, n_k, beta, vs_prior)
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7,
                                       err_msg=f"zp={zero_phi} nk={n_k}")
    # empty-topic limit: formula gives exactly vs_prior for zero_phi > 0
    got = float(rnd.vs_inclusion_prob(jnp.float32(4), jnp.float32(0),
                                      beta, vs_prior))
    np.testing.assert_allclose(got, vs_prior, rtol=1e-5)


def test_vs_dirichlet_sequential_matches_java_distribution():
    """Inclusion frequencies + phi moments of the sequential JAX path match
    the Java transliteration on a fixed counts row (chi-square style,
    VERDICT item 1 'done' criterion)."""
    v, reps = 24, 4000
    counts = np.zeros(v, np.float32)
    counts[0], counts[5] = 6, 3
    prev = np.full(v, 1.0 / v, np.float32)
    prev[np.arange(2, v, 3)] = 0.0           # a third previously zero
    beta, vs_prior = 0.1, 0.4

    rng = np.random.default_rng(7)
    java = np.stack([
        _java_vs_next_distribution(rng, counts, prev, beta, vs_prior)
        for _ in range(reps)])

    probs, zero_mask = rnd.vs_dirichlet(
        KEY, jnp.tile(counts, (reps, 1)), beta, vs_prior,
        previous_phi=jnp.tile(prev, (reps, 1)), sequential=True)
    ours = np.asarray(probs)

    zero_coords = counts == 0
    inc_java = (java[:, zero_coords] > 0).mean(0)
    inc_ours = (~np.asarray(zero_mask))[:, zero_coords].mean(0)
    # 4-sigma band for a two-sample proportion at reps=4000 is ~0.04
    np.testing.assert_allclose(inc_ours, inc_java, atol=0.045)
    # phi moments on the always-included coords and total zero-coord mass
    np.testing.assert_allclose(ours[:, ~zero_coords].mean(0),
                               java[:, ~zero_coords].mean(0), atol=0.02)
    np.testing.assert_allclose(ours[:, zero_coords].sum(-1).mean(),
                               java[:, zero_coords].sum(-1).mean(), atol=0.02)


def test_vs_dirichlet_vectorised_close_to_sequential():
    """The default vectorised (fixed per-row zeroPhi) form stays within a
    small drift band of the exact sequential chain — the documented
    systematic-scan approximation."""
    v, reps = 24, 4000
    counts = np.zeros(v, np.float32)
    counts[0], counts[5] = 6, 3
    prev = np.full(v, 1.0 / v, np.float32)
    prev[np.arange(2, v, 3)] = 0.0
    beta, vs_prior = 0.1, 0.4
    cj = jnp.tile(counts, (reps, 1))
    pj = jnp.tile(prev, (reps, 1))
    _, zm_seq = rnd.vs_dirichlet(KEY, cj, beta, vs_prior, previous_phi=pj,
                                 sequential=True)
    _, zm_vec = rnd.vs_dirichlet(KEY, cj, beta, vs_prior, previous_phi=pj)
    zero_coords = counts == 0
    f_seq = (~np.asarray(zm_seq))[:, zero_coords].mean()
    f_vec = (~np.asarray(zm_vec))[:, zero_coords].mean()
    assert abs(f_seq - f_vec) < 0.05, (f_seq, f_vec)


def test_vs_dirichlet_bootstrap_dense_prev_excludes_all_zeros():
    """previous_phi=None (dense bootstrap, zeroPhi=0): the Java posterior
    gives p(I=1) = 0, so every zero-count coord must come out zero."""
    counts = jnp.asarray([[5, 0, 0, 3, 0, 0, 0, 0]] * 8, jnp.float32)
    _, zero_mask = rnd.vs_dirichlet(KEY, counts, beta=0.1, vs_prior=0.5)
    assert np.asarray(zero_mask)[:, [1, 2, 4, 5, 6, 7]].all()
    assert not np.asarray(zero_mask)[:, [0, 3]].any()
