"""Geweke "getting it right" joint-distribution validation (Geweke 2004).

The strongest correctness check an MCMC sampler can pass, and one the
reference has no analogue of: two simulators of the SAME joint
distribution p(theta, phi, z, w) must agree —

  marginal-conditional (MC):  phi ~ Dir(beta), theta_d ~ Dir(alpha),
      z_i ~ Cat(theta_d), w_i ~ Cat(phi_z)   (iid ancestral draws)
  successive-conditional (SC): alternate the sampler's transition
      (z, theta, phi | w) with a data-replication draw w_i ~ Cat(phi_z).

If and only if the transition kernel leaves p(latents | w) invariant do
the two sequences share every marginal. Subtle conditional bugs (wrong
count exclusion, swapped axes, stale-by-one updates, biased categorical
draws) surface as marginal mismatches in exactly this test — the
deliberately invalid `ggs_test` scheme is kept as the negative control
proving the test has the power to reject a broken kernel.

The SC chain drives the real model classes end to end — `sample(1)` on
the compiled step — with `swap_corpus_tokens` (models/base.py) replacing
the tokens between transitions without recompiling.

Statistics: SC draws are autocorrelated, so plain two-sample tests
over-reject. Agreement is asserted the way Geweke's paper does it —
z-scores of the MC-vs-SC mean difference with a batch-means standard
error for the SC series — plus a KS shape check on heavily thinned
draws at a permissive threshold. Seeds are fixed; the test is
deterministic.
"""

import numpy as np
import pytest
from scipy import stats as sps

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.registry import create_model

D, L, V, K = 6, 8, 8, 2
ALPHA, BETA = 0.8, 0.6
VOCAB = [f"w{i}" for i in range(V)]
STATS = ["theta00", "phi00", "frac_z0", "frac_w0"]


def _stats(theta00, phi00, z, w):
    return (theta00, phi00, float(np.mean(z == 0)), float(np.mean(w == 0)))


def _mc_draws(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        phi = rng.dirichlet(np.full(V, BETA), K)          # [K, V]
        theta = rng.dirichlet(np.full(K, ALPHA), D)       # [D, K]
        z = np.array([rng.choice(K, p=theta[d]) for d in range(D)
                      for _ in range(L)])
        w = np.array([rng.choice(V, p=phi[k]) for k in z])
        out.append(_stats(theta[0, 0], phi[0, 0], z, w))
    return np.array(out)


def _resample_w(rng, phi, z):
    """w_i ~ Cat(phi[z_i]) vectorised (phi rows renormalised in f64)."""
    p = phi[z].astype(np.float64)
    cdf = np.cumsum(p, axis=1)
    u = rng.random(len(z)) * cdf[:, -1]
    return np.minimum((cdf <= u[:, None]).sum(axis=1), V - 1).astype(np.int32)


def _corpus(w):
    return Corpus.from_token_lists(
        [list(w[d * L:(d + 1) * L]) for d in range(D)], VOCAB)


def _sc_series(scheme, steps, burn, seed):
    """Post-burn-in series of the 4 statistics from one SC chain."""
    rng = np.random.default_rng(seed)
    # start from an ancestral draw (burn-in still applied)
    phi0 = rng.dirichlet(np.full(V, BETA), K)
    theta0 = rng.dirichlet(np.full(K, ALPHA), D)
    z = np.array([rng.choice(K, p=theta0[d]) for d in range(D)
                  for _ in range(L)]).astype(np.int32)
    w = np.array([rng.choice(V, p=phi0[k]) for k in z], np.int32)
    m = create_model(LDAConfig(scheme=scheme, topics=K, alpha=ALPHA,
                               beta=BETA, seed=seed, exec_time=-1))
    m.add_instances(_corpus(w))
    m.set_z_indicators(z)
    out = []
    for s in range(steps):
        m.sample(1)
        z = m.get_z_indicators()
        phi = m.get_phi()[:K]                              # [K, V]
        theta00 = (float(np.asarray(m.state.theta)[0, 0])
                   if getattr(m.state, "theta", None) is not None
                   else np.nan)
        if s >= burn:
            out.append(_stats(theta00, phi[0, 0], z, w))
        w = _resample_w(rng, phi, z)
        m.swap_corpus_tokens(_corpus(w))
    return np.array(out)


def _geweke_z(mc_col, sc_col, nbatch=20):
    """Mean-difference z-score with a batch-means SC standard error
    (Geweke 2004 eq. 3 style): batch means of the autocorrelated SC
    series are near-independent once batches span many mixing times."""
    n = len(sc_col) // nbatch * nbatch
    bm = sc_col[:n].reshape(nbatch, -1).mean(axis=1)
    se2 = mc_col.var() / len(mc_col) + bm.var(ddof=1) / nbatch
    return float((mc_col.mean() - sc_col.mean()) / np.sqrt(se2))


def _agree(mc, sc, cols, label, zmax=5.0, ks_alpha=1e-4, thin=20):
    for i in cols:
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < zmax, (label, STATS[i], z,
                               mc[:, i].mean(), sc[:, i].mean())
        p = sps.ks_2samp(mc[:, i], sc[::thin, i]).pvalue
        assert p > ks_alpha, (label, STATS[i], p)


def test_geweke_ggs():
    """GGS transition (theta | z -> z | theta, phi -> phi | z, w) leaves
    the joint invariant: MC vs SC marginals of theta_00, phi_00, topic-0
    token fraction and word-0 frequency agree."""
    mc = _mc_draws(4000, seed=101)
    sc = _sc_series("ggs", steps=2600, burn=200, seed=202)
    _agree(mc, sc, [0, 1, 2, 3], "ggs")


def test_geweke_ggs_test_variant_fails():
    """The deliberately invalid ggs_test variant (stale theta,
    LDAGroupedGibbsSamplerTest.java:2) must NOT pass the same check —
    the test's power comes from rejecting a known-broken kernel. Theta
    is never redrawn, so the theta_00 series is a constant and its
    Geweke z-score diverges."""
    mc = _mc_draws(4000, seed=103)
    sc = _sc_series("ggs_test", steps=1200, burn=200, seed=204)
    zs = [abs(_geweke_z(mc[:, i], sc[:, i])) for i in range(4)]
    assert max(zs) > 10.0, zs


def test_geweke_pcgs():
    """PCGS transition (z | phi with in-document sequential n_dk updates
    -> phi | z, w) leaves the collapsed-theta joint invariant (phi_00,
    topic-0 fraction, word-0 frequency; no theta in the PCGS state)."""
    mc = _mc_draws(4000, seed=105)
    sc = _sc_series("pcgs", steps=2600, burn=200, seed=206)
    _agree(mc, sc, [1, 2, 3], "pcgs")


def test_geweke_cgs():
    """The serial collapsed oracle closes the loop: the collapsed z-sweep
    (z_i | z_-i, w) leaves p(z | w) invariant, and the augmented phi /
    theta draws (cgs.py::_step) are exact conditionals, so the composite
    with w ~ Cat(phi_z) must reproduce the ancestral joint — all four
    statistics."""
    mc = _mc_draws(4000, seed=107)
    sc = _sc_series("collapsed", steps=2600, burn=200, seed=208)
    _agree(mc, sc, [0, 1, 2, 3], "collapsed")


def test_geweke_lightpclda():
    """LightLDA-style Metropolis-Hastings within Gibbs: the word-proposal /
    doc-proposal MH z-steps must leave the target invariant (acceptance-
    ratio bugs are exactly what a Geweke run flags), then phi | z, w.
    No theta in the MH family's state."""
    mc = _mc_draws(4000, seed=109)
    sc = _sc_series("lightpclda", steps=2600, burn=200, seed=210)
    _agree(mc, sc, [1, 2, 3], "lightpclda")


def test_geweke_uncollapsed_unsmoothed_phi_deviates():
    """Second negative control, straight from the reference's own code
    comment: UncollapsedParallelLDA samples phi ~ Dir(n_k) WITHOUT beta
    smoothing — flagged incorrect in the reference itself
    (UncollapsedParallelLDA.java:1313-1315) and reproduced faithfully by
    scheme `uncollapsed` (smooth_phi=False). Against the beta-smoothed
    joint, its phi marginal must deviate — and the Geweke harness must
    detect that."""
    mc = _mc_draws(4000, seed=111)
    sc = _sc_series("uncollapsed", steps=1200, burn=200, seed=212)
    zs = [abs(_geweke_z(mc[:, i], sc[:, i])) for i in [1, 2, 3]]
    assert max(zs) > 10.0, zs
