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

# Geweke chains are thousands of sampler steps each: the whole module is
# the SLOW tier (round-3 VERDICT item 7 — the default `pytest -q` run
# is ~20 min on this 2-vCPU host vs ~73 min for the full suite;
# `pytest -m "not tpu" tests/` runs everything)
pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------------------
# Round-2 VERDICT item 2: the three families outside the original harness.
# Each test either passes `_agree` or asserts + documents a measured
# deviation (the way the negative controls do).
# ---------------------------------------------------------------------------

def _sc_series_ex(scheme, steps, burn, seed, stat_fn, k_eff=K,
                  cfg_kw=None, model_patch=None):
    """Generalised SC chain: custom topic count, config keys, per-step
    statistic function `stat_fn(model, phi, z, w)` and a model patch hook
    (e.g. enabling the sequential VS mode)."""
    rng = np.random.default_rng(seed)
    phi0 = rng.dirichlet(np.full(V, BETA), k_eff)
    theta0 = rng.dirichlet(np.full(k_eff, 1.0), D)
    z = np.array([rng.choice(k_eff, p=theta0[d]) for d in range(D)
                  for _ in range(L)]).astype(np.int32)
    w = np.array([rng.choice(V, p=phi0[k]) for k in z], np.int32)
    kw = dict(alpha=ALPHA, beta=BETA)
    kw.update(cfg_kw or {})
    m = create_model(LDAConfig(scheme=scheme, topics=k_eff, seed=seed,
                               exec_time=-1, **kw))
    if model_patch:
        model_patch(m)
    m.add_instances(_corpus(w))
    m.set_z_indicators(z)
    out = []
    for s in range(steps):
        m.sample(1)
        z = m.get_z_indicators()
        phi = m.get_phi()[:k_eff]
        if s >= burn:
            out.append(stat_fn(m, phi, z, w))
        w = _resample_w(rng, phi, z)
        m.swap_corpus_tokens(_corpus(w))
    return np.array(out)


def _stats4(m, phi, z, w):
    return (phi[0, 0], float(np.mean(z == 0)), float(np.mean(w == 0)),
            float(np.mean(phi == 0.0)))


def _zs(mc, sc, cols):
    return {i: _geweke_z(mc[:, i], sc[:, i]) for i in cols}


def test_geweke_nzvsspalias_sequential():
    """VS (spike-and-slab) phi, exact-Java sequential-zeroPhi chain
    (`vs_sequential = True`, ops/random.py:293-312 vs
    VSDirichlet.java:35-93) against the proper spike-and-slab joint:
    I_kv ~ Bern(pi) (rows conditioned nonempty), phi_k ~ Dir(beta) on the
    included support, theta ~ Dir(alpha), z, w ancestral.

    Measured agreement: phi_00, topic-0 fraction and word-0 frequency all
    match (|z| < 5, KS passes). The phi-ZERO-fraction carries a small
    measured bias (z ~ +4..6; SC ~0.48 vs MC ~0.50): the reference's
    inclusion posterior uses a = beta * #currently-zero coords
    (VSDirichlet.java:96-120) where the exact conditional of the
    spike-and-slab joint would use beta * #included coords — a
    deliberate reference-faithful approximation, asserted as a bounded
    deviation here rather than hidden by a loose threshold."""
    pi = 0.5
    rng = np.random.default_rng(301)
    out = []
    for _ in range(4000):
        inc = rng.random((K, V)) < pi
        while not (inc.sum(axis=1) > 0).all():
            inc = rng.random((K, V)) < pi
        phi = np.zeros((K, V))
        for k in range(K):
            s = np.flatnonzero(inc[k])
            phi[k, s] = rng.dirichlet(np.full(len(s), BETA))
        theta = rng.dirichlet(np.full(K, ALPHA), D)
        z = np.array([rng.choice(K, p=theta[d]) for d in range(D)
                      for _ in range(L)])
        w = np.array([rng.choice(V, p=phi[k]) for k in z])
        out.append(_stats4(None, phi, z, w))
    mc = np.array(out)

    def patch(m):
        m.vs_sequential = True
    sc = _sc_series_ex("nzvsspalias", steps=2000, burn=200, seed=302,
                       stat_fn=_stats4, model_patch=patch)
    # stats 0-2 (phi00 / frac_z0 / frac_w0): full agreement
    for i in (0, 1, 2):
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < 5.0, (i, z)
        assert sps.ks_2samp(mc[:, i], sc[::20, i]).pvalue > 1e-4, i
    # stat 3 (phi zero fraction): small measured bias, bounded
    z3 = _geweke_z(mc[:, 3], sc[:, 3])
    assert 0.0 < abs(z3) < 9.0, z3
    assert abs(mc[:, 3].mean() - sc[:, 3].mean()) < 0.05, (
        mc[:, 3].mean(), sc[:, 3].mean())


def test_geweke_polyaurn_phi_atoms():
    """Polya-Urn LDA (Terenin et al.): phi rows are NORMALISED POISSON
    counts (types/PolyaUrnDirichlet.java:23-48) — an approximation of
    Dir(beta + n) whose bias this run quantifies. Measured: every MEAN
    agrees with the plain-LDA joint (|z| < 5 on phi00 / frac_z0 /
    frac_w0) — the approximation is unbiased in expectation at this
    scale — but the phi00 MARGINAL SHAPE deviates: the Poisson draw
    places an atom at exactly 0 (P(c=0) = e^-(beta+n)), so the SC chain
    has a ~23% phi-zero fraction where the Dirichlet joint has none, and
    the phi00 KS test must reject. Both facts are asserted."""
    # _mc_draws columns are (theta00, phi00, frac_z0, frac_w0); drop
    # theta00 to align with _stats4's (phi00, frac_z0, frac_w0, ...)
    mc = _mc_draws(4000, seed=303)[:, [1, 2, 3]]
    frac_zero_mc = 0.0  # Dirichlet draws are almost-surely positive
    sc = _sc_series_ex("polyaurn", steps=2000, burn=200, seed=304,
                       stat_fn=_stats4)
    for i in (0, 1, 2):
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < 5.0, (i, z)
    # z-level / word-level shapes agree
    for i in (1, 2):
        assert sps.ks_2samp(mc[:, i], sc[::20, i]).pvalue > 1e-4, i
    # the documented deviation: atoms at zero in phi
    assert sc[:, 3].mean() > 0.1, sc[:, 3].mean()   # ~23% measured
    assert sc[:, 3].mean() - frac_zero_mc > 0.1
    assert sps.ks_2samp(mc[:, 0], sc[::20, 0]).pvalue < 1e-3


def test_geweke_hdp_all_topics():
    """HDP (`ppu_hdplda_all_topics`): truncated-GEM psi, theta collapsed
    out of the PCGS sweep (conditional (n_dk + alpha0 psi_k) phi_kw),
    Antoniak table counts via the binomial decomposition
    (hdp.py::sample_table_counts vs PoissonPolyaUrnHDPLDA.java:1112-1160),
    psi ~ GEM posterior given tables, phi ~ Polya-Urn.

    MC simulator: psi from the same truncated-normalised stick prior
    (nu_k ~ Beta(1, gamma)), phi_k ~ Dir(beta), theta_d ~ Dir(alpha0
    psi), z, w ancestral. Measured: psi_0, topic-0 fraction, word-0
    frequency and the phi00 MEAN all agree (|z| < 5) — certifying the
    table-count/psi pipeline — while the phi00 SHAPE carries the same
    Polya-Urn atom-at-zero deviation as scheme `polyaurn` (asserted)."""
    kmax, alpha0, gamma = 4, 2.0, 1.0
    rng = np.random.default_rng(305)
    out = []
    for _ in range(4000):
        b = np.clip(rng.beta(1.0, gamma, kmax), 1e-7, 1 - 1e-7)
        psi = b * np.concatenate([[1.0], np.cumprod(1 - b)[:-1]])
        psi = psi / psi.sum()
        phi = rng.dirichlet(np.full(V, BETA), kmax)
        sh = rng.gamma(np.maximum(alpha0 * psi, 1e-8), 1.0, (D, kmax))
        theta = sh / np.maximum(sh.sum(axis=1, keepdims=True), 1e-300)
        z = np.array([rng.choice(kmax, p=theta[d]) for d in range(D)
                      for _ in range(L)])
        w = np.array([rng.choice(V, p=phi[k]) for k in z])
        out.append((phi[0, 0], float(np.mean(z == 0)),
                    float(np.mean(w == 0)), float(psi[0])))
    mc = np.array(out)

    def hdp_stats(m, phi, z, w):
        return (phi[0, 0], float(np.mean(z == 0)), float(np.mean(w == 0)),
                float(np.asarray(m.state.psi)[0]))
    sc = _sc_series_ex("ppu_hdplda_all_topics", steps=2000, burn=200,
                       seed=306, stat_fn=hdp_stats, k_eff=kmax,
                       cfg_kw=dict(alpha=alpha0, hdp_gamma=gamma,
                                   hdp_start_topics=kmax))
    for i in range(4):
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < 5.0, (i, z)
    for i in (1, 2, 3):
        assert sps.ks_2samp(mc[:, i], sc[::20, i]).pvalue > 1e-4, i
    # phi00 shape: the Polya-Urn atom-at-zero (same deviation family as
    # test_geweke_polyaurn_phi_atoms)
    assert sps.ks_2samp(mc[:, 0], sc[::20, 0]).pvalue < 1e-3


def test_geweke_lightpclda_w2_count_proposal():
    """LightPCLDAtypeTopicProposal (scheme `lightpcldaw2`): the word
    proposal comes from type-topic COUNTS (nonZeroTypeTopics /
    topicCountBetaHat, LightPCLDAtypeTopicProposal.java:23-53) instead
    of phi — a different proposal distribution whose acceptance ratio
    must still leave the target invariant. Measured: phi00 / frac_z0 /
    frac_w0 all agree (|z| <= ~1.5, KS healthy)."""
    mc = _mc_draws(4000, seed=307)[:, [1, 2, 3]]
    sc = _sc_series_ex("lightpcldaw2", steps=2000, burn=200, seed=308,
                       stat_fn=_stats4)
    for i in (0, 1, 2):
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < 5.0, (i, z)
        assert sps.ks_2samp(mc[:, i], sc[::20, i]).pvalue > 1e-4, i


def test_geweke_lightcollapsed():
    """CollapsedLightLDA (scheme `lightcollapsed`): fully-collapsed
    MH — count-based word proposal + doc proposal from the doc's own
    topic sequence, acceptance against the collapsed target
    (CollapsedLightLDA.java:895-1137). At this corpus size the
    sweep-staleness is negligible and the transition must reproduce the
    joint. Measured: |z| <= ~1.3, KS healthy on all three statistics."""
    mc = _mc_draws(4000, seed=307)[:, [1, 2, 3]]
    sc = _sc_series_ex("lightcollapsed", steps=2000, burn=200, seed=310,
                       stat_fn=_stats4)
    for i in (0, 1, 2):
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < 5.0, (i, z)
        assert sps.ks_2samp(mc[:, i], sc[::20, i]).pvalue > 1e-4, i


# ---------------------------------------------------------------------------
# Round-3 VERDICT item 4: the fused kernel BODIES inside the joint harness.
# zdraw_kernel="interpret" runs the ACTUAL Pallas chunk bodies under the
# pltpu interpreter with real uniforms injected via the u24 operand
# (models/fused_sweep.py), so these chains validate the kernel code paths
# themselves — not the XLA fallback the other tests drive.
# ---------------------------------------------------------------------------

def test_geweke_pcgs_ktiled_interpret(monkeypatch):
    """The K-tiled STREAMED chunk body (ops/pallas_pcgs.py, engages at
    kpad >= KTILE_MIN in production) forced on at K=2 via _force_ktile
    + a shrunken resident budget: the tiled staging through probs_buf,
    the per-tile running-offset cdf and the per-tile delta updates sit
    inside the validated transition. Complements
    test_ktiled_body_equals_untiled (bit-equality at 2 K-tiles)."""
    from ldagroupedgibbssampler_tpu.models import fused_sweep as fs
    monkeypatch.setattr(fs, "_FUSED_PCGS_VMEM_BUDGET", 1)

    def patch(m):
        m._force_ktile = True
    mc = _mc_draws(4000, seed=501)[:, [1, 2, 3]]
    sc = _sc_series_ex("pcgs", steps=1400, burn=200, seed=502,
                       stat_fn=_stats4,
                       cfg_kw=dict(zdraw_kernel="interpret"),
                       model_patch=patch)
    for i in (0, 1, 2):
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < 5.0, (i, z)
        assert sps.ks_2samp(mc[:, i], sc[::20, i]).pvalue > 1e-4, i


def test_geweke_adlda_collapsed_interpret():
    """The collapsed live-count (ADLDA-serving) RESIDENT body: the
    conditional (n_dk + alpha)(beta + N_kw - own)/(V beta + n_k - own)
    with N_kw/n_k live across chunks and stale only WITHIN one 128-token
    chunk — a MEASURED-DEVIATION family (like `polyaurn`), not an exact
    chain. At this harness scale each sequential-safe chunk holds up to
    D=6 tokens (one per doc), i.e. 12.5% of the 48-token corpus draws
    against counts stale by the rest of its chunk — proportionally FAR
    larger than production shapes (128 of ~1.35M tokens), and still far
    smaller than the reference's full-sweep cross-worker staleness
    (ADLDA.java:176-332). Measured (1400 steps, seeds 503/504): the
    staleness flattens the word/topic concentration slightly — phi00
    z ~ +5.1 (SC 0.088 vs MC 0.127), frac_w0 z ~ +3.5 (SC 0.095 vs MC
    0.127), frac_z0 z ~ +2.1 — a bounded bias this test pins in
    direction and size so a staleness regression (e.g. deltas applied a
    chunk late) is caught."""
    mc = _mc_draws(4000, seed=503)[:, [1, 2, 3]]
    sc = _sc_series_ex("adlda", steps=1400, burn=200, seed=504,
                       stat_fn=_stats4,
                       cfg_kw=dict(zdraw_kernel="interpret"))
    zs = [_geweke_z(mc[:, i], sc[:, i]) for i in (0, 1, 2)]
    # bounded deviation, documented direction (SC means below MC)
    for i, z in enumerate(zs):
        assert 0.0 < z < 9.0, (i, z)
        assert sc[:, i].mean() < mc[:, i].mean(), i
    # absolute bias stays small
    assert abs(mc[:, 0].mean() - sc[:, 0].mean()) < 0.06
    assert abs(mc[:, 2].mean() - sc[:, 2].mean()) < 0.06


# ---------------------------------------------------------------------------
# Round-3 VERDICT item 3: the DYNAMIC-K HDP chains (topic birth/death)
# in the joint harness. The marginal-conditional simulator draws from the
# truncated-GEM prior process (the same joint the fixed-K
# `ppu_hdplda_all_topics` test validates against); the dynamic chains'
# birth/death is a heuristic approximation the reference never validates
# — these tests MEASURE its deviation and pin both the agreeing marginals
# and the direction/size of the documented deviations.
# ---------------------------------------------------------------------------

HDP_KMAX, HDP_ALPHA0, HDP_GAMMA = 4, 2.0, 1.0
HDP_STATS = ["phi00", "frac_z0", "frac_w0", "psi0", "occupancy"]


def _hdp_mc_draws(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        b = np.clip(rng.beta(1.0, HDP_GAMMA, HDP_KMAX), 1e-7, 1 - 1e-7)
        psi = b * np.concatenate([[1.0], np.cumprod(1 - b)[:-1]])
        psi = psi / psi.sum()
        phi = rng.dirichlet(np.full(V, BETA), HDP_KMAX)
        sh = rng.gamma(np.maximum(HDP_ALPHA0 * psi, 1e-8), 1.0,
                       (D, HDP_KMAX))
        theta = sh / np.maximum(sh.sum(axis=1, keepdims=True), 1e-300)
        z = np.array([rng.choice(HDP_KMAX, p=theta[d]) for d in range(D)
                      for _ in range(L)])
        w = np.array([rng.choice(V, p=phi[k]) for k in z])
        out.append((phi[0, 0], float(np.mean(z == 0)),
                    float(np.mean(w == 0)), float(psi[0]),
                    float(len(np.unique(z)))))
    return np.array(out)


def _hdp_sc_series(scheme, steps, burn, seed):
    rng = np.random.default_rng(seed)
    b = np.clip(rng.beta(1.0, HDP_GAMMA, HDP_KMAX), 1e-7, 1 - 1e-7)
    psi0 = b * np.concatenate([[1.0], np.cumprod(1 - b)[:-1]])
    psi0 = psi0 / psi0.sum()
    phi0 = rng.dirichlet(np.full(V, BETA), HDP_KMAX)
    sh = rng.gamma(np.maximum(HDP_ALPHA0 * psi0, 1e-8), 1.0, (D, HDP_KMAX))
    theta0 = sh / sh.sum(axis=1, keepdims=True)
    z = np.array([rng.choice(HDP_KMAX, p=theta0[d]) for d in range(D)
                  for _ in range(L)]).astype(np.int32)
    w = np.array([rng.choice(V, p=phi0[k]) for k in z], np.int32)
    m = create_model(LDAConfig(scheme=scheme, topics=HDP_KMAX,
                               alpha=HDP_ALPHA0, beta=BETA, seed=seed,
                               exec_time=-1, hdp_gamma=HDP_GAMMA,
                               hdp_start_topics=HDP_KMAX))
    m.add_instances(_corpus(w))
    m.set_z_indicators(z)
    out = []
    for s in range(steps):
        m.sample(1)
        z = m.get_z_indicators()
        phi = m.get_phi()[:HDP_KMAX]
        if s >= burn:
            out.append((phi[0, 0], float(np.mean(z == 0)),
                        float(np.mean(w == 0)),
                        float(np.asarray(m.state.psi)[0]),
                        float(len(np.unique(z)))))
        # after a sweep no token sits on a dead (phi-zeroed) topic, so
        # the data-replication draw is well-defined
        w = _resample_w(rng, phi, z)
        m.swap_corpus_tokens(_corpus(w))
    return np.array(out)


def test_geweke_hdp_dynamic_birth_death():
    """`ppu_hdplda` (dynamic active set, geometric Gamma births,
    PoissonPolyaUrnHDPLDA.java:565-625): word-level marginals (phi00,
    frac_w0) agree with the truncated-GEM joint, while the birth/death
    heuristic CONCENTRATES topic mass — once a high-index topic dies it
    is rarely reborn (the geometric index prior favours low indices), so
    the occupied-topic count sits far BELOW the ancestral draw
    (measured: SC ~1.57 occupied vs MC ~2.97, Geweke z ~ +16) and the
    surviving topic-0 share (psi_0, frac_z0) correspondingly ABOVE
    (SC ~0.75-0.77 vs MC ~0.53). The reference has the same dynamics —
    this test pins the deviation's direction and size so a birth/death
    regression (e.g. births stopping entirely, or death of non-empty
    topics) is caught. The mathematical pieces this chain composes are
    validated with EXACT-agreement criteria in
    test_hdp_sample_table_counts_antoniak_exact (sampleL) and
    test_hdp_gem_psi_exact / test_hdp_poisson_psi_exact (psi
    conditionals) below — the pinned deviation here is the birth/death
    *policy*, not those pieces."""
    mc = _hdp_mc_draws(4000, 601)
    sc = _hdp_sc_series("ppu_hdplda", steps=2000, burn=200, seed=602)
    for i, zmax in ((0, 5.0), (2, 5.0)):        # phi00, frac_w0 agree
        z = _geweke_z(mc[:, i], sc[:, i])
        assert abs(z) < zmax, (HDP_STATS[i], z)
    # documented concentration deviation, direction + size pinned
    z_occ = _geweke_z(mc[:, 4], sc[:, 4])
    assert z_occ > 8.0, z_occ                   # SC occupancy below MC
    assert 1.0 <= sc[:, 4].mean() < mc[:, 4].mean(), sc[:, 4].mean()
    assert sc[:, 3].mean() > mc[:, 3].mean(), (  # psi0 elevated
        sc[:, 3].mean(), mc[:, 3].mean())
    assert sc[:, 1].mean() > mc[:, 1].mean()     # frac_z0 elevated


def test_geweke_hlda_dynamic_contiguous_growth():
    """`ppu_hlda` (contiguous growth, Poisson psi,
    PoissonPolyaUrnHLDA.java:300,846): frac_w0 agrees, while the
    Poisson-psi + contiguous-rebirth dynamic SPREADS topic mass — reborn
    low slots carry a pseudo-table (eta += 1) so psi_0 and the topic-0
    token share sit far BELOW the size-ordered GEM ancestral draw
    (measured: psi0 SC ~0.19 vs MC ~0.53, z ~ +11; frac_z0 SC ~0.18,
    z ~ +10), with occupancy mildly ABOVE (z ~ -3.5). Direction and
    size pinned as the documented deviation. The composed pieces
    (sampleL with concentration gamma, Poisson psi) are validated
    exactly in test_hdp_sample_table_counts_antoniak_exact and
    test_hdp_poisson_psi_exact below."""
    mc = _hdp_mc_draws(4000, 601)
    sc = _hdp_sc_series("ppu_hlda", steps=2000, burn=200, seed=602)
    z_w0 = _geweke_z(mc[:, 2], sc[:, 2])
    assert abs(z_w0) < 5.0, z_w0
    z_psi = _geweke_z(mc[:, 3], sc[:, 3])
    assert z_psi > 5.0, z_psi                    # psi0 depressed
    assert sc[:, 3].mean() < mc[:, 3].mean()
    z_z0 = _geweke_z(mc[:, 1], sc[:, 1])
    assert z_z0 > 5.0, z_z0                      # frac_z0 depressed
    # occupancy close (mildly above): the growth mechanism keeps slots
    # occupied rather than concentrating
    z_occ = _geweke_z(mc[:, 4], sc[:, 4])
    assert abs(z_occ) < 8.0, z_occ
    assert sc[:, 4].mean() >= mc[:, 4].mean() - 0.5


def test_geweke_ggs_aliasmh():
    """`ggs_aliasmh` (round 4): the O(1)-per-token alias-MH z-step on
    the grouped target — theta exact, z via count-proposal MH rounds
    (word proposal q ∝ N_kw^entry + beta, doc proposal q ∝ n_dk^entry +
    alpha, LightPCLDAtypeTopicProposal.java:23-53 / LightPCLDA doc
    bucket), phi exact. A valid MH-within-Gibbs kernel must leave the
    SAME joint invariant as exact GGS — acceptance-ratio or
    entry-snapshot bugs (e.g. proposing from live z instead of the sweep
    entry without density correction) are exactly what this run flags."""
    mc = _mc_draws(4000, seed=601)
    sc = _sc_series("ggs_aliasmh", steps=2600, burn=200, seed=602)
    _agree(mc, sc, [0, 1, 2, 3], "ggs_aliasmh")


# ----------------------------------------------------------------------
# Fixed-dimension HDP piece validation (round-4 VERDICT item 5): the
# dynamic-K chains above pin large birth/death deviations; these tests
# validate the two mathematical pieces those chains are built from —
# the Antoniak table draws (sampleL) and the psi conditionals — in
# ISOLATION, with exact agreement as the pass criterion.
# ----------------------------------------------------------------------

def _stirling_unsigned(n):
    """Unsigned Stirling numbers of the first kind S[m][l], m,l <= n."""
    S = np.zeros((n + 1, n + 1))
    S[0, 0] = 1.0
    for m in range(1, n + 1):
        for l in range(1, m + 1):
            S[m, l] = S[m - 1, l - 1] + (m - 1) * S[m - 1, l]
    return S


def _antoniak_pmf(n, a):
    """P(L = l | n customers, concentration a) = S(n,l) a^l / (a)_n."""
    S = _stirling_unsigned(n)
    ls = np.arange(n + 1)
    rising = np.prod(a + np.arange(n))
    pmf = S[n] * a ** ls / rising
    return pmf / pmf.sum()


def test_hdp_sample_table_counts_antoniak_exact():
    """`sample_table_counts` (models/hdp.py — the [K, M] >=j-histogram
    binomial aggregation of DocTopicTokenFreqTable + sampleL,
    PoissonPolyaUrnHDPLDA.java:1112-1160) draws EXACT Antoniak table
    counts: (1) single doc vs the analytic Antoniak pmf (unsigned
    Stirling numbers) by chi-square; (2) multi-doc aggregation vs an
    independent numpy per-doc sequential-Bernoulli CRP simulation
    (the reference's own per-doc construction) by moment z-tests and
    KS. Exact agreement required — no pinned deviations."""
    import jax
    import jax.numpy as jnp

    from ldagroupedgibbssampler_tpu.models.hdp import sample_table_counts

    # --- (1) single doc, n = 6 customers, a = 0.7
    n_cust, a = 6, 0.7
    ndk1 = jnp.asarray([[n_cust]], jnp.int32)
    keys = jax.random.split(jax.random.key(11), 20000)
    draws1 = np.asarray(jax.vmap(
        lambda k: sample_table_counts(k, ndk1, jnp.asarray([a]), n_cust)
    )(keys))[:, 0]
    pmf = _antoniak_pmf(n_cust, a)
    obs = np.bincount(draws1.astype(int), minlength=n_cust + 1).astype(
        float)
    exp = pmf * len(draws1)
    keep = exp > 5
    chi2 = float(((obs[keep] - exp[keep]) ** 2 / exp[keep]).sum())
    df = int(keep.sum()) - 1
    p = 1.0 - sps.chi2.cdf(chi2, df)
    assert p > 1e-4, (chi2, df, p, obs, exp)

    # --- (2) multi-doc aggregation, K = 3 topics, 40 docs
    rng = np.random.default_rng(7)
    ndk = rng.integers(0, 7, size=(40, 3)).astype(np.int32)
    avec = np.array([0.4, 1.3, 2.5], np.float32)
    m = int(ndk.max())
    keys = jax.random.split(jax.random.key(12), 8000)
    ours = np.asarray(jax.vmap(
        lambda k: sample_table_counts(k, jnp.asarray(ndk),
                                      jnp.asarray(avec), m))(keys))

    # independent per-doc sequential CRP: l_dk = sum_j Bern(a/(a+j-1))
    nref = 8000
    ref = np.zeros((nref, 3))
    for t in range(3):
        aa = float(avec[t])
        counts = ndk[:, t]
        # total Bernoulli trials per j-level: #docs with count >= j
        ge = np.array([(counts >= j).sum() for j in range(1, m + 1)])
        ps = aa / (aa + np.arange(m))            # j = 1..m -> a/(a+j-1)
        ref[:, t] = sum(rng.binomial(int(g), p, size=nref)
                        for g, p in zip(ge, ps))
    for t in range(3):
        zm = ((ours[:, t].mean() - ref[:, t].mean())
              / np.sqrt(ours[:, t].var() / len(ours)
                        + ref[:, t].var() / nref))
        assert abs(zm) < 5.0, (t, zm)
        ks = sps.ks_2samp(ours[:, t], ref[:, t]).pvalue
        assert ks > 1e-4, (t, ks)


def test_hdp_gem_psi_exact():
    """`gem_psi` (models/hdp.py — GEMBasedPsiSampler,
    PoissonPolyaUrnHDPLDA.java:402-500) matches an independent numpy
    implementation of the stick-breaking posterior nu_k ~ Beta(1 + l_k,
    gamma + sum_{j>k} l_j), psi = normalised sticks: per-component mean
    z-tests + KS on psi_0 and psi_{K-1}. Exact agreement required —
    index/cumsum bugs (reversed rest sums, off-by-one stick products)
    are exactly what this flags."""
    import jax
    import jax.numpy as jnp

    from ldagroupedgibbssampler_tpu.models.hdp import gem_psi

    tables = np.array([9.0, 0.0, 4.0, 1.0], np.float32)
    gamma = 1.3
    keys = jax.random.split(jax.random.key(21), 20000)
    ours = np.asarray(jax.vmap(
        lambda k: gem_psi(k, jnp.asarray(tables), gamma))(keys))

    rng = np.random.default_rng(22)
    nref = 20000
    rest = np.concatenate([np.cumsum(tables[::-1])[::-1][1:], [0.0]])
    b = rng.beta(1.0 + tables, gamma + rest, size=(nref, 4))
    b = np.clip(b, 1e-7, 1 - 1e-7)
    sticks = b * np.concatenate(
        [np.ones((nref, 1)), np.cumprod(1 - b, axis=1)[:, :-1]], axis=1)
    ref = sticks / sticks.sum(axis=1, keepdims=True)

    for t in range(4):
        zm = ((ours[:, t].mean() - ref[:, t].mean())
              / np.sqrt(ours[:, t].var() / len(ours)
                        + ref[:, t].var() / nref))
        assert abs(zm) < 5.0, (t, zm, ours[:, t].mean(), ref[:, t].mean())
    for t in (0, 3):
        ks = sps.ks_2samp(ours[:, t], ref[:, t]).pvalue
        assert ks > 1e-4, (t, ks)


def test_hdp_poisson_psi_exact():
    """`poisson_psi` (models/hdp.py — PoissonBasedPsiSampler,
    PoissonPolyaUrnHDPLDA.java:342-400) matches an independent numpy
    implementation (eta_k ~ Poisson(l_k) + birth increments,
    normalised): per-component mean z-tests + KS. Exact agreement
    required."""
    import jax
    import jax.numpy as jnp

    from ldagroupedgibbssampler_tpu.models.hdp import poisson_psi

    tables = np.array([6.0, 0.0, 2.0], np.float32)
    births = np.array([0, 1, 0], np.int32)
    keys = jax.random.split(jax.random.key(31), 20000)
    ours = np.asarray(jax.vmap(
        lambda k: poisson_psi(k, jnp.asarray(tables),
                              jnp.asarray(births, jnp.float32)))(keys))

    rng = np.random.default_rng(32)
    nref = 20000
    eta = rng.poisson(tables, size=(nref, 3)) + births[None, :]
    tot = eta.sum(axis=1, keepdims=True)
    ref = np.where(tot > 0, eta / np.maximum(tot, 1.0), 1.0 / 3)

    for t in range(3):
        zm = ((ours[:, t].mean() - ref[:, t].mean())
              / np.sqrt(ours[:, t].var() / len(ours)
                        + ref[:, t].var() / nref))
        assert abs(zm) < 5.0, (t, zm)
        # psi here is a ratio of small integers — quantise both samples
        # to a common grid so f32-vs-f64 atom positions (0.66666669 vs
        # 0.66666667) don't register as a spurious KS jump
        ks = sps.ks_2samp(np.round(ours[:, t].astype(np.float64), 4),
                          np.round(ref[:, t].astype(np.float64),
                                   4)).pvalue
        assert ks > 1e-4, (t, ks)


# ----------------------------------------------------------------------
# Asymmetric-alpha Geweke for ggs_aliasmh (advisor round-4 medium): the
# symmetric-alpha run above cannot distinguish the uniform-fallback doc
# proposal's true density (n_dk + alpha_sum/K) from the buggy per-topic
# alpha_k — under a symmetric alpha they coincide. These runs use
# alpha = [0.3, 1.5].
# ----------------------------------------------------------------------

ALPHA_VEC = np.array([0.3, 1.5])


def _mc_draws_asym(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        phi = rng.dirichlet(np.full(V, BETA), K)
        theta = rng.dirichlet(ALPHA_VEC, D)
        z = np.array([rng.choice(K, p=theta[d]) for d in range(D)
                      for _ in range(L)])
        w = np.array([rng.choice(V, p=phi[k]) for k in z])
        out.append(_stats(theta[0, 0], phi[0, 0], z, w))
    return np.array(out)


def _sc_series_asym(steps, burn, seed, buggy=False):
    """SC chain of ggs_aliasmh with state.alpha = ALPHA_VEC. With
    `buggy=True` the doc-proposal density is patched back to the
    advisor-flagged n_dk + alpha_k form (the proposal itself still
    falls back uniformly) — the negative control proving this test
    rejects that bug."""
    import jax.numpy as jnp

    from ldagroupedgibbssampler_tpu.models import ggs_aliasmh as gam

    rng = np.random.default_rng(seed)
    phi0 = rng.dirichlet(np.full(V, BETA), K)
    theta0 = rng.dirichlet(ALPHA_VEC, D)
    z = np.array([rng.choice(K, p=theta0[d]) for d in range(D)
                  for _ in range(L)]).astype(np.int32)
    w = np.array([rng.choice(V, p=phi0[k]) for k in z], np.int32)
    m = create_model(LDAConfig(scheme="ggs_aliasmh", topics=K,
                               alpha=float(ALPHA_VEC.mean()), beta=BETA,
                               seed=seed, exec_time=-1))
    m.add_instances(_corpus(w))
    m.set_z_indicators(z)
    m.state = m.state._replace(alpha=jnp.asarray(ALPHA_VEC, jnp.float32))

    orig = gam.alias_mh_rounds
    if buggy:
        a_corr = jnp.asarray(ALPHA_VEC - ALPHA_VEC.sum() / K, jnp.float32)

        def patched(key, zz, gw, gd, *rest):
            def gd2(k):
                t, q = gd(k)
                return t, q + a_corr[k]
            return orig(key, zz, gw, gd2, *rest)
        gam.alias_mh_rounds = patched
    try:
        out = []
        for s in range(steps):
            m.sample(1)
            z = m.get_z_indicators()
            phi = m.get_phi()[:K]
            theta00 = float(np.asarray(m.state.theta)[0, 0])
            if s >= burn:
                out.append(_stats(theta00, phi[0, 0], z, w))
            w = _resample_w(rng, phi, z)
            m.swap_corpus_tokens(_corpus(w))
    finally:
        gam.alias_mh_rounds = orig
    return np.array(out)


def test_geweke_ggs_aliasmh_asym_alpha():
    """ggs_aliasmh under ASYMMETRIC alpha = [0.3, 1.5]: the MH
    acceptance's doc-proposal density must be the uniform fallback's
    true per-topic mass alpha_sum/K for the chain to stay exact
    (models/ggs_aliasmh.py gather_d). Calibrated run: max |z| ~ 2.6
    across the four statistics for the correct density."""
    mc = _mc_draws_asym(4000, seed=811)
    sc = _sc_series_asym(steps=2600, burn=200, seed=812)
    _agree(mc, sc, [0, 1, 2, 3], "ggs_aliasmh_asym")


def test_geweke_ggs_aliasmh_asym_alpha_negative_control():
    """Power check: re-creating the advisor-flagged bug (density
    n_dk + alpha_k against the uniform fallback) must FAIL the same
    Geweke — calibrated z ~ -14 on frac_z0 and ~ -6 on theta00. Proves
    the asym test above can actually detect this bug class."""
    mc = _mc_draws_asym(4000, seed=811)
    sc = _sc_series_asym(steps=2600, burn=200, seed=813, buggy=True)
    z_frac = _geweke_z(mc[:, 2], sc[:, 2])
    z_th = _geweke_z(mc[:, 0], sc[:, 0])
    assert z_frac < -8.0, z_frac
    assert z_th < -3.5, z_th
