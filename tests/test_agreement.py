"""Cross-sampler agreement + paranoid invariant tests.

Mirrors the reference's dominant test styles (SURVEY.md §4): different
sampler families must agree statistically on the same corpus
(LogLikelihoodTest.java / SmokeTest.java), and the "Paranoid" invariant
mode must pass continuously (ParanoidUncollapsedParallelLDA.java:6-50 —
count conservation after every sweep)."""

import numpy as np
import pytest

# statistical cross-sampler chains (hundreds of iterations each): slow
# tier — the full suite (`-m "not tpu"`) and the revalidation script
# still run them
pytestmark = pytest.mark.slow

from ldagroupedgibbssampler_tpu.config import LDAConfig
from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
    model_log_likelihood)
from ldagroupedgibbssampler_tpu.models.registry import create_model

SCHEMES = ["collapsed", "ggs", "pcgs", "adlda", "spalias"]


def _train(scheme, corpus, iterations=80, seed=11):
    cfg = LDAConfig(scheme=scheme, topics=3, alpha=0.5, beta=0.01,
                    seed=seed, exec_time=-1)
    model = create_model(cfg)
    model.add_instances(corpus)
    model.sample(iterations)
    return model


class TestCrossSamplerAgreement:
    def test_final_ll_within_band(self, synthetic_corpus):
        """All families converge to similar model LL on the planted corpus
        (the LL-formula + trajectory agreement of LogLikelihoodTest)."""
        lls = {}
        for scheme in SCHEMES:
            m = _train(scheme, synthetic_corpus)
            ll = float(model_log_likelihood(
                m.state.ndk, m._nkw_kv(), m.get_alpha(), m.get_beta()))
            lls[scheme] = ll
        vals = np.asarray(list(lls.values()))
        spread = vals.max() - vals.min()
        # identical corpus/K/priors: converged LLs agree within a few
        # percent of their magnitude
        assert spread < 0.05 * abs(vals.mean()), lls

    def test_all_recover_planted_structure(self, synthetic_corpus):
        """SmokeTest.java-style: every family finds the 3 planted topics
        (each topic's top words dominated by one vocab block)."""
        for scheme in SCHEMES:
            m = _train(scheme, synthetic_corpus)
            top = m.get_top_words(5)
            blocks = [{w.split("_")[0] for w in words} for words in top]
            pure = sum(1 for b in blocks if len(b) == 1)
            assert pure >= 2, (scheme, top)

    def test_ll_formula_collapsed_vs_uncollapsed_state(self,
                                                       synthetic_corpus):
        """The Dirichlet-multinomial LL depends only on the count state —
        evaluating it on two samplers with identical z must agree exactly
        (LogLikelihoodTest.java:23)."""
        m1 = _train("ggs", synthetic_corpus, iterations=5)
        z = m1.get_z_indicators()
        m2 = _train("pcgs", synthetic_corpus, iterations=5)
        m2.set_z_indicators(z)
        ll1 = float(model_log_likelihood(m1.state.ndk, m1._nkw_kv(),
                                         m1.get_alpha(), m1.get_beta()))
        ll2 = float(model_log_likelihood(m2.state.ndk, m2._nkw_kv(),
                                         m2.get_alpha(), m2.get_beta()))
        assert ll1 == pytest.approx(ll2, rel=1e-5)


class TestParanoidMode:
    @pytest.mark.parametrize("scheme", ["ggs", "pcgs", "adlda", "spalias"])
    def test_paranoid_invariants_hold(self, scheme, synthetic_corpus):
        """paranoid=True re-checks count conservation/consistency after
        every iteration and raises on violation (the reference's Paranoid*
        samplers, ParanoidTest.java:38-76)."""
        cfg = LDAConfig(scheme=scheme, topics=3, alpha=0.5, beta=0.01,
                        seed=3, exec_time=-1, paranoid=True)
        model = create_model(cfg)
        model.add_instances(synthetic_corpus)
        model.sample(10)   # raises if any invariant fails
        nkw = model.get_topic_type_counts()
        assert nkw.sum() == synthetic_corpus.num_tokens


def test_posterior_topic_count_moments_agree(synthetic_corpus):
    """BASELINE.json quality criterion: posterior topic-count moments match
    between the CGS oracle and GGS within Monte-Carlo error. Sorted
    tokens-per-topic are invariant to label switching; their post-burnin
    means must agree within a few joint standard errors."""
    def chain_moments(scheme, iters=60, burn=30, seed=11):
        cfg = LDAConfig(scheme=scheme, topics=3, alpha=0.5, beta=0.01,
                        seed=seed, exec_time=-1)
        m = create_model(cfg)
        m.add_instances(synthetic_corpus)
        m.sample(burn)
        samples = []
        for _ in range(iters - burn):
            m.sample(1)
            samples.append(np.sort(np.asarray(m.state.nk)))
        s = np.asarray(samples, np.float64)
        return s.mean(axis=0), s.std(axis=0)

    mean_c, std_c = chain_moments("collapsed")
    for scheme in ("ggs", "pcgs", "adlda", "lightpclda"):
        mean_g, std_g = chain_moments(scheme)
        joint = np.sqrt(std_c ** 2 + std_g ** 2) / np.sqrt(30) \
            + 0.01 * np.abs(mean_c)
        assert (np.abs(mean_c - mean_g) < 5 * joint + 5).all(), (
            scheme, mean_c, mean_g, joint)
