"""HDP-LDA family: schemes `ppu_hdplda`, `ppu_hlda`,
`ppu_hdplda_all_topics`.

Reference classes (SURVEY.md §2.1):
  - `PoissonPolyaUrnHDPLDA` (topics/PoissonPolyaUrnHDPLDA.java, 1216 LoC):
    HDP-LDA with Poisson Polya-Urn phi and a dynamic active-topic set —
    two psi samplers (PoissonBasedPsiSampler :342-400, GEMBasedPsiSampler
    :402-500), Gamma priors for new-topic indices (UniformGamma /
    GeometricGamma :505-563), topic birth/death in postZ (:565-625),
    Antoniak table draws `sampleL` via DocTopicTokenFreqTable (:1112-),
    topic re-compaction (:295-321).
  - `PoissonPolyaUrnHDPLDAInfiniteTopics` (…InfiniteTopics.java, 632 LoC):
    the same model over a fixed K_max topic array with NO re-compaction
    and a GEM psi sampler over all K_max sticks (:211-280).
  - `PoissonPolyaUrnHLDA` (…HLDA.java, 968 LoC): earlier variant — grows
    the topic count *contiguously* (`newNumTopics = activeInData +
    Poisson(gamma)`, :300), always uses the Poisson psi (psi[k] = eta_k ~
    Poisson(l_k), normalised in postIteration :221-225), and its Antoniak
    draw uses the concentration gamma, not alpha*psi_k (sampleL :871-894).

TPU-first: all three schemes share a static [K_max]-shaped state plus an
`active` mask — re-compaction (a JVM memory optimisation) has no TPU
benefit and is dropped; the active mask reproduces the birth/death
dynamics instead. Per iteration:

  1. z-sweep: the PCGS doc-sequential sweep with per-topic prior
     alpha0 * psi_k * active_k (the HDP draw (n_dk + alpha0 psi_k) phi_kw
     is exactly the PCGS draw with that alpha vector).
  2. table counts L: the reference's per-doc Antoniak draws aggregate, via
     the DocTopicTokenFreqTable identity (DocTopicTokenFreqTable.java:34),
     to l_k = sum_j Binomial(D(j,k), p_k(j)) where D(j,k) = #docs with
     n_dk >= j — computed from a [K, M] ndk-value histogram (O(D K + K M)
     work and O(K M) memory; round 1 built a [D, K, M] tensor).
  3. topic birth/death (ppu_hdplda / ppu_hlda): empty topics deactivate;
     n_add ~ Poisson(gamma) candidate indices from the configured Gamma
     prior activate (scattered for hdplda, contiguous for hlda).
  4. psi: GEM stick-breaking posterior or Poisson sufficient statistics,
     per `hdp_psi_sampler`.
  5. phi: Polya-Urn rows (normalised Poisson(beta + n_kw)) — doubly
     sparse; inactive rows zeroed (PoissonPolyaUrnHLDA.java:816).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.models.base import TpuLDASampler
from ldagroupedgibbssampler_tpu.models.fused_sweep import FusedPCGSSweepMixin
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.ops.kernels import doc_sequential_sweep

_EPS = 1e-30
NEG_INF = np.float32(-1e30)  # np scalar: no backend init at import time


class HDPState(NamedTuple):
    key: jax.Array
    z: jax.Array
    ndk: jax.Array
    nkw: jax.Array
    nk: jax.Array
    phi: jax.Array
    theta: Optional[jax.Array]
    alpha: jax.Array          # alpha0 * psi * active (effective prior)
    beta: jax.Array
    iteration: jax.Array
    psi: jax.Array            # [K_max] global topic proportions
    tables: jax.Array         # [K_max] last Antoniak table counts l_k
    active: jax.Array         # [K_max] bool active-topic mask


def doc_count_ge_histogram(ndk, max_count: int):
    """D(j, k) = #docs with n_dk >= j for j = 1..max_count, as [K, M].

    The reverse-cumulative-sum of DocTopicTokenFreqTable
    (DocTopicTokenFreqTable.java:130-150), built from a scatter-add
    histogram of ndk values per topic — O(D K) work, O(K M) memory (the
    round-1 [D, K, M] broadcast was ~1 GB at 20NG shapes; VERDICT item 2d).
    """
    d, k = ndk.shape
    clipped = jnp.clip(ndk, 0, max_count).astype(jnp.int32)
    flat = (jnp.arange(k, dtype=jnp.int32)[None, :] * (max_count + 1)
            + clipped).ravel()
    hist = jnp.zeros((k * (max_count + 1),), jnp.int32).at[flat].add(1)
    hist = hist.reshape(k, max_count + 1)
    # ge_all[:, c] = #docs with n_dk >= c; drop c = 0.
    ge_all = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
    return ge_all[:, 1:]


def sample_table_counts(key, ndk, a, max_count: int):
    """l_k = sum_j Binomial(#docs with n_dk >= j, a_k / (a_k + j - 1)).

    Vectorised DocTopicTokenFreqTable + sampleL
    (PoissonPolyaUrnHDPLDA.java:1112-1160; the 0/0 -> p=1 convention at
    j=1, a_k=0 is preserved by the clip since a/(a+0) -> 1 as written).
    `a` is alpha0*psi_k for hdplda (…InfiniteTopics.java:428-476) or a
    broadcast scalar gamma for hlda (PoissonPolyaUrnHLDA.java:871-894)."""
    j = jnp.arange(1, max_count + 1, dtype=jnp.float32)          # [M]
    ge = doc_count_ge_histogram(ndk, max_count)                  # [K, M]
    a = jnp.asarray(a, jnp.float32)
    denom = a[:, None] + j[None, :] - 1.0
    p = jnp.where(denom > 0, a[:, None] / jnp.maximum(denom, _EPS), 1.0)
    draws = rnd.binomial(key, ge.astype(jnp.float32),
                         jnp.clip(p, 0.0, 1.0))
    return jnp.sum(draws, axis=1)                                # [K]


def calc_k(percentile: float, tokens_per_topic) -> int:
    """Number of largest topics whose cumulative share of the token mass
    first exceeds `percentile` (config key `hdp_k_percentile`;
    PoissonPolyaUrnHDPLDAInfiniteTopics.java:335-359 — reproduces its
    first-index-exceeding convention, including returning the index j, not
    j + 1)."""
    alloc = np.sort(np.asarray(tokens_per_topic))[::-1]
    if alloc.size == 0:
        return 0
    ecdf = np.cumsum(alloc)
    total = max(float(ecdf[-1]), 1.0)
    idx = np.nonzero(ecdf / total > percentile)[0]
    return int(idx[0]) if idx.size else int(alloc.size)


def gem_psi(key, tables, gamma: float):
    """Stick-breaking psi ~ GEM posterior given table counts
    (GEMBasedPsiSampler, PoissonPolyaUrnHDPLDA.java:402-500):
    nu_k ~ Beta(1 + l_k, gamma + sum_{j>k} l_j), psi_k = nu_k
    prod_{i<k}(1 - nu_i). Newly-born / empty topics (l_k = 0) get
    Beta(1, gamma + rest) residual mass — the GEM sampler ignores the
    birth increments (its incrementTopic is a no-op, :494-497)."""
    num_topics = tables.shape[0]
    rest = jnp.cumsum(tables[::-1])[::-1] - tables   # sum_{j>k} l_j
    b = jax.random.beta(key, 1.0 + tables, gamma + jnp.maximum(rest, 0.0)
                        + _EPS)
    b = jnp.clip(b, 1e-7, 1.0 - 1e-7)
    log_remain = jnp.concatenate([
        jnp.zeros((1,)), jnp.cumsum(jnp.log1p(-b))[: num_topics - 1]])
    psi = jnp.exp(jnp.log(b) + log_remain)
    return psi / jnp.sum(psi)


def poisson_psi(key, tables, birth_eta):
    """Poisson-based psi (PoissonBasedPsiSampler,
    PoissonPolyaUrnHDPLDA.java:342-400): eta_k ~ Poisson(l_k) plus one
    increment per new-topic index drawn from the Gamma prior in postZ
    (:620-624); psi = eta / sum(eta). Poisson(0) = 0 reproduces the
    l_k = 0 skip."""
    eta = rnd.poisson(key, jnp.asarray(tables, jnp.float32)).astype(
        jnp.float32) + jnp.asarray(birth_eta, jnp.float32)
    total = jnp.sum(eta)
    return jnp.where(total > 0, eta / jnp.maximum(total, 1.0),
                     1.0 / eta.shape[0])


def sample_birth_candidates(key, gamma: float, k_max: int, budget: int,
                            dist: str):
    """Draw the postZ topic-birth candidates: n_add ~ Poisson(gamma) index
    draws from the Gamma prior (PoissonPolyaUrnHDPLDA.java:580-586).

    Returns births[K_max] — how many candidate draws landed on each index
    (the psi increment counts); a topic is (re)activated iff births > 0.
    The Poisson count is truncated to the static `budget` (tail mass
    negligible at any sane gamma); `dist` is "geometric"
    (GeometricGamma(1/(1+gamma)) :111, right-truncation by clipping
    instead of the Java's resample-5-then-throw :536-556) or "uniform"
    (UniformGamma :510-520).
    """
    k_n, k_idx = jax.random.split(key)
    n_add = rnd.poisson(k_n, jnp.float32(gamma))
    if dist == "uniform":
        cand = jax.random.randint(k_idx, (budget,), 0, k_max)
    elif dist == "geometric":
        p = 1.0 / (1.0 + gamma)
        u = jax.random.uniform(k_idx, (budget,), minval=1e-12)
        cand = jnp.clip(
            jnp.floor(jnp.log(u) / jnp.log1p(-p)).astype(jnp.int32),
            0, k_max - 1)
    else:
        raise ValueError(f"unknown hdp_gamma_dist {dist!r}")
    valid = jnp.arange(budget) < n_add
    return jnp.zeros((k_max,), jnp.int32).at[cand].add(
        valid.astype(jnp.int32))


class PoissonPolyaUrnHDPLDAInfiniteTopics(FusedPCGSSweepMixin,
                                           TpuLDASampler):
    """Scheme `ppu_hdplda_all_topics` — the canonical TPU HDP. The
    z-sweep rides the fused PCGS kernel on TPU (the HDP conditional
    (n_dk + alpha0 psi_k) phi_kw IS the PCGS conditional with the stick
    weights as the alpha vector); XLA doc-sequential sweep otherwise.
    No active mask and no birth machinery: all K_max sticks carry GEM
    residual mass (PoissonPolyaUrnHDPLDAInfiniteTopics.java:211-280)."""

    layout = "doc_major"
    smooth_phi = True
    # Birth/death machinery (postZ, PoissonPolyaUrnHDPLDA.java:565-625) —
    # off for the all-topics scheme.
    use_active_mask = False

    def __init__(self, config, logger=None):
        super().__init__(config, logger=logger)
        self.active_topic_history: list[int] = []
        self.k_percentile_history: list[int] = []
        self.topic_occurrence_count = None

    # -- knobs the subclasses override ---------------------------------
    def _psi_sampler_name(self) -> str:
        # …InfiniteTopics.java:83 hard-codes GEM.
        return "gem"

    def _table_concentration(self, state: HDPState):
        # a_k = alphaCoef * psi_k (…InfiniteTopics.java:396).
        return state.alpha

    # -- state ---------------------------------------------------------
    def _init_state(self, key):
        base = super()._init_state(key)
        k_max = self.config.topics
        start = max(1, min(self.config.hdp_start_topics, k_max))
        key, k_psi = jax.random.split(base.key)
        if self.use_active_mask:
            # psi[i] = 1/nrStartTopics on the start topics
            # (PoissonPolyaUrnHDPLDA.java:105-108).
            psi = jnp.where(jnp.arange(k_max) < start, 1.0 / start, 0.0)
            active = jnp.arange(k_max) < start
        else:
            # GEM prior draw over all sticks (…InfiniteTopics.java:223-227
            # inits psi via finalizeSampling on zero counts).
            psi = gem_psi(k_psi, jnp.zeros((k_max,), jnp.float32),
                          self.config.hdp_gamma)
            active = jnp.ones((k_max,), bool)
        # initial z uniform over the starting set
        # (initialDrawTopicIndicator, PoissonPolyaUrnHDPLDA.java:142).
        z = jnp.where(self.mask_pad, base.z % start, 0)
        nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                          k_max, self.corpus.num_types)
        ndk = count_ops.padded_doc_topic_counts(z, self.mask_pad, k_max)
        st = HDPState(key=key, z=z, ndk=ndk, nkw=nkw,
                      nk=count_ops.tokens_per_topic(nkw), phi=base.phi,
                      theta=None,
                      alpha=jnp.float32(self.config.alpha) * psi
                      * active.astype(jnp.float32),
                      beta=base.beta, iteration=jnp.int32(0), psi=psi,
                      tables=jnp.zeros((k_max,), jnp.float32),
                      active=active)
        return self._blockify_z_state(st)

    # -- birth/death ---------------------------------------------------
    def _update_active(self, key, state: HDPState, nk):
        """postZ topic death (empty topics deactivate,
        updateNrActiveTopics :630-638) + birth from the Gamma prior.
        Returns (active, birth_eta)."""
        cfg = self.config
        births = sample_birth_candidates(
            key, cfg.hdp_gamma, cfg.topics, cfg.hdp_birth_budget,
            cfg.hdp_gamma_dist)
        active = (state.active & (nk > 0)) | (births > 0)
        return active, births

    # -- iteration -----------------------------------------------------
    def _step(self, state: HDPState, doc_mask, type_mask) -> HDPState:
        cfg = self.config
        k_max = cfg.topics
        num_types = self.corpus.num_types
        k_z, k_l, k_birth, k_psi, k_phi, k_next = jax.random.split(
            state.key, 6)

        if self._use_fused_sweep():
            z, ndk, nkw = self._fused_zsweep(k_z, state.z, state.ndk,
                                             state.alpha, state.phi.T,
                                             doc_mask)
        else:
            ndk, z = doc_sequential_sweep(
                k_z, self.w_pad, self.mask_pad, state.z, state.ndk,
                state.phi.T, state.alpha, doc_mask)
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              k_max, num_types)
        nk = count_ops.tokens_per_topic(nkw)

        # Antoniak table counts from the [K, M] >=j histogram.
        tables = sample_table_counts(k_l, ndk,
                                     self._table_concentration(state),
                                     self.w_pad.shape[1])

        # Birth/death (hdplda / hlda only).
        if self.use_active_mask:
            active, births = self._update_active(k_birth, state, nk)
        else:
            active, births = state.active, jnp.zeros((k_max,), jnp.int32)

        if self._psi_sampler_name() == "poisson":
            psi = poisson_psi(k_psi, tables, births)
        else:
            psi = gem_psi(k_psi, tables, cfg.hdp_gamma)

        # Polya-Urn phi (doubly sparse); inactive rows zeroed
        # (PoissonPolyaUrnHLDA.java:810-819).
        phi, _zero = rnd.polya_urn_dirichlet(k_phi, nkw, cfg.beta)
        if self.use_active_mask:
            phi = phi * active[:, None].astype(phi.dtype)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=nk, phi=phi,
                              alpha=jnp.float32(cfg.alpha) * psi
                              * active.astype(jnp.float32),
                              iteration=state.iteration + 1, psi=psi,
                              tables=tables, active=active)

    # -- HDPSamplerWithPhi extras (topics/HDPSamplerWithPhi.java:5-10) --
    def post_iteration(self):
        nk = np.asarray(self.state.nk)
        if self.use_active_mask:
            active = int(np.asarray(self.state.active).sum())
        else:
            active = int((nk > 0).sum())
        self.active_topic_history.append(active)
        self.k_percentile_history.append(
            calc_k(self.config.hdp_k_percentile, nk))
        occ = (nk > 0).astype(np.int64)
        self.topic_occurrence_count = occ if self.topic_occurrence_count \
            is None else self.topic_occurrence_count + occ

    def get_active_topic_history(self) -> list[int]:
        return list(self.active_topic_history)

    def get_k_percentile_history(self) -> list[int]:
        """Per-iteration calcK statistic — the number of largest topics
        covering `hdp_k_percentile` of the token mass (the reference's
        activeTopicHistory, PoissonPolyaUrnHDPLDAInfiniteTopics.java:
        322-323,335-359)."""
        return list(self.k_percentile_history)

    def get_topic_occurrence_count(self):
        return self.topic_occurrence_count

    def get_psi(self) -> np.ndarray:
        return np.asarray(self.state.psi)

    def get_active_mask(self) -> np.ndarray:
        return np.asarray(self.state.active)

    def save_checkpoint(self, path: str):
        st = self.state
        np.savez(path, z=self.get_z_indicators(), ndk=np.asarray(st.ndk),
                 nkw=np.asarray(st.nkw), nk=np.asarray(st.nk),
                 phi=np.asarray(st.phi), alpha=np.asarray(st.alpha),
                 beta=np.asarray(st.beta),
                 iteration=np.asarray(st.iteration),
                 psi=np.asarray(st.psi), tables=np.asarray(st.tables),
                 active=np.asarray(st.active),
                 key=jax.random.key_data(st.key))

    def load_checkpoint(self, path: str):
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        k_max = int(d["psi"].shape[0])
        active = jnp.asarray(d["active"]) if "active" in d else \
            jnp.ones((k_max,), bool)
        self.state = HDPState(
            key=jax.random.wrap_key_data(jnp.asarray(d["key"]),
                                         impl=self.config.prng_impl),
            z=self._load_z(d), ndk=jnp.asarray(d["ndk"]),
            nkw=jnp.asarray(d["nkw"]), nk=jnp.asarray(d["nk"]),
            phi=jnp.asarray(d["phi"]), theta=None,
            alpha=jnp.asarray(d["alpha"]), beta=jnp.asarray(d["beta"]),
            iteration=jnp.asarray(d["iteration"]),
            psi=jnp.asarray(d["psi"]), tables=jnp.asarray(d["tables"]),
            active=active)
        return self


class PoissonPolyaUrnHDPLDA(PoissonPolyaUrnHDPLDAInfiniteTopics):
    """Scheme `ppu_hdplda` (PoissonPolyaUrnHDPLDA.java:44) — the dynamic
    active-topic HDP: empty topics die, n_add ~ Poisson(gamma) new indices
    are drawn from the configured Gamma prior (geometric default :111),
    and the psi sampler is selectable via `hdp_psi_sampler` (GEM default
    :116, Poisson :115/342-400). The reference additionally re-compacts
    the active-topic array (:295-321) — a JVM memory optimisation with no
    effect on the chain; the fixed-K_max active mask here is statistically
    identical."""

    use_active_mask = True

    def _psi_sampler_name(self) -> str:
        return self.config.hdp_psi_sampler


class PoissonPolyaUrnHLDA(PoissonPolyaUrnHDPLDAInfiniteTopics):
    """Scheme `ppu_hlda` (PoissonPolyaUrnHLDA.java:54) — the earlier
    variant with three distinct dynamics: (1) the topic count grows
    *contiguously* (`newNumTopics = activeInData + Poisson(gamma)`, :300 —
    new topics take the lowest inactive indices rather than Gamma-prior
    draws); (2) psi is always Poisson-sufficient-statistic based
    (psi[k] = eta_k ~ Poisson(l_k) normalised in postIteration,
    :221-225/846); (3) the Antoniak draw's success probability uses the
    concentration gamma, not alpha*psi_k (sampleL :871-894). Newly
    activated slots get one pseudo-table (eta += 1) so they carry psi
    mass into the next sweep (the analogue of the reference's psi[i]=1
    init, :108-110)."""

    use_active_mask = True

    def _psi_sampler_name(self) -> str:
        return "poisson"

    def _table_concentration(self, state: HDPState):
        return jnp.full((self.config.topics,), self.config.hdp_gamma,
                        jnp.float32)

    def _update_active(self, key, state: HDPState, nk):
        cfg = self.config
        k_max = cfg.topics
        n_add = jnp.minimum(rnd.poisson(key, jnp.float32(cfg.hdp_gamma)),
                            cfg.hdp_birth_budget)
        in_data = state.active & (nk > 0)
        # Rank the inactive slots by index; activate the n_add lowest.
        inactive_rank = jnp.cumsum(~in_data) - 1     # 0-based among inactive
        births = (~in_data) & (inactive_rank < n_add)
        return in_data | births, births.astype(jnp.int32)
