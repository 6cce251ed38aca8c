"""HDP-LDA family: schemes `ppu_hdplda`, `ppu_hlda`,
`ppu_hdplda_all_topics`.

Reference classes (SURVEY.md §2.1):
  - `PoissonPolyaUrnHDPLDA` (topics/PoissonPolyaUrnHDPLDA.java, 1216 LoC):
    HDP-LDA with Poisson Polya-Urn phi and a dynamic active-topic set —
    psi samplers (PoissonBasedPsiSampler :342-400, GEMBasedPsiSampler
    :402-500), topic birth/death in postZ (:565-), Antoniak table draws
    `sampleL` via DocTopicTokenFreqTable (:1112-), topic re-compaction
    (:295-321).
  - `PoissonPolyaUrnHDPLDAInfiniteTopics` (…InfiniteTopics.java, 632 LoC):
    the same model over a fixed K_max topic array with NO re-compaction
    (psi as int sufficient statistics :204-240).
  - `PoissonPolyaUrnHLDA` (…HLDA.java, 968 LoC): earlier/simpler variant.

TPU-first: the fixed-K_max design (`all_topics`) is the natural one — a
static [K_max]-shaped state where inactive topics simply have tiny
alpha0*psi_k prior mass and near-empty phi rows, so topics are born when a
token draw lands on them and die when their counts empty; re-compaction (a
JVM memory optimisation) has no TPU benefit and is dropped for all three
schemes. Per iteration:

  1. z-sweep: the PCGS doc-sequential sweep with per-topic prior
     alpha0 * psi_k (passed as the alpha vector — the HDP draw
     (n_dk + alpha0 psi_k) phi_kw is exactly the PCGS draw with that alpha).
  2. table counts L: the reference's per-doc Antoniak draws aggregate, via
     the DocTopicTokenFreqTable identity (DocTopicTokenFreqTable.java:34),
     to l_k = sum_j Binomial(#docs with n_dk >= j, a_k / (a_k + j - 1)) —
     one vectorised binomial per count level j.
  3. psi: GEM / stick-breaking draw psi'_k ~ Beta(1 + l_k,
     gamma + sum_{j>k} l_j), psi_k = psi'_k prod_{i<k}(1 - psi'_i)
     (GEMBasedPsiSampler semantics), fully vectorised in log space.
  4. phi: Polya-Urn rows (normalised Poisson(beta + n_kw)) — doubly sparse.
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
NEG_INF = jnp.float32(-1e30)


class HDPState(NamedTuple):
    key: jax.Array
    z: jax.Array
    ndk: jax.Array
    nkw: jax.Array
    nk: jax.Array
    phi: jax.Array
    theta: Optional[jax.Array]
    alpha: jax.Array          # alpha0 * psi (the effective per-topic prior)
    beta: jax.Array
    iteration: jax.Array
    psi: jax.Array            # [K_max] global topic proportions
    tables: jax.Array         # [K_max] last Antoniak table counts l_k


def sample_table_counts(key, ndk, a, max_count: int):
    """l_k = sum_j Binomial(#docs with n_dk >= j, a_k/(a_k + j - 1)).

    Vectorised DocTopicTokenFreqTable + sampleL
    (PoissonPolyaUrnHDPLDA.java:1112-; DocTopicTokenFreqTable.java:34)."""
    j = jnp.arange(1, max_count + 1, dtype=jnp.float32)          # [M]
    ge = jnp.sum(ndk[:, :, None] >= j[None, None, :], axis=0)    # [K, M]
    p = a[:, None] / (a[:, None] + j[None, :] - 1.0)             # [K, M]
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
    (GEMBasedPsiSampler, PoissonPolyaUrnHDPLDA.java:402-500)."""
    num_topics = tables.shape[0]
    rest = jnp.cumsum(tables[::-1])[::-1] - tables   # sum_{j>k} l_j
    b = jax.random.beta(key, 1.0 + tables, gamma + jnp.maximum(rest, 0.0)
                        + _EPS)
    b = jnp.clip(b, 1e-7, 1.0 - 1e-7)
    log_remain = jnp.concatenate([
        jnp.zeros((1,)), jnp.cumsum(jnp.log1p(-b))[: num_topics - 1]])
    psi = jnp.exp(jnp.log(b) + log_remain)
    return psi / jnp.sum(psi)


class PoissonPolyaUrnHDPLDAInfiniteTopics(FusedPCGSSweepMixin,
                                           TpuLDASampler):
    """Scheme `ppu_hdplda_all_topics` — the canonical TPU HDP. The
    z-sweep rides the fused PCGS kernel on TPU (the HDP conditional
    (n_dk + alpha0 psi_k) phi_kw IS the PCGS conditional with the stick
    weights as the alpha vector); XLA doc-sequential sweep otherwise."""

    layout = "doc_major"
    smooth_phi = True

    def __init__(self, config, logger=None):
        super().__init__(config, logger=logger)
        self.active_topic_history: list[int] = []
        self.k_percentile_history: list[int] = []
        self.topic_occurrence_count = None

    # -- state ---------------------------------------------------------
    def _init_state(self, key):
        base = super()._init_state(key)
        k_max = self.config.topics
        start = max(1, min(self.config.hdp_start_topics, k_max))
        psi = jnp.full((k_max,), 1.0 / k_max, jnp.float32)
        # initial z was uniform over K_max; reference starts with
        # `hdp_start_topics` active — emulate by re-clamping z into the
        # starting set and rebuilding counts.
        z = jnp.where(self.mask_pad, base.z % start, 0)
        nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                          k_max, self.corpus.num_types)
        ndk = count_ops.padded_doc_topic_counts(z, self.mask_pad, k_max)
        st = HDPState(key=base.key, z=z, ndk=ndk, nkw=nkw,
                      nk=count_ops.tokens_per_topic(nkw), phi=base.phi,
                      theta=None,
                      alpha=jnp.float32(self.config.alpha) * psi,
                      beta=base.beta, iteration=jnp.int32(0), psi=psi,
                      tables=jnp.zeros((k_max,), jnp.float32))
        return self._blockify_z_state(st)

    # -- iteration -----------------------------------------------------
    def _step(self, state: HDPState, doc_mask, type_mask) -> HDPState:
        cfg = self.config
        k_max = cfg.topics
        num_types = self.corpus.num_types
        k_z, k_l, k_psi, k_phi, k_next = jax.random.split(state.key, 5)

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

        # Antoniak table counts and the GEM psi update.
        tables = sample_table_counts(k_l, ndk, state.alpha,
                                     self.w_pad.shape[1])
        psi = gem_psi(k_psi, tables, cfg.hdp_gamma)

        # Polya-Urn phi (doubly sparse).
        phi, _zero = rnd.polya_urn_dirichlet(k_phi, nkw, cfg.beta)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              alpha=jnp.float32(cfg.alpha) * psi,
                              iteration=state.iteration + 1, psi=psi,
                              tables=tables)

    # -- HDPSamplerWithPhi extras (topics/HDPSamplerWithPhi.java:5-10) --
    def post_iteration(self):
        nk = np.asarray(self.state.nk)
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

    def save_checkpoint(self, path: str):
        st = self.state
        np.savez(path, z=self.get_z_indicators(), ndk=np.asarray(st.ndk),
                 nkw=np.asarray(st.nkw), nk=np.asarray(st.nk),
                 phi=np.asarray(st.phi), alpha=np.asarray(st.alpha),
                 beta=np.asarray(st.beta),
                 iteration=np.asarray(st.iteration),
                 psi=np.asarray(st.psi), tables=np.asarray(st.tables),
                 key=jax.random.key_data(st.key))

    def load_checkpoint(self, path: str):
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        self.state = HDPState(
            key=jax.random.wrap_key_data(jnp.asarray(d["key"]),
                                         impl=self.config.prng_impl),
            z=self._load_z(d), ndk=jnp.asarray(d["ndk"]),
            nkw=jnp.asarray(d["nkw"]), nk=jnp.asarray(d["nk"]),
            phi=jnp.asarray(d["phi"]), theta=None,
            alpha=jnp.asarray(d["alpha"]), beta=jnp.asarray(d["beta"]),
            iteration=jnp.asarray(d["iteration"]),
            psi=jnp.asarray(d["psi"]), tables=jnp.asarray(d["tables"]))
        return self


class PoissonPolyaUrnHDPLDA(PoissonPolyaUrnHDPLDAInfiniteTopics):
    """Scheme `ppu_hdplda`. The reference variant additionally re-compacts
    the active-topic array (PoissonPolyaUrnHDPLDA.java:295-321) — a JVM
    memory optimisation with no effect on the chain; the fixed-K_max state
    here is statistically identical."""


class PoissonPolyaUrnHLDA(PoissonPolyaUrnHDPLDAInfiniteTopics):
    """Scheme `ppu_hlda` — the earlier simpler parallel HDP variant
    (PoissonPolyaUrnHLDA.java:54); same ingredients."""
