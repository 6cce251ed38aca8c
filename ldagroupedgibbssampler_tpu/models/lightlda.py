"""LightLDA-style Metropolis-Hastings samplers: schemes `lightpclda`,
`lightpcldaw2`, `lightcollapsed`.

Reference classes:
  - `LightPCLDA` (topics/LightPCLDA.java, 222 LoC): O(1) MH z-draws against
    uncollapsed phi. Word proposal q_w(k) ∝ phi[k][w] (alias table built
    from phi only, :50-70); doc proposal from the document's own topic
    mixture; alternating accept/reject steps.
  - `LightPCLDAtypeTopicProposal` (topics/LightPCLDAtypeTopicProposal.java,
    313 LoC): word proposal from type-topic *counts*
    (`nonZeroTypeTopics`/`tokensPerType`/`topicCountBetaHat` :23-53).
  - `CollapsedLightLDA` (topics/CollapsedLightLDA.java, 1416 LoC): fully
    collapsed target with AD-LDA-style count replicas merged per sweep
    (:636-688), MH word proposal via count alias tables (:946-955), doc
    proposal from the doc's topic sequence (:996-1005).

TPU-first: the alias tables exist to make the *proposal* O(1) on a scalar
core; on TPU the proposal is a vectorised Gumbel-max over gathered proposal
logits — same proposal distribution, no tables. The MH accept/reject
structure (the actual statistical content) is preserved exactly:

  step 1 (word proposal):  k' ~ q_w;  log A = [t(k') - t(z)] + [q(z) - q(k')]
  step 2 (doc proposal):   k'' ~ q_d = (n_dk^{-i} + alpha)/(n_d^{-i}+alphaSum)
        — drawn by the LightLDA trick: w.p. n_d/(n_d+alphaSum) the topic of
        a uniformly random token in the doc, else k ~ alpha/alphaSum; the
        doc part of the target cancels against q_d, leaving log A = the
        word-term ratio.

where t(k) is the scheme's log target word+doc term. CollapsedLightLDA's
count replicas map to the sweep-stale global counts exactly as in adlda.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.models.base import LDAState
from ldagroupedgibbssampler_tpu.models.pcgs import UncollapsedParallelLDA
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd

_EPS = 1e-30


def lightlda_sweep(key, w_pad, mask_pad, z_pad, ndk, target_word_logits_t,
                   proposal_word_logits_t, alpha, doc_sel):
    """One MH sweep, scanning token positions, vectorised over documents.

    target_word_logits_t[V, K]: the word-dependent part of log p(z=k)
      (log phi for the PC variants; log(beta+N_kw) - log(Vbeta+n_k) for the
      collapsed variant — stale within the sweep).
    proposal_word_logits_t[V, K]: log q_w(k) up to a constant.
    """
    num_docs, length = w_pad.shape
    num_topics = ndk.shape[1]
    alpha_f = alpha.astype(jnp.float32)
    alpha_sum = jnp.sum(alpha_f)
    doc_len = jnp.sum(mask_pad, axis=1).astype(jnp.float32)     # [D]
    keys = jax.random.split(key, length)
    d_idx = jnp.arange(num_docs)

    def log_dt(ndk_c, k):
        """doc term log(n_dk + alpha_k), gathered per doc at its own k."""
        return jnp.log(ndk_c[d_idx, k].astype(jnp.float32) + alpha_f[k]
                       + _EPS)

    def step(carry, xs):
        ndk_c, z = carry
        kt, t = xs
        wt = jax.lax.dynamic_index_in_dim(w_pad, t, 1, keepdims=False)
        mt = jax.lax.dynamic_index_in_dim(mask_pad, t, 1, keepdims=False)
        zt = jax.lax.dynamic_index_in_dim(z, t, 1, keepdims=False)
        active = mt & doc_sel
        dec = active.astype(jnp.int32)
        ndk_c = ndk_c - jax.nn.one_hot(zt, num_topics, dtype=jnp.int32) \
            * dec[:, None]

        kw, ku1, kj, kmix, kalpha, ku2 = jax.random.split(kt, 6)
        tw = target_word_logits_t[wt]                            # [D, K]
        qw = proposal_word_logits_t[wt]                          # [D, K]

        # ---- MH step 1: word proposal ----
        g = jax.random.gumbel(kw, qw.shape, dtype=jnp.float32)
        k1 = jnp.argmax(qw + g, axis=-1).astype(jnp.int32)
        log_acc1 = (log_dt(ndk_c, k1) + tw[d_idx, k1]
                    - log_dt(ndk_c, zt) - tw[d_idx, zt]
                    + qw[d_idx, zt] - qw[d_idx, k1])
        u1 = jnp.log(jax.random.uniform(ku1, (num_docs,)) + _EPS)
        z1 = jnp.where(u1 < log_acc1, k1, zt)

        # ---- MH step 2: doc proposal ----
        # topic of a uniform random token in the doc …
        j = jnp.floor(jax.random.uniform(kj, (num_docs,))
                      * jnp.maximum(doc_len, 1.0)).astype(jnp.int32)
        k_doc = z[d_idx, j]
        # … or a draw from alpha
        g_a = jax.random.gumbel(kalpha, (num_docs, num_topics))
        k_alpha = jnp.argmax(jnp.log(alpha_f)[None, :] + g_a,
                             axis=-1).astype(jnp.int32)
        use_doc = jax.random.uniform(kmix, (num_docs,)) \
            < doc_len / (doc_len + alpha_sum)
        k2 = jnp.where(use_doc, k_doc, k_alpha)
        # q_d cancels the doc part of the target: A = word-term ratio only.
        log_acc2 = tw[d_idx, k2] - tw[d_idx, z1]
        u2 = jnp.log(jax.random.uniform(ku2, (num_docs,)) + _EPS)
        z2 = jnp.where(u2 < log_acc2, k2, z1)

        z_new = jnp.where(active, z2, zt)
        ndk_c = ndk_c + jax.nn.one_hot(z_new, num_topics, dtype=jnp.int32) \
            * dec[:, None]
        z = jax.lax.dynamic_update_index_in_dim(z, z_new, t, 1)
        return (ndk_c, z), None

    (ndk_out, z_out), _ = jax.lax.scan(
        step, (ndk, z_pad), (keys, jnp.arange(length)))
    return ndk_out, z_out


class LightPCLDA(UncollapsedParallelLDA):
    """Scheme `lightpclda`: PC target, word proposal from phi."""

    layout = "doc_major"
    smooth_phi = True
    # streamed-scratch gate: the MH kernel buffers TWO bf16 word tables
    # (target + proposal, ops/pallas_lightlda.py:426-430)
    _streamed_word_tables = 2

    def _target_and_proposal(self, state: LDAState):
        log_phi_t = jnp.log(state.phi.T + _EPS)
        return log_phi_t, log_phi_t

    def _target_and_proposal_linear(self, state: LDAState):
        """Linear-space [V, K] word target / proposal tables for the fused
        MH kernel (ops/pallas_lightlda.py)."""
        return state.phi.T, state.phi.T

    def _fused_mh(self, k_z, state, doc_mask):
        from ldagroupedgibbssampler_tpu.models.fused_sweep import _SEQ_DSPAN
        from ldagroupedgibbssampler_tpu.ops.pallas_lightlda import (
            fused_lightlda_sweep, fused_lightlda_sweep_streamed)
        cfg = self.config
        tw, qw = self._target_and_proposal_linear(state)
        b = self._sblocks
        if self._fused_mode() == "streamed":
            z, nkw_vk, table_out = fused_lightlda_sweep_streamed(
                self.swb, self.sdla, state.z,
                self._ndk_table(state.ndk, state.alpha, doc_mask), tw, qw,
                self._fused_seed(k_z), self.swwc, self.swindc,
                nwin_w=b.nwin_w, nwin_d=b.nwin_d,
                vspan=self._streamed_vspan(),
                dspan=_SEQ_DSPAN, num_topics=cfg.topics,
                interpret=self._fused_interpret())
        else:
            z, nkw_vk, table_out = fused_lightlda_sweep(
                self.swb, self.sdla, state.z,
                self._ndk_table(state.ndk, state.alpha, doc_mask), tw, qw,
                self._fused_seed(k_z),
                self.swinb, self.sfirstb, self.swindc,
                nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=cfg.vocab_span,
                dspan=_SEQ_DSPAN, num_topics=cfg.topics,
                interpret=self._fused_interpret())
        ndk, nkw = self._fused_extract(nkw_vk, table_out, state.alpha)
        return z, ndk, nkw

    def _step(self, state: LDAState, doc_mask, type_mask) -> LDAState:
        cfg = self.config
        k_z, k_phi, k_next = jax.random.split(state.key, 3)
        if self._use_fused_sweep():
            z, ndk, nkw = self._fused_mh(k_z, state, doc_mask)
        else:
            target_t, proposal_t = self._target_and_proposal(state)
            ndk, z = lightlda_sweep(k_z, self.w_pad, self.mask_pad,
                                    state.z, state.ndk, target_t,
                                    proposal_t, state.alpha, doc_mask)
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              cfg.topics,
                                              self.corpus.num_types)
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              iteration=state.iteration + 1)


class LightPCLDAtypeTopicProposal(LightPCLDA):
    """Scheme `lightpcldaw2`: PC target, word proposal from type-topic
    counts n_kw + beta-hat (LightPCLDAtypeTopicProposal.java:23-53)."""

    def _target_and_proposal(self, state: LDAState):
        log_phi_t = jnp.log(state.phi.T + _EPS)
        proposal_t = jnp.log(state.nkw.T.astype(jnp.float32)
                             + state.beta + _EPS)
        return log_phi_t, proposal_t

    def _target_and_proposal_linear(self, state: LDAState):
        return state.phi.T, state.nkw.T.astype(jnp.float32) + state.beta


class CollapsedLightLDA(LightPCLDA):
    """Scheme `lightcollapsed`: fully collapsed target with sweep-stale
    global counts (the TPU mapping of the per-thread count replicas,
    CollapsedLightLDA.java:737-817 — same staleness contract as adlda.py),
    word proposal from counts."""

    def _target_and_proposal(self, state: LDAState):
        num_types = self.corpus.num_types
        tw = (jnp.log(state.beta + state.nkw.T.astype(jnp.float32) + _EPS)
              - jnp.log(state.beta * num_types
                        + state.nk.astype(jnp.float32))[None, :])
        return tw, tw

    def _target_and_proposal_linear(self, state: LDAState):
        num_types = self.corpus.num_types
        tw = ((state.beta + state.nkw.T.astype(jnp.float32))
              / (state.beta * num_types
                 + state.nk.astype(jnp.float32))[None, :])
        return tw, tw

    def _step(self, state: LDAState, doc_mask, type_mask) -> LDAState:
        cfg = self.config
        k_z, k_phi, k_next = jax.random.split(state.key, 3)
        if self._use_fused_sweep():
            # the kernel's N_kw output is the "sumTypeTopicCounts" merge
            z, ndk, nkw = self._fused_mh(k_z, state, doc_mask)
        else:
            target_t, proposal_t = self._target_and_proposal(state)
            ndk, z = lightlda_sweep(k_z, self.w_pad, self.mask_pad,
                                    state.z, state.ndk, target_t,
                                    proposal_t, state.alpha, doc_mask)
            # "sumTypeTopicCounts": rebuild globals from all docs' z.
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              cfg.topics,
                                              self.corpus.num_types)
        # collapsed chain: phi is a diagnostic augmented draw only.
        phi = rnd.dirichlet(k_phi, nkw.astype(jnp.float32) + state.beta)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              iteration=state.iteration + 1)
