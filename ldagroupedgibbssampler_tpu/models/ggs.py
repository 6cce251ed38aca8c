"""GGS — the Grouped Gibbs Sampler (the repo's namesake scheme `ggs`).

Reference: topics/LDAGroupedGibbsSampler.java (210 LoC) on top of
UncollapsedParallelLDA. Per iteration:

  1. theta_d ~ Dir(n_d + alpha) for every document (:66-72, stored in
     thetaMatrix[D][K] :33-37; UncollapsedParallelLDA.sample's "do not
     resample theta when ggs" branch :710-721 reuses these draws for
     diagnostics).
  2. each token scores theta_d[k] * phi[k][w] (:96-101) and draws z by
     inverse-CDF (:107-113).
  3. phi_k ~ Dir(beta + n_k) per topic row (:182-209).

TPU-first: given (theta, phi) every token draw is independent, so the whole
corpus is one fused blocked Gumbel-max kernel (SURVEY.md §7.4a) — no
document sequentialism at all, making GGS the fastest and
most scalable scheme here. theta is a [D, K] vectorised Gamma draw, phi a
[K, V] one, counts a scatter-add rebuild. With documents sharded over a mesh,
theta stays shard-local and only the N_kw reduction crosses chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.models.base import LDAState, TpuLDASampler
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.ops.kernels import sample_z_flat

_EPS = 1e-30


class LDAGroupedGibbsSampler(TpuLDASampler):
    layout = "flat"
    smooth_phi = True

    def _initial_theta(self, key, ndk, alpha):
        return rnd.dirichlet(key, ndk.astype(jnp.float32) + alpha)

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        conc = nkw.astype(jnp.float32) + (beta if self.smooth_phi else 1e-7)
        if type_mask is None:
            return rnd.dirichlet(key, conc)
        return rnd.conditional_dirichlet(key, prev_phi, conc, type_mask)

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        cfg = self.config
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)

        # (1) theta draws — unselected docs keep their previous theta row.
        theta_new = rnd.dirichlet(
            k_theta, state.ndk.astype(jnp.float32) + state.alpha)
        theta = jnp.where(doc_mask[:, None], theta_new, state.theta)

        # (2) fused token sweep.
        sel = self.mask & doc_mask[self.doc_ids]
        z = sample_z_flat(k_z, jnp.log(theta + _EPS),
                          jnp.log(state.phi.T + _EPS), self.w, self.doc_ids,
                          sel, state.z, cfg.token_block)

        # (3) count rebuild + phi draws.
        nkw = count_ops.topic_word_counts(z, self.w, self.mask, cfg.topics,
                                          self.corpus.num_types)
        ndk = count_ops.doc_topic_counts(z, self.doc_ids, self.mask,
                                         self.corpus.num_docs, cfg.topics)
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              theta=theta, iteration=state.iteration + 1)


class LDAGroupedGibbsSamplerTest(LDAGroupedGibbsSampler):
    """Deliberately *invalid* GGS variant kept for experiment parity.

    Reference: topics/LDAGroupedGibbsSamplerTest.java ("This is not a valid
    sampler", :2) — same structure as GGS but theta is NOT redrawn each
    iteration (it keeps using the previous iteration's theta for the token
    draws), breaking detailed balance exactly as the reference variant does.
    """

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        cfg = self.config
        k_z, k_phi, k_next = jax.random.split(state.key, 3)
        theta = state.theta  # stale on purpose
        sel = self.mask & doc_mask[self.doc_ids]
        z = sample_z_flat(k_z, jnp.log(theta + _EPS),
                          jnp.log(state.phi.T + _EPS), self.w, self.doc_ids,
                          sel, state.z, cfg.token_block)
        nkw = count_ops.topic_word_counts(z, self.w, self.mask, cfg.topics,
                                          self.corpus.num_types)
        ndk = count_ops.doc_topic_counts(z, self.doc_ids, self.mask,
                                         self.corpus.num_docs, cfg.topics)
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              theta=theta, iteration=state.iteration + 1)
