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

TPU-first design (measured on a v5e chip — see git history for the
profiling): given (theta, phi) every token draw is independent, so the whole
corpus is processed as a scan over static *type-sorted blocks*
(Corpus.w_sorted_blocks): each block covers ≤ `vocab_span` consecutive type
ids, so

  - the phi values a block needs are ONE contiguous [vspan, K] slice (no
    big gather);
  - the z draw is a vectorised Gumbel-max over [B, K] logits (exact
    categorical; one RNG call per block — the sequential inverse-CDF of the
    reference is strictly slower on TPU because the cumsum runs across the
    lane axis);
  - the block's N_kw contribution is an MXU indicator matmul
    [vspan, B] @ [B, K] instead of a scatter-add (≈8× faster than XLA
    scatter for this shape), accumulated into a [V, K] carry — note the
    *type-major* orientation, which is also the natural layout for the
    per-token access pattern, so state.nkw and state.phi are stored [V, K]
    here (`nkw_layout = "vk"`).

theta and phi are whole-matrix vectorised Gamma draws. The remaining
scatter is the [D, K] doc-topic count rebuild.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.models.base import LDAState, TpuLDASampler
from ldagroupedgibbssampler_tpu.ops import random as rnd

_EPS = 1e-30


class LDAGroupedGibbsSampler(TpuLDASampler):
    layout = "w_sorted"
    smooth_phi = True
    nkw_layout = "vk"

    # ------------------------------------------------------------------
    def _prepare_device_data(self, corpus):
        cfg = self.config
        blocks = corpus.w_sorted_blocks(block=cfg.token_block,
                                        vspan=cfg.vocab_span)
        self._blocks = blocks
        self.wb = jnp.asarray(blocks.w_local)
        self.db = jnp.asarray(blocks.doc_ids)
        self.maskb = jnp.asarray(blocks.mask)
        self.mask_bf16 = jnp.asarray(blocks.mask.astype(np.float32)
                                     ).astype(jnp.bfloat16)
        self.v0 = jnp.asarray(blocks.v0)
        self.num_blocks = blocks.w_local.shape[0]

    def _init_state(self, key: jax.Array) -> LDAState:
        cfg, corpus = self.config, self.corpus
        num_topics, num_types = cfg.topics, corpus.num_types
        k_z, k_phi, k_theta, k_next = jax.random.split(key, 4)
        z = jax.random.randint(k_z, self.wb.shape, 0, num_topics, jnp.int32)
        z = jnp.where(self.maskb, z, 0)
        ones = jnp.where(self.maskb, 1, 0)
        w_global = self.wb + self.v0[:, None]
        nkw = jnp.zeros((num_types, num_topics), jnp.int32).at[
            w_global.reshape(-1), z.reshape(-1)].add(ones.reshape(-1))
        ndk = jnp.zeros((corpus.num_docs, num_topics), jnp.int32).at[
            self.db.reshape(-1), z.reshape(-1)].add(ones.reshape(-1))
        alpha = self._alpha_vector()
        beta = jnp.float32(cfg.beta)
        phi = self._sample_phi(k_phi, nkw, beta, None, None)
        theta = rnd.dirichlet(k_theta, ndk.astype(jnp.float32) + alpha)
        return LDAState(key=k_next, z=z, ndk=ndk, nkw=nkw,
                        nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                        alpha=alpha, beta=beta, iteration=jnp.int32(0))

    # ------------------------------------------------------------------
    def _sample_phi(self, key, nkw_vk, beta, type_mask, prev_phi_vk):
        """phi in [V, K] orientation: Gamma draw + column normalisation."""
        conc = nkw_vk.astype(jnp.float32) + (beta if self.smooth_phi
                                             else 1e-7)
        if type_mask is None:
            g = jnp.maximum(rnd.gamma(key, conc), rnd.DIRICHLET_FLOOR)
            return g / jnp.sum(g, axis=0, keepdims=True)
        phi_kv = rnd.conditional_dirichlet(key, prev_phi_vk.T, conc.T,
                                           type_mask)
        return phi_kv.T

    def _theta_update(self, key, state, doc_mask):
        theta_new = rnd.dirichlet(
            key, state.ndk.astype(jnp.float32) + state.alpha)
        return jnp.where(doc_mask[:, None], theta_new, state.theta)

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        cfg = self.config
        num_topics = cfg.topics
        num_types = self.corpus.num_types
        vspan = cfg.vocab_span
        block = self.wb.shape[1]
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)

        # (1) theta draws — unselected docs keep their previous row.
        theta = self._theta_update(k_theta, state, doc_mask)
        log_theta = jnp.log(theta + _EPS)
        log_phi_pad = jnp.pad(jnp.log(state.phi + _EPS),
                              ((0, vspan), (0, 0)))
        keys = jax.random.split(k_z, self.num_blocks)

        # (2)+(3a) fused sweep: z draw + N_kw indicator matmul per block.
        def blk(nkw_acc, xs):
            k, wi, di, mi, mbf, zi, v0 = xs
            phi_loc = jax.lax.dynamic_slice(log_phi_pad, (v0, 0),
                                            (vspan, num_topics))
            logits = log_theta[di] + phi_loc[wi]
            g = jax.random.gumbel(k, logits.shape, dtype=jnp.float32)
            z_new = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
            sel = mi & doc_mask[di]
            z_new = jnp.where(sel, z_new, zi)
            ind = (wi[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (vspan, block), 0)).astype(jnp.bfloat16) \
                * mbf[None, :]
            onehot = (z_new[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (block, num_topics), 1)).astype(jnp.bfloat16)
            part = jax.lax.dot(ind, onehot,
                               preferred_element_type=jnp.float32)
            cur = jax.lax.dynamic_slice(nkw_acc, (v0, 0),
                                        (vspan, num_topics))
            nkw_acc = jax.lax.dynamic_update_slice(nkw_acc, cur + part,
                                                   (v0, 0))
            return nkw_acc, z_new

        nkw0 = jnp.zeros((num_types + vspan, num_topics), jnp.float32)
        nkw_acc, z = jax.lax.scan(
            blk, nkw0, (keys, self.wb, self.db, self.maskb, self.mask_bf16,
                        state.z, self.v0))
        nkw = nkw_acc[:num_types].astype(jnp.int32)

        # (3b) doc-topic counts: [D, K] scatter rebuild.
        ones = jnp.where(self.maskb, 1, 0)
        ndk = jnp.zeros((self.corpus.num_docs, num_topics), jnp.int32).at[
            self.db.reshape(-1), z.reshape(-1)].add(ones.reshape(-1))

        # (4) phi draws.
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                              iteration=state.iteration + 1)

    # ------------------------------------------------------------------
    # multi-iteration fused driver (bench / large runs): one dispatch per
    # `n` iterations, full sweeps (no random scan), via lax.scan.
    # ------------------------------------------------------------------
    def _multi_step_fn(self, n: int):
        doc_mask = jnp.ones((self.corpus.num_docs,), bool)

        def run(state):
            def body(st, _):
                return self._step(st, doc_mask, None), None
            out, _ = jax.lax.scan(body, state, None, length=n)
            return out
        jitted = jax.jit(self._with_rebound(run), donate_argnums=(1,))
        return lambda state: jitted(self._device_arrays(), state)

    def sample_chunked(self, iterations: int, chunk: int = 10):
        fn = self._multi_step_fn(chunk)
        done = 0
        while done < iterations:
            self.state = fn(self.state)
            done += chunk
        jax.block_until_ready(self.state.z)
        return self

    # ------------------------------------------------------------------
    # layout-aware accessors
    # ------------------------------------------------------------------
    def get_phi(self) -> np.ndarray:
        return np.asarray(self.state.phi.T)

    def set_phi(self, phi, vocab=None, labels=None):
        if vocab is not None and list(vocab) != list(self.corpus.vocab):
            raise ValueError("vocabulary mismatch in set_phi")
        phi = jnp.asarray(phi, jnp.float32)
        self.state = self.state._replace(phi=phi.T)

    def get_z_indicators(self) -> np.ndarray:
        z = np.asarray(self.state.z).reshape(-1)
        idx = self._blocks.flat_index.reshape(-1)
        out = np.zeros(self.corpus.num_tokens, np.int32)
        valid = idx >= 0
        out[idx[valid]] = z[valid]
        return out

    def set_z_indicators(self, z_flat):
        z_flat = np.asarray(z_flat, np.int32)
        z = np.zeros(self._blocks.flat_index.shape, np.int32)
        valid = self._blocks.flat_index >= 0
        z[valid] = z_flat[self._blocks.flat_index[valid]]
        st = self.state
        z = jnp.asarray(z)
        ones = jnp.where(self.maskb, 1, 0)
        w_global = self.wb + self.v0[:, None]
        nkw = jnp.zeros((self.corpus.num_types, self.config.topics),
                        jnp.int32).at[w_global.reshape(-1),
                                      z.reshape(-1)].add(ones.reshape(-1))
        ndk = jnp.zeros((self.corpus.num_docs, self.config.topics),
                        jnp.int32).at[self.db.reshape(-1),
                                      z.reshape(-1)].add(ones.reshape(-1))
        key, k_phi = jax.random.split(st.key)
        phi = self._sample_phi(k_phi, nkw, st.beta, None, None)
        self.state = st._replace(key=key, z=z, ndk=ndk, nkw=nkw,
                                 nk=jnp.sum(nkw, axis=0), phi=phi)


class LDAGroupedGibbsSamplerTest(LDAGroupedGibbsSampler):
    """Deliberately *invalid* GGS variant kept for experiment parity.

    Reference: topics/LDAGroupedGibbsSamplerTest.java ("This is not a valid
    sampler", :2) — same structure as GGS but theta is NOT redrawn each
    iteration (token draws use the previous iteration's theta), breaking
    detailed balance exactly as the reference variant does.
    """

    def _theta_update(self, key, state, doc_mask):
        return state.theta
