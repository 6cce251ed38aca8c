"""ADLDA — Approximate Distributed LDA (Newman et al. 2009), scheme `adlda`.

Reference: topics/ADLDA.java (955 LoC) + topics/MyWorkerRunnable.java: the
global typeTopicCounts/tokensPerTopic are copied into per-thread replicas
(ADLDA.java:176-210), each worker runs a *collapsed* sparse sweep over its
document shard against its (increasingly stale) replica, then the replicas
are merged (`sumTypeTopicCounts`, :302) and re-broadcast (:306-332) once per
iteration.

TPU-first mapping (SURVEY.md §2.2 P4): the "replica" is the replicated
N_kw/n_k tensor, the "merge + re-broadcast" is the count rebuild (psum over
the doc-sharded mesh when running multi-chip — see parallel/sharding.py).
Staleness contract (single chip, fused kernel): the reference's workers
update their local replica token-by-token within the sweep and are stale
ACROSS workers by up to one full sweep (ADLDA.java:176-332); here the fused
kernel keeps N_kw and n_k LIVE — each 128-token chunk's count deltas apply
before the next chunk draws — so counts are stale only *within* one chunk
(<= 128 tokens), strictly tighter than any multi-worker reference
configuration, and n_dk updates token-by-token within each document exactly
like the reference. On the multi-chip path (parallel/sharded_adlda.py) each
shard sweeps against sweep-stale replicated counts merged by psum — exactly
the reference's cross-worker replica contract. The XLA fallback sweep
(no TPU) is sweep-stale with exact own-count exclusion; all variants are
members of the AD-LDA approximation family (Newman et al. §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.models.base import LDAState, TpuLDASampler
from ldagroupedgibbssampler_tpu.models.fused_sweep import FusedPCGSSweepMixin
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.ops.kernels import doc_sequential_sweep

_EPS = 1e-30


class ADLDA(FusedPCGSSweepMixin, TpuLDASampler):
    layout = "doc_major"
    smooth_phi = True
    # the collapsed conditional (n_dk+alpha)(beta+N-own)/(Vbeta+n_k-own)
    # is positive everywhere (alpha > 0, beta > 0)
    fused_positive_support = True
    # streamed-scratch gate: the collapsed live-count mode streams no
    # separate word table (the N_kw rmw window IS the table) but carries
    # the live-n_k scratch (ops/pallas_pcgs.fused_pcgs_streamed_vmem_bytes)
    _streamed_collapsed = True

    def _init_state(self, key: jax.Array) -> LDAState:
        return self._blockify_z_state(super()._init_state(key))

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        cfg = self.config
        k_z, k_phi, k_next = jax.random.split(state.key, 3)
        num_types = self.corpus.num_types
        if self._use_fused_sweep():
            # collapsed mode of the fused kernel: LIVE N_kw/n_k (chunk
            # deltas applied in-kernel before the next chunk draws) with
            # own-count exclusion; the kernel's N_kw output IS the merge.
            z, ndk, nkw = self._fused_zsweep(
                k_z, state.z, state.ndk, state.alpha,
                state.nkw.T.astype(jnp.float32), doc_mask,
                nk_plus=state.beta * num_types
                + state.nk.astype(jnp.float32), beta=state.beta)
        else:
            # Collapsed word term against sweep-stale global counts:
            # (beta + N_kw) / (V beta + n_k), precomputed [V, K].
            word_weights_t = (
                (state.beta + state.nkw.T.astype(jnp.float32))
                / (state.beta * num_types
                   + state.nk.astype(jnp.float32))[None, :])
            ndk, z = doc_sequential_sweep(
                k_z, self.w_pad, self.mask_pad, state.z, state.ndk,
                word_weights_t, state.alpha, doc_mask,
                self_correction=(state.nkw, state.nk, state.beta))
            # The AD-LDA merge: rebuild global counts from all shards' z.
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              cfg.topics, num_types)
        # phi is not part of the collapsed chain; keep an augmented draw so
        # diagnostics (log posterior, phi means) have the same surface as the
        # reference's estimate() diagnostics block (ADLDA.java:405-515).
        phi = rnd.dirichlet(k_phi, nkw.astype(jnp.float32) + state.beta)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              iteration=state.iteration + 1)
