"""PCGS family: the uncollapsed / partially-collapsed parallel samplers.

Reference classes:
  - `UncollapsedParallelLDA` (topics/UncollapsedParallelLDA.java, 2051 LoC,
    scheme `uncollapsed`) — the parallel engine: z-draws score
    (n_dk + alpha_k) * phi[k][w] with phi fixed within the sweep
    (:1509-1513), counts delta-merged after the sweep, phi rows then redrawn
    Dir(n_k) — *without* beta smoothing (:1306-1316, flagged incorrect at
    :1313-1315 but kept for experiment parity).
  - `LDAPartiallyCollapsedGibbsSampler` (scheme `pcgs`,
    topics/LDAPartiallyCollapsedGibbsSampler.java:95-118) — same z-step,
    proper Dir(beta + n_k) phi smoothing.
  - `EfficientUncollapsedParallelLDA` (scheme `efficient_uncollapsed`,
    topics/EfficientUncollapsedParallelLDA.java:86-100) — identical target
    distribution; its two-ended cumsum scan is a JVM micro-optimisation with
    no TPU analogue, so it shares the PCGS step here (the Gumbel-max draw is
    already O(K) with no scan at all).

TPU-first, two execution paths:
  - **fused Pallas sweep** (default on TPU when the n_dk table fits VMEM):
    tokens in sequential-safe cell blocks (no chunk holds two tokens of one
    document, corpus/ragged.py::build_cell_blocks_seq), z-draw + immediate
    n_dk updates + N_kw accumulation all inside one gather-free kernel
    (ops/pallas_pcgs.py). The XLA sweep below is gather-bound — the
    per-position phi-row gather measured ~90% of its time.
  - **XLA doc-sequential sweep** (CPU / large-D fallback): scan over token
    *position* vectorised across all documents (`doc_sequential_sweep`) —
    D parallel lanes × L sequential steps instead of the reference's
    ForkJoin recursive doc splitting (UncollapsedParallelLDA.java:
    1354-1402).
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


class UncollapsedParallelLDA(FusedPCGSSweepMixin, TpuLDASampler):
    """Scheme `uncollapsed`: PCGS engine with the historical unsmoothed
    phi ~ Dir(n_k) draw."""

    layout = "doc_major"
    smooth_phi = False
    # phi rows are floored Dirichlet draws (rnd.DIRICHLET_FLOOR > 0) and
    # alpha > 0, so the conditional (n_dk + alpha) phi has positive
    # support everywhere -> the kernels may skip the last-nonzero passes
    fused_positive_support = True

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        conc = nkw.astype(jnp.float32) + (beta if self.smooth_phi else 1e-7)
        if type_mask is None:
            return rnd.dirichlet(key, conc)
        return rnd.conditional_dirichlet(key, prev_phi, conc, type_mask)

    def _word_weights_t(self, state: LDAState):
        """[V, K] per-token word term: phi.T (phi fixed within sweep)."""
        return state.phi.T, None

    def _init_state(self, key: jax.Array) -> LDAState:
        return self._blockify_z_state(super()._init_state(key))

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        cfg = self.config
        k_z, k_phi, k_next = jax.random.split(state.key, 3)
        word_weights_t, self_corr = self._word_weights_t(state)
        if self._use_fused_sweep():
            # single source of truth for the word term: the same
            # _word_weights_t hook the XLA branch uses (self-correcting
            # conditionals route through ADLDA's own fused branch)
            assert self_corr is None
            z, ndk, nkw = self._fused_zsweep(k_z, state.z, state.ndk,
                                             state.alpha, word_weights_t,
                                             doc_mask)
        else:
            ndk, z = doc_sequential_sweep(
                k_z, self.w_pad, self.mask_pad, state.z, state.ndk,
                word_weights_t, state.alpha, doc_mask,
                self_correction=self_corr)
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              cfg.topics,
                                              self.corpus.num_types)
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=count_ops.tokens_per_topic(nkw), phi=phi,
                              iteration=state.iteration + 1)


class LDAPartiallyCollapsedGibbsSampler(UncollapsedParallelLDA):
    """Scheme `pcgs`: proper beta-smoothed phi
    (LDAPartiallyCollapsedGibbsSampler.java:95-118 via ParallelDirichlet)."""

    smooth_phi = True


class EfficientUncollapsedParallelLDA(UncollapsedParallelLDA):
    """Scheme `efficient_uncollapsed`: same chain as `uncollapsed`
    (EfficientUncollapsedParallelLDA.java:10 is a draw-mechanism
    micro-optimisation only)."""
