"""Polya-Urn LDA (Terenin et al. 2018), scheme `polyaurn`.

Reference: topics/PolyaUrnSpaliasLDA.java (530 LoC): doubly-sparse sampler —
phi rows are *normalised Poisson counts* c_kw ~ Poisson(beta + n_kw)
(types/PolyaUrnDirichlet.java:23-48 `nextDistributionWithSparseness` via
`loopOverTopics` :495-520), so phi has exact zeros wherever the Poisson draw
is zero; the z-step then only ever proposes topics with phi > 0 (sparse
alias tables over the nonzero support, :67-70,180).

TPU-first: the Poisson phi draw is one vectorised `jax.random.poisson` over
[K, V]; sparsity is carried as an explicit zero mask and the token sweep uses
the *masked* Gumbel-max draw (ops/categorical.masked_gumbel_categorical) so
zero-phi topics have probability exactly 0 — the same support restriction the
sparse alias tables enforce. The doc-sequential sweep keeps PCGS z semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.models.base import LDAState
from ldagroupedgibbssampler_tpu.models.pcgs import UncollapsedParallelLDA
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd

_EPS = 1e-30
NEG_INF = np.float32(-1e30)  # np scalar: no backend init at import time


class PolyaUrnSpaliasLDA(UncollapsedParallelLDA):
    layout = "doc_major"
    smooth_phi = True
    # Polya-Urn phi has exact-zero atoms: the last-nonzero clamp must be
    # computed, not assumed (override the PCGS-family True)
    fused_positive_support = False

    def _initial_phi(self, key, nkw, beta):
        phi, _zero = rnd.polya_urn_dirichlet(key, nkw, float(self.config.beta))
        return phi

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        phi, _zero = rnd.polya_urn_dirichlet(key, nkw, self.config.beta)
        if type_mask is not None:
            phi = jnp.where(type_mask[None, :], phi, prev_phi)
            phi = phi / jnp.maximum(jnp.sum(phi, axis=-1, keepdims=True),
                                    _EPS)
        return phi

    def _word_weights_t(self, state: LDAState):
        # exact zeros in phi give exactly zero probability (linear space).
        return state.phi.T, None

    def get_phi_density(self) -> float:
        """Phi sparsity diagnostic (`log_phi_density`,
        LDAUtils.calculatePhiDensity:1754) — the headline quantity of the
        Polya-Urn paper."""
        import numpy as np
        phi = np.asarray(self.state.phi)
        return float((phi > 0).mean())
