"""Spalias — sparse partially-collapsed LDA (Magnusson et al.), scheme
`spalias`.

Reference: topics/SpaliasUncollapsedParallelLDA.java (376 LoC): decomposes
the PCGS conditional p(z=k) ∝ (n_dk + alpha_k) phi[k][w] into a *document*
part n_dk·phi (sparse cumsum over the doc's nonzero topics, :186-198) and a
*prior* part alpha_k·phi (pre-tabled per type in Walker alias tables rebuilt
each iteration, :39-115), drawn via a two-bucket u-split (:277-293) with
swap-remove nonzero-topic bookkeeping (:295-344).

TPU-first analysis: the alias decomposition exists because a scalar CPU core
pays O(K) per token for the dense cumsum, while the table amortises the prior
part to O(1). On TPU the dense K-wide Gumbel-max draw is a *vector* op — all
K lanes in one VPU issue — so the crossover the alias table targets does not
exist until K is far beyond this model family's range, and the
data-dependent table build + u-split branch would serialise the kernel.
The chain sampled here is therefore *identical in distribution* to the
reference's Spalias (same PCGS target: phi-stale-within-sweep,
n_dk-immediate), implemented with the dense fused sweep. The reference's
alias-table *mechanism* is covered behaviourally: same conditional, same
staleness, same phi smoothing.

For very large K the sparse advantage is recovered on TPU by the top-K
two-bucket design (prior bucket mass per type precomputed as
sum_k alpha_k phi_kw — a [V] vector — and a doc bucket over the ≤L_d nonzero
doc topics); `alias_equivalent_prior_mass` below exposes that prior table
for the large-K path and for tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.models.pcgs import (
    LDAPartiallyCollapsedGibbsSampler)


def alias_equivalent_prior_mass(phi: jnp.ndarray,
                                alpha: jnp.ndarray) -> jnp.ndarray:
    """Per-type prior-bucket mass sum_k alpha_k phi[k][w] — the normalising
    constant of the reference's per-type alias tables
    (SpaliasUncollapsedParallelLDA.java:83-115)."""
    return jnp.einsum("k,kv->v", alpha, phi)


class SpaliasUncollapsedParallelLDA(LDAPartiallyCollapsedGibbsSampler):
    """Same Markov chain as PCGS; see module docstring for why the alias
    mechanism is replaced by the dense fused sweep on TPU."""

    smooth_phi = True
