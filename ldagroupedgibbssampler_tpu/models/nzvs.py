"""NZVS-Spalias: variable-selection (spike-and-slab) phi, scheme
`nzvsspalias`.

Reference: topics/NZVSSpaliasUncollapsedParallelLDA.java (538 LoC): phi rows
drawn by `VSDirichlet.nextDistribution` (types/VSDirichlet.java) — a
zero-inflated Dirichlet where zero-count coordinates are included in the
support only with posterior inclusion probability; the global
`nonZeroTypeTopicIdxs` set (per-type locks :56-67) tracks the sparse phi
support for the alias path.

TPU-first: `ops.random.vs_dirichlet` vectorises the inclusion draws + Gamma
draws over the whole [K, V] matrix; the support mask replaces the locked
index set, and the token sweep gets exact-zero support the same way the
Polya-Urn sampler does.
"""

from __future__ import annotations

import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.models.polyaurn import PolyaUrnSpaliasLDA
from ldagroupedgibbssampler_tpu.ops import random as rnd

_EPS = 1e-30


class NZVSSpaliasUncollapsedParallelLDA(PolyaUrnSpaliasLDA):
    vs_prior = 0.5
    # True -> the exact Java sequential-zeroPhi chain (VSDirichlet.java's
    # in-row running update); the validation/parity knob the Geweke
    # harness drives (tests/test_geweke.py). Default stays the vectorised
    # systematic-scan form.
    vs_sequential = False

    def _initial_phi(self, key, nkw, beta):
        # previous_phi=None: the pre-draw phi is dense (zeroPhi = 0),
        # matching the Java bootstrap from the parent class's dense init.
        phi, _zero = rnd.vs_dirichlet(key, nkw, float(self.config.beta),
                                      self.vs_prior,
                                      sequential=self.vs_sequential)
        return phi

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        phi, _zero = rnd.vs_dirichlet(key, nkw, self.config.beta,
                                      self.vs_prior, previous_phi=prev_phi,
                                      sequential=self.vs_sequential)
        if type_mask is not None:
            phi = jnp.where(type_mask[None, :], phi, prev_phi)
            phi = phi / jnp.maximum(jnp.sum(phi, axis=-1, keepdims=True),
                                    _EPS)
        return phi
