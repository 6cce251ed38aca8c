"""CGS — serial collapsed Gibbs (scheme `collapsed`), the correctness oracle.

Reference: topics/SerialCollapsedLDA.java (880 LoC) extending MALLET
SimpleLDA: a strictly sequential sweep over every token with the classic
Griffiths & Steyvers collapsed conditional
(alpha_k + n_dk^{-i})(beta + n_kw^{-i}) / (V beta + n_k^{-i})
(ModifiedSimpleLDA.java:196-203), plus per-iteration augmented theta/phi
draws for diagnostics (SerialCollapsedLDA.java:217-218, :276).

TPU note: this chain is inherently serial — it exists for LL-parity testing
against the parallel schemes (SURVEY.md §7.4c), not for throughput. The sweep
is a `lax.scan` over tokens so it still runs entirely on device.

phi/theta here are *diagnostic* augmented draws (the collapsed chain doesn't
condition on them): phi ~ Dir(N + beta), theta ~ Dir(M + alpha) each
iteration, mirroring SerialCollapsedLDA.java:217-218,276.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.models.base import LDAState, TpuLDASampler
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.ops.kernels import cgs_serial_sweep


class SerialCollapsedLDA(TpuLDASampler):
    layout = "flat"
    smooth_phi = True

    def _initial_theta(self, key, ndk, alpha):
        return rnd.dirichlet(key, ndk.astype(jnp.float32) + alpha)

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        k_z, k_phi, k_theta, k_next = jax.random.split(state.key, 4)
        # Random-scan doc selection composes with the serial sweep by
        # masking unselected docs' tokens out of the update.
        sel = self.mask & doc_mask[self.doc_ids]
        ndk, nkw, nk, z = cgs_serial_sweep(
            k_z, self.w, self.doc_ids, sel, state.z, state.ndk, state.nkw,
            state.nk, state.alpha, state.beta)
        # Augmented diagnostic draws (not part of the chain).
        phi = rnd.dirichlet(k_phi, nkw.astype(jnp.float32) + state.beta)
        theta = rnd.dirichlet(k_theta, ndk.astype(jnp.float32) + state.alpha)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw, nk=nk,
                              phi=phi, theta=theta,
                              iteration=state.iteration + 1)
