"""Multi-chip GGS: documents sharded over a 1-D device mesh.

This is the BASELINE.json north-star decomposition (SURVEY.md §5
"Distributed communication backend"): per-shard theta draws are entirely
local (the GGS "group exchange" needs no communication), the only cross-chip
traffic is one `psum` of the shard-local N_kw count matrices per iteration
riding ICI, and phi is redrawn *identically on every shard* from the summed
counts with a shared PRNG key — a replicated computation instead of a
broadcast.

Contrast with the reference's parallelism for the same scheme: ForkJoinPool
doc splitting + AtomicInteger delta matrix + per-topic updater threads
(UncollapsedParallelLDA.java:1354-1437, 1107-1221). The psum *is* the delta
merge; z-state never leaves its shard.

Layout: documents are assigned to shards in contiguous ranges balanced by
token count; each shard's tokens are padded to a common length Ns (multiple
of `token_block`), with local doc ids 0..Dp-1. Arrays:
    w, doc_local, mask, z : [S, Ns]   sharded on axis 0 ("data")
    ndk, theta            : [S, Dp, K] sharded on axis 0
    nkw, phi, alpha       : replicated
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.base import LDAState, TpuLDASampler
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.parallel.mesh import make_mesh

_EPS = 1e-30


def partition_documents(corpus: Corpus, num_shards: int):
    """Contiguous doc ranges with balanced token counts. Returns
    doc_bounds[S+1] (greedy split along the cumulative token distribution)."""
    offsets = corpus.doc_offsets
    total = corpus.num_tokens
    bounds = [0]
    for s in range(1, num_shards):
        target = total * s / num_shards
        bounds.append(int(np.searchsorted(offsets, target)))
    bounds.append(corpus.num_docs)
    bounds = np.maximum.accumulate(np.asarray(bounds))
    return bounds


class ShardedGGS(TpuLDASampler):
    """GGS with documents sharded over `mesh` (default: all devices).

    Uses the reference [K, V] count orientation and the simple flat sweep
    per shard (the single-chip fused w-sorted layout is in models/ggs.py;
    a sharded version of that layout composes per-shard later)."""

    layout = "flat"
    smooth_phi = True
    nkw_layout = "kv"

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        conc = nkw.astype(jnp.float32) + beta
        if type_mask is None:
            return rnd.dirichlet(key, conc)
        return rnd.conditional_dirichlet(key, prev_phi, conc, type_mask)

    def __init__(self, config, logger=None, mesh=None):
        super().__init__(config, logger=logger)
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh_shape or None, tuple(config.mesh_axis_names))
        (self.axis,) = self.mesh.axis_names

    # ------------------------------------------------------------------
    def _prepare_device_data(self, corpus: Corpus):
        cfg = self.config
        S = self.mesh.devices.size
        block = cfg.token_block
        bounds = partition_documents(corpus, S)
        self.doc_bounds = bounds
        dp = max(int(bounds[s + 1] - bounds[s]) for s in range(S))
        self.docs_per_shard = dp
        lengths = corpus.doc_lengths()
        ns = max(int(corpus.doc_offsets[bounds[s + 1]]
                     - corpus.doc_offsets[bounds[s]]) for s in range(S))
        ns = max(block, ((ns + block - 1) // block) * block)

        w = np.zeros((S, ns), np.int32)
        doc_local = np.zeros((S, ns), np.int32)
        mask = np.zeros((S, ns), bool)
        flat_index = np.full((S, ns), -1, np.int64)
        for s in range(S):
            d0, d1 = bounds[s], bounds[s + 1]
            t0, t1 = corpus.doc_offsets[d0], corpus.doc_offsets[d1]
            n_local = int(t1 - t0)
            w[s, :n_local] = corpus.tokens[t0:t1]
            doc_local[s, :n_local] = np.repeat(
                np.arange(d1 - d0, dtype=np.int32), lengths[d0:d1])
            mask[s, :n_local] = True
            flat_index[s, :n_local] = np.arange(t0, t1)
        self._flat_index = flat_index
        shard = NamedSharding(self.mesh, P(self.axis, None))
        self.w = jax.device_put(jnp.asarray(w), shard)
        self.doc_local = jax.device_put(jnp.asarray(doc_local), shard)
        self.mask = jax.device_put(jnp.asarray(mask), shard)

    def _shard3(self):
        return NamedSharding(self.mesh, P(self.axis, None, None))

    def _init_state(self, key: jax.Array) -> LDAState:
        cfg, corpus = self.config, self.corpus
        S = self.mesh.devices.size
        num_topics, num_types = cfg.topics, corpus.num_types
        k_z, k_phi, k_theta, k_next = jax.random.split(key, 4)
        shard2 = NamedSharding(self.mesh, P(self.axis, None))

        z = jax.random.randint(k_z, self.w.shape, 0, num_topics, jnp.int32)
        z = jax.device_put(jnp.where(self.mask, z, 0), shard2)

        # local count build (replicated inputs fine at init; jit once)
        ndk = jnp.zeros((S, self.docs_per_shard, num_topics), jnp.int32)
        ndk = ndk.at[
            jnp.arange(S)[:, None].repeat(self.w.shape[1], 1),
            self.doc_local, z].add(jnp.where(self.mask, 1, 0))
        ndk = jax.device_put(ndk, self._shard3())
        nkw = jnp.zeros((num_topics, num_types), jnp.int32).at[
            z.reshape(-1), self.w.reshape(-1)].add(
            jnp.where(self.mask, 1, 0).reshape(-1))
        repl = NamedSharding(self.mesh, P())
        nkw = jax.device_put(nkw, repl)
        alpha = jax.device_put(self._alpha_vector(), repl)
        beta = jnp.float32(cfg.beta)
        phi = jax.device_put(
            rnd.dirichlet(k_phi, nkw.astype(jnp.float32) + beta), repl)
        theta = jax.device_put(rnd.dirichlet(
            k_theta, ndk.astype(jnp.float32) + alpha), self._shard3())
        return LDAState(key=k_next, z=z, ndk=ndk, nkw=nkw,
                        nk=jnp.sum(nkw, axis=-1), phi=phi, theta=theta,
                        alpha=alpha, beta=beta, iteration=jnp.int32(0))

    # ------------------------------------------------------------------
    def _step(self, state: LDAState, doc_mask,
              type_mask) -> LDAState:
        if doc_mask is None:   # full-sweep sentinel from _multi_step_fn
            doc_mask = jnp.ones((self.corpus.num_docs,), bool)
        cfg = self.config
        num_topics, num_types = cfg.topics, self.corpus.num_types
        block = cfg.token_block
        axis = self.axis

        # doc_mask comes in as global [D]; reshape to sharded [S, Dp].
        S = self.mesh.devices.size
        dm = jnp.zeros((S, self.docs_per_shard), bool)
        bounds = self.doc_bounds
        # static python loop over shards (S is small) — builds the padded
        # per-shard mask without host sync.
        for s in range(S):
            d0, d1 = int(bounds[s]), int(bounds[s + 1])
            dm = dm.at[s, : d1 - d0].set(doc_mask[d0:d1])

        key, k_phi, k_next = jax.random.split(state.key, 3)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(), P(axis, None), P(axis, None), P(axis, None),
                           P(axis, None), P(axis, None, None), P(), P(),
                           P(axis, None)),
                 out_specs=(P(axis, None), P(axis, None, None),
                            P(axis, None, None), P()),
                 check_vma=False)
        def shard_body(key_in, w, doc_local, mask, z_old, ndk, phi, alpha,
                       dm_local):
            sidx = jax.lax.axis_index(axis)
            ks = jax.random.fold_in(key_in, sidx)
            k_theta, k_z = jax.random.split(ks)
            # (1) theta: local Gamma draws. [1, Dp, K]
            theta_new = rnd.dirichlet(
                k_theta, ndk[0].astype(jnp.float32) + alpha)[None]
            # (2) fused token sweep on the local shard: linear-space
            # inverse-CDF (one uniform per token, cumsum as a triangular
            # MXU matmul) — same draw as models/ggs.py's XLA fallback.
            theta_l = theta_new[0]
            phi_t = phi.T
            tri = jnp.triu(jnp.ones((num_topics, num_topics), jnp.float32))
            sel = mask[0] & dm_local[0][doc_local[0]]
            n_local = w.shape[1]
            nb = n_local // block
            keys = jax.random.split(k_z, nb)

            def one_block(args):
                kb, wi, di, si, zi = args
                probs = theta_l[di] * phi_t[wi]
                cdf = jax.lax.dot(probs, tri,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
                u = (jax.random.uniform(kb, (probs.shape[0], 1),
                                        jnp.float32) * cdf[:, -1:])
                z_new = jnp.minimum(
                    jnp.sum((cdf <= u).astype(jnp.int32), axis=-1),
                    num_topics - 1)
                return jnp.where(si, z_new, zi)

            z = jax.lax.map(one_block, (
                keys, w[0].reshape(nb, block),
                doc_local[0].reshape(nb, block), sel.reshape(nb, block),
                z_old[0].reshape(nb, block))).reshape(-1)
            ones = jnp.where(mask[0], 1, 0)
            # (3) local counts; the ONLY cross-chip op is the nkw psum.
            ndk_new = jnp.zeros((self.docs_per_shard, num_topics), jnp.int32
                                ).at[doc_local[0], z].add(ones)
            nkw_local = jnp.zeros((num_topics, num_types), jnp.int32).at[
                z, w[0]].add(ones)
            nkw_global = jax.lax.psum(nkw_local, axis)
            return (z[None], ndk_new[None], theta_new, nkw_global)

        z, ndk, theta, nkw = shard_body(key, self.w, self.doc_local,
                                        self.mask, state.z, state.ndk,
                                        state.phi, state.alpha, dm)
        # theta rows of unselected docs keep their previous draw
        theta = jnp.where(dm[..., None], theta, state.theta)
        # (4) phi redraw — same key everywhere → replicated, no broadcast.
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=-1), phi=phi, theta=theta,
                              iteration=state.iteration + 1)

    # ------------------------------------------------------------------
    # layout-aware accessors
    # ------------------------------------------------------------------
    def get_z_indicators(self) -> np.ndarray:
        z = np.asarray(self.state.z).reshape(-1)
        idx = self._flat_index.reshape(-1)
        out = np.zeros(self.corpus.num_tokens, np.int32)
        valid = idx >= 0
        out[idx[valid]] = z[valid]
        return out

    def set_z_indicators(self, z_flat):
        z_flat = np.asarray(z_flat, np.int32)
        z = np.zeros(self._flat_index.shape, np.int32)
        valid = self._flat_index >= 0
        z[valid] = z_flat[self._flat_index[valid]]
        st = self.state
        z = jax.device_put(jnp.asarray(z),
                           NamedSharding(self.mesh, P(self.axis, None)))
        S = self.mesh.devices.size
        ndk = jnp.zeros((S, self.docs_per_shard, self.config.topics),
                        jnp.int32).at[
            jnp.arange(S)[:, None].repeat(self.w.shape[1], 1),
            self.doc_local, z].add(jnp.where(self.mask, 1, 0))
        nkw = jnp.zeros((self.config.topics, self.corpus.num_types),
                        jnp.int32).at[z.reshape(-1), self.w.reshape(-1)].add(
            jnp.where(self.mask, 1, 0).reshape(-1))
        key, k_phi = jax.random.split(st.key)
        phi = rnd.dirichlet(k_phi, nkw.astype(jnp.float32) + st.beta)
        self.state = st._replace(key=key, z=z,
                                 ndk=jax.device_put(ndk, self._shard3()),
                                 nkw=nkw, nk=jnp.sum(nkw, axis=-1), phi=phi)

    def get_document_topic_matrix(self) -> np.ndarray:
        ndk = np.asarray(self.state.ndk)
        out = np.zeros((self.corpus.num_docs, self.config.topics), np.int32)
        for s in range(self.mesh.devices.size):
            d0, d1 = int(self.doc_bounds[s]), int(self.doc_bounds[s + 1])
            out[d0:d1] = ndk[s, : d1 - d0]
        return out

    def get_theta_estimate(self) -> np.ndarray:
        ndk = self.get_document_topic_matrix().astype(np.float64)
        alpha = np.asarray(self.state.alpha, np.float64)
        denom = ndk.sum(axis=1, keepdims=True) + alpha.sum()
        return (ndk + alpha[None, :]) / np.maximum(denom, 1e-12)

    def get_zbar(self) -> np.ndarray:
        ndk = self.get_document_topic_matrix().astype(np.float64)
        return ndk / np.maximum(ndk.sum(axis=1, keepdims=True), 1.0)
