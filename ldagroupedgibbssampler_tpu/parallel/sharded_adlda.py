"""Multi-chip ADLDA: per-shard collapsed sweeps against replicated stale
counts, one count merge per sweep.

This is the P4 pattern of SURVEY.md §2.2 mapped onto the mesh: the
reference copies typeTopicCounts/tokensPerTopic into per-thread replicas
(ADLDA.java:176-210), sweeps each document shard collapsed against the
stale replica, then merges (`sumTypeTopicCounts` :302) and re-broadcasts
(:306-332). Here the "replica" is the replicated N_kw/n_k tensor, each
shard runs the vectorised collapsed sweep over its padded document block,
and the merge+re-broadcast is ONE `psum` of shard-local count matrices per
iteration over ICI — exactly the BASELINE.json "ADLDA delta-merge"
decomposition.
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
from ldagroupedgibbssampler_tpu.ops.kernels import doc_sequential_sweep
from ldagroupedgibbssampler_tpu.parallel.mesh import make_mesh
from ldagroupedgibbssampler_tpu.parallel.sharded_ggs import (
    partition_documents)

_EPS = 1e-30


class ShardedADLDA(TpuLDASampler):
    layout = "doc_major_sharded"
    smooth_phi = True
    nkw_layout = "kv"
    # collapsed=True: the sweep scores the stale collapsed word term with
    # the own-count self-correction (ADLDA). ShardedPCGS flips this to
    # score against the explicitly drawn phi (parallel/sharded_pcgs.py).
    collapsed = True

    def __init__(self, config, logger=None, mesh=None):
        super().__init__(config, logger=logger)
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh_shape or None, tuple(config.mesh_axis_names))
        (self.axis,) = self.mesh.axis_names

    # ------------------------------------------------------------------
    def _prepare_device_data(self, corpus: Corpus):
        cfg = self.config
        S = self.mesh.devices.size
        bounds = partition_documents(corpus, S)
        self.doc_bounds = bounds
        lengths = corpus.doc_lengths()
        dp = max(int(bounds[s + 1] - bounds[s]) for s in range(S))
        lmax = int(lengths.max()) if corpus.num_tokens else 1
        mult = cfg.doc_length_multiple
        lmax = ((lmax + mult - 1) // mult) * mult
        self.docs_per_shard, self.max_len = dp, lmax

        w = np.zeros((S, dp, lmax), np.int32)
        mask = np.zeros((S, dp, lmax), bool)
        for s in range(S):
            d0, d1 = bounds[s], bounds[s + 1]
            for j, d in enumerate(range(d0, d1)):
                t0, t1 = corpus.doc_offsets[d], corpus.doc_offsets[d + 1]
                w[s, j, : t1 - t0] = corpus.tokens[t0:t1]
                mask[s, j, : t1 - t0] = True
        shard = NamedSharding(self.mesh, P(self.axis, None, None))
        self.w_pad = jax.device_put(jnp.asarray(w), shard)
        self.mask_pad = jax.device_put(jnp.asarray(mask), shard)

    def _init_state(self, key: jax.Array) -> LDAState:
        cfg, corpus = self.config, self.corpus
        S = self.mesh.devices.size
        K, V = cfg.topics, corpus.num_types
        k_z, k_phi, k_next = jax.random.split(key, 3)
        shard3 = NamedSharding(self.mesh, P(self.axis, None, None))
        repl = NamedSharding(self.mesh, P())

        z = jax.random.randint(k_z, self.w_pad.shape, 0, K, jnp.int32)
        z = jax.device_put(jnp.where(self.mask_pad, z, 0), shard3)
        ones = jnp.where(self.mask_pad, 1, 0)
        s_idx = jnp.broadcast_to(jnp.arange(S)[:, None, None], z.shape)
        d_idx = jnp.broadcast_to(
            jnp.arange(self.docs_per_shard)[None, :, None], z.shape)
        ndk = jnp.zeros((S, self.docs_per_shard, K), jnp.int32
                        ).at[s_idx, d_idx, z].add(ones)
        ndk = jax.device_put(ndk, shard3)
        nkw = jnp.zeros((K, V), jnp.int32).at[
            z.reshape(-1), self.w_pad.reshape(-1)].add(ones.reshape(-1))
        nkw = jax.device_put(nkw, repl)
        alpha = jax.device_put(self._alpha_vector(), repl)
        beta = jnp.float32(cfg.beta)
        phi = jax.device_put(
            rnd.dirichlet(k_phi, nkw.astype(jnp.float32) + beta), repl)
        return LDAState(key=k_next, z=z, ndk=ndk, nkw=nkw,
                        nk=jnp.sum(nkw, axis=-1), phi=phi, theta=None,
                        alpha=alpha, beta=beta, iteration=jnp.int32(0))

    # ------------------------------------------------------------------
    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        conc = nkw.astype(jnp.float32) + beta
        if type_mask is None:
            return rnd.dirichlet(key, conc)
        return rnd.conditional_dirichlet(key, prev_phi, conc, type_mask)

    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask) -> LDAState:
        cfg = self.config
        K, V = cfg.topics, self.corpus.num_types
        axis = self.axis
        S = self.mesh.devices.size
        dm = jnp.zeros((S, self.docs_per_shard), bool)
        bounds = self.doc_bounds
        for s in range(S):
            d0, d1 = int(bounds[s]), int(bounds[s + 1])
            dm = dm.at[s, : d1 - d0].set(doc_mask[d0:d1])

        key, k_phi, k_next = jax.random.split(state.key, 3)
        if self.collapsed:
            # stale collapsed word term, replicated (the per-thread replica)
            word_weights_t = (
                (state.beta + state.nkw.T.astype(jnp.float32))
                / (state.beta * V + state.nk.astype(jnp.float32))[None, :])
        else:
            # PCGS: phi fixed within the sweep
            # (UncollapsedParallelLDA.java:1509)
            word_weights_t = state.phi.T

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(), P(axis, None, None), P(axis, None, None),
                           P(axis, None, None), P(axis, None, None),
                           P(), P(), P(axis, None), P(), P(), P()),
                 out_specs=(P(axis, None, None), P(axis, None, None), P()),
                 check_vma=False)
        def shard_body(key_in, w, mask, z_old, ndk, wl_t, alpha, dm_local,
                       nkw_stale, nk_stale, beta_in):
            sidx = jax.lax.axis_index(axis)
            ks = jax.random.fold_in(key_in, sidx)
            ndk_new, z = doc_sequential_sweep(
                ks, w[0], mask[0], z_old[0], ndk[0], wl_t, alpha,
                dm_local[0],
                self_correction=((nkw_stale, nk_stale, beta_in)
                                 if self.collapsed else None))
            ones = jnp.where(mask[0], 1, 0)
            nkw_local = jnp.zeros((K, V), jnp.int32).at[
                z.reshape(-1), w[0].reshape(-1)].add(ones.reshape(-1))
            # the AD-LDA merge + re-broadcast: one psum per sweep
            nkw_global = jax.lax.psum(nkw_local, axis)
            return z[None], ndk_new[None], nkw_global

        z, ndk, nkw = shard_body(key, self.w_pad, self.mask_pad, state.z,
                                 state.ndk, word_weights_t, state.alpha, dm,
                                 state.nkw, state.nk, state.beta)
        # replicated phi redraw (shared key, no broadcast); for ADLDA this
        # is the augmented diagnostic draw, for PCGS it is the chain's phi
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=-1), phi=phi,
                              iteration=state.iteration + 1)

    # ------------------------------------------------------------------
    def get_document_topic_matrix(self) -> np.ndarray:
        ndk = np.asarray(self.state.ndk)
        out = np.zeros((self.corpus.num_docs, self.config.topics), np.int32)
        for s in range(self.mesh.devices.size):
            d0, d1 = int(self.doc_bounds[s]), int(self.doc_bounds[s + 1])
            out[d0:d1] = ndk[s, : d1 - d0]
        return out

    def get_z_indicators(self) -> np.ndarray:
        z = np.asarray(self.state.z)
        mask = np.asarray(self.mask_pad)
        out = np.zeros(self.corpus.num_tokens, np.int32)
        pos = 0
        for s in range(self.mesh.devices.size):
            d0, d1 = int(self.doc_bounds[s]), int(self.doc_bounds[s + 1])
            for j in range(d1 - d0):
                n = int(mask[s, j].sum())
                out[pos: pos + n] = z[s, j, :n]
                pos += n
        return out
