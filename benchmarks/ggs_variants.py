"""Perf experiments on the GGS fused step (run on the real TPU chip).

Variants measured (vs models/ggs.py baseline), all at 20NG scale
(D=11269, V=20000, K=100, N~1.35M):

  base     current _step
  f16      log_theta / log_phi tables stored float16, upcast after gather
           (halves the gather bytes; the z-draw is gather-bandwidth-bound)
  bf16     same with bfloat16
  f16th    only the theta table in f16 (locates which gather dominates)
  f16ph    only the phi table in f16
  matphi   per-token log-phi via the (already built) [vspan, B] indicator
           transposed-matmul instead of a row gather
  ndkmat   ndk rebuilt by doc-sorted blocked indicator matmuls (z permuted
           once by a static index) instead of the [D, K] scatter-add
  f16+ndk  f16 + ndkmat combined

Usage: python benchmarks/ggs_variants.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ldagroupedgibbssampler_tpu.config import LDAConfig  # noqa: E402
from ldagroupedgibbssampler_tpu.models.ggs import (  # noqa: E402
    LDAGroupedGibbsSampler, _EPS)

sys.path.insert(0, ".")
from bench import synth_corpus  # noqa: E402


class GGSTables(LDAGroupedGibbsSampler):
    """GGS with configurable table dtype for the gathered log tables."""

    theta_dtype = jnp.float32
    phi_dtype = jnp.float32
    phi_via_matmul = False

    def _step(self, state, doc_mask, type_mask):
        cfg = self.config
        num_topics = cfg.topics
        num_types = self.corpus.num_types
        vspan = cfg.vocab_span
        block = self.wb.shape[1]
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)

        theta = self._theta_update(k_theta, state, doc_mask)
        log_theta = jnp.log(theta + _EPS).astype(self.theta_dtype)
        log_phi_pad = jnp.pad(jnp.log(state.phi + _EPS),
                              ((0, vspan), (0, 0))).astype(self.phi_dtype)
        keys = jax.random.split(k_z, self.num_blocks)

        def blk(nkw_acc, xs):
            k, wi, di, mi, mbf, zi, v0 = xs
            phi_loc = jax.lax.dynamic_slice(log_phi_pad, (v0, 0),
                                            (vspan, num_topics))
            ind = (wi[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (vspan, block), 0)).astype(jnp.bfloat16) \
                * mbf[None, :]
            if self.phi_via_matmul:
                phi_tok = jax.lax.dot(
                    ind.T, phi_loc.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            else:
                phi_tok = phi_loc[wi].astype(jnp.float32)
            logits = log_theta[di].astype(jnp.float32) + phi_tok
            g = jax.random.gumbel(k, logits.shape, dtype=jnp.float32)
            z_new = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
            sel = mi & doc_mask[di]
            z_new = jnp.where(sel, z_new, zi)
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

        ndk = self._rebuild_ndk(z)
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                              iteration=state.iteration + 1)

    def _rebuild_ndk(self, z):
        ones = jnp.where(self.maskb, 1, 0)
        return jnp.zeros((self.corpus.num_docs, self.config.topics),
                         jnp.int32).at[
            self.db.reshape(-1), z.reshape(-1)].add(ones.reshape(-1))


class GGSNdkMat(GGSTables):
    """ndk via doc-sorted blocked indicator matmuls.

    z lives in w-sorted blocks; a static permutation gathers it back to
    corpus (= doc-sorted) order, where every block of B tokens spans a small
    contiguous doc range [d0, d0+dspan), so the doc-topic histogram is a
    [dspan, B] @ [B, K] MXU matmul accumulated into a [D+dspan, K] carry.
    """

    def _prepare_device_data(self, corpus):
        super()._prepare_device_data(corpus)
        blocks = self._blocks
        n = corpus.num_tokens
        block = blocks.w_local.shape[1]
        # static: w-sorted flat slot of every corpus-order token
        flat = blocks.flat_index.reshape(-1)
        valid = flat >= 0
        pos_w = np.zeros(n, np.int64)
        pos_w[flat[valid]] = np.arange(len(flat))[valid]
        n_pad = ((n + block - 1) // block) * block
        perm = np.zeros(n_pad, np.int32)
        perm[:n] = pos_w
        dmask = np.zeros(n_pad, bool)
        dmask[:n] = True
        doc_ids = np.zeros(n_pad, np.int32)
        doc_ids[:n] = corpus.token_doc_ids()
        nb2 = n_pad // block
        d0 = doc_ids.reshape(nb2, block)[:, 0].copy()
        dlocal = doc_ids.reshape(nb2, block) - d0[:, None]
        dspan = int(dlocal.max()) + 1
        dspan = ((dspan + 7) // 8) * 8
        self.perm = jnp.asarray(perm)
        self.d0 = jnp.asarray(d0)
        self.dlocal = jnp.asarray(dlocal)
        self.dmask_bf16 = jnp.asarray(
            dmask.reshape(nb2, block).astype(np.float32)).astype(jnp.bfloat16)
        self._dspan = dspan
        self._nb2 = nb2

    def _rebuild_ndk(self, z):
        num_topics = self.config.topics
        block = self.wb.shape[1]
        dspan = self._dspan
        z_doc = jnp.take(z.reshape(-1), self.perm).reshape(self._nb2, block)

        def blk(ndk_acc, xs):
            zi, dl, d0, mbf = xs
            ind = (dl[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (dspan, block), 0)).astype(jnp.bfloat16) \
                * mbf[None, :]
            onehot = (zi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (block, num_topics), 1)).astype(jnp.bfloat16)
            part = jax.lax.dot(ind, onehot,
                               preferred_element_type=jnp.float32)
            cur = jax.lax.dynamic_slice(ndk_acc, (d0, 0),
                                        (dspan, num_topics))
            return jax.lax.dynamic_update_slice(ndk_acc, cur + part,
                                                (d0, 0)), None

        ndk0 = jnp.zeros((self.corpus.num_docs + dspan, num_topics),
                         jnp.float32)
        ndk_acc, _ = jax.lax.scan(
            blk, ndk0, (z_doc, self.dlocal, self.d0, self.dmask_bf16))
        return ndk_acc[: self.corpus.num_docs].astype(jnp.int32)


VARIANTS = {
    "base": (GGSTables, {}),
    "f16": (GGSTables, {"theta_dtype": jnp.float16,
                        "phi_dtype": jnp.float16}),
    "bf16": (GGSTables, {"theta_dtype": jnp.bfloat16,
                         "phi_dtype": jnp.bfloat16}),
    "f16th": (GGSTables, {"theta_dtype": jnp.float16}),
    "f16ph": (GGSTables, {"phi_dtype": jnp.float16}),
    "matphi": (GGSTables, {"theta_dtype": jnp.float16,
                           "phi_via_matmul": True}),
    "ndkmat": (GGSNdkMat, {}),
    "f16+ndk": (GGSNdkMat, {"theta_dtype": jnp.float16,
                            "phi_dtype": jnp.float16}),
}


def run_variant(name, corpus, iters=10):
    cls, attrs = VARIANTS[name]
    sub = type(f"V_{name.replace('+', '_')}", (cls,), attrs)
    cfg = LDAConfig(scheme="ggs", topics=100, alpha=0.5, beta=0.01,
                    seed=2019, exec_time=-1)
    model = sub(cfg)
    model.add_instances(corpus)
    run = model._multi_step_fn(iters)
    model.state = run(model.state)     # warmup/compile
    _ = np.asarray(model.state.nk)
    t0 = time.perf_counter()
    model.state = run(model.state)
    _ = np.asarray(model.state.nk)
    dt = time.perf_counter() - t0
    tps = corpus.num_tokens * iters / dt
    # sanity: counts conserve
    assert int(np.asarray(model.state.nkw).sum()) == corpus.num_tokens
    assert int(np.asarray(model.state.ndk).sum()) == corpus.num_tokens
    return dt / iters * 1e3, tps


def main():
    names = sys.argv[1:] or list(VARIANTS)
    corpus = synth_corpus()
    print(f"corpus: D={corpus.num_docs} V={corpus.num_types} "
          f"N={corpus.num_tokens}")
    for name in names:
        ms, tps = run_variant(name, corpus)
        print(f"{name:8s}  {ms:7.2f} ms/iter   {tps/1e6:7.1f} M tokens/s")


if __name__ == "__main__":
    main()
