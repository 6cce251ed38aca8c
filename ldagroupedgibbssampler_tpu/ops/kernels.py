"""The hot z-step sweeps, as fused XLA programs.

These are the TPU replacements for the reference's per-token thread-pool
loops (SURVEY.md §3.2 hot loop, UncollapsedParallelLDA.java:1466-1545). Each
sweep is a single jit-able function: gathers of phi/theta rows, K-wide
linear-space weights, inverse-CDF categorical draws (one uniform per token,
cumsum as a triangular MXU matmul), vectorised over all documents at one
token position (doc-major layout). The token-parallel GGS sweep lives in
models/ggs.py (fused Pallas kernel + segmented XLA fallback).

A Pallas kernel for the sweep was evaluated and rejected on this target:
the z-draw needs a per-token row gather from the theta/phi tables, and
Mosaic on the available TPU backend supports neither vectorised VMEM
gathers (`jnp.take` / fancy indexing / take_along_axis all fail to lower)
nor a per-row `fori_loop` copy (compiler crash). The one-hot-matmul
alternative requires doc- and type-locality simultaneously, which no
single token ordering provides. The fused XLA sweep (see PERF.md for
measurements) is the fastest formulation available.

Sweep semantics per scheme:
  - `doc_sequential_sweep` — per-document sequential dependency on n_dk,
      vectorised across documents: PCGS (UncollapsedParallelLDA.java:
      1509-1531 keeps phi fixed within a sweep; n_dk updates immediately),
      and ADLDA's collapsed draw against sweep-stale global counts
      (ADLDA.java / MyWorkerRunnable.java — see adlda.py for the staleness
      contract).
  - `cgs_serial_sweep`  — fully serial collapsed scan, the correctness
      oracle (SerialCollapsedLDA.java:159-172 / ModifiedSimpleLDA.java:
      158-226).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_EPS = 1e-30


def _log(x):
    return jnp.log(x + _LOG_EPS)


def doc_sequential_sweep(key: jax.Array, w_pad: jax.Array,
                         mask_pad: jax.Array, z_pad: jax.Array,
                         ndk: jax.Array, word_weights_t: jax.Array,
                         alpha: jax.Array, doc_sel: jax.Array,
                         self_correction: jax.Array | None = None):
    """One Gibbs sweep with intra-document sequentialism.

    lax.scan over token position t; at each step every document resamples its
    t-th token in parallel:

        n_dk -= onehot(z_old)                            (decrement, :1505)
        weights = (n_dk + alpha) * word_weights_t[w_t]    (:1509-1513)
        z_new by inverse-CDF with ONE uniform per token   (:1519-1531)
        n_dk += onehot(z_new)                            (increment, :1542)

    LINEAR space throughout — the reference's own arithmetic — with the
    inverse-CDF draw (cumsum + one uniform) instead of Gumbel-max: no
    per-element log/exp in the hot loop (measured 1.5-2x on PCGS/ADLDA),
    and exact zeros in sparse phi rows get exactly zero probability.

    word_weights_t[V, K] encodes the scheme:
      PCGS / uncollapsed: phi.T (phi fixed within the sweep — exactly the
        Java staleness, UncollapsedParallelLDA.java:1509).
      ADLDA collapsed:    (beta + N_kw) / (V beta + n_k), stale for the
        whole sweep (ADLDA replica semantics).

    `self_correction = (nkw, nk, beta)` for collapsed schemes excludes the
    token's own global count at k == z_old:
    (n_dk + alpha_z)(beta + N_{z,w} - 1)/(V beta + n_z - 1). None for
    PCGS/GGS where phi carries no self-count.

    Docs with doc_sel False (random-scan unselected) keep all their z.
    Returns (ndk_out[int32], z_out[D, L]).
    """
    num_docs, length = w_pad.shape
    num_topics = ndk.shape[1]
    keys = jax.random.split(key, length)
    alpha_f = alpha.astype(jnp.float32)
    tri = jnp.triu(jnp.ones((num_topics, num_topics), jnp.float32))

    if self_correction is not None:
        nkw, nk, beta = self_correction
        num_types = nkw.shape[1]
        beta_v = beta * num_types
        # the correction indexes the PRE-SWEEP z (z_pad) against the stale
        # global counts — both loop constants, so the [D, L] gathers hoist
        # out of the scan as one batched gather each
        own_ratio_all = (
            jnp.maximum(beta + nkw[z_pad, w_pad].astype(jnp.float32) - 1.0,
                        0.0)
            / jnp.maximum(beta_v + nk[z_pad].astype(jnp.float32) - 1.0,
                          1e-30))                           # [D, L]
        alpha_z_all = alpha_f[z_pad]                        # [D, L]

    def step(ndk_c, xs):
        if self_correction is not None:
            kt, wt, mt, zt, own_ratio, alpha_z = xs
        else:
            kt, wt, mt, zt = xs
        active = mt & doc_sel
        dec = active.astype(jnp.int32)
        onehot_old = jax.nn.one_hot(zt, num_topics, dtype=jnp.int32)
        ndk_c = ndk_c - onehot_old * dec[:, None]
        weights = (ndk_c.astype(jnp.float32) + alpha_f) \
            * word_weights_t[wt]                           # [D, K]
        if self_correction is not None:
            # exclude this token's own global count at k == z_old; the
            # loop-carried ndk_c row value comes from a one-hot reduce
            # (dense [D, K] math beats a [D] gather + scatter per position)
            ndk_at_z = jnp.sum(ndk_c * onehot_old, axis=1)
            corrected = (ndk_at_z.astype(jnp.float32) + alpha_z) * own_ratio
            weights = jnp.where(onehot_old > 0, corrected[:, None], weights)
        # cumsum as a triangular matmul: MXU work instead of a log-depth
        # VPU scan (the K=100 ADLDA sweep measured 10M tokens/s with
        # jnp.cumsum vs 14M+ with the matmul form)
        cdf = jax.lax.dot(weights, tri,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        u = jax.random.uniform(kt, (num_docs,), jnp.float32) * cdf[:, -1]
        z_new = jnp.minimum(
            jnp.sum((cdf <= u[:, None]).astype(jnp.int32), axis=1),
            num_topics - 1)
        z_new = jnp.where(active, z_new, zt)
        onehot_new = jax.nn.one_hot(z_new, num_topics, dtype=jnp.int32)
        ndk_c = ndk_c + onehot_new * dec[:, None]
        return ndk_c, z_new

    if self_correction is not None:
        xs = (keys, w_pad.T, mask_pad.T, z_pad.T, own_ratio_all.T,
              alpha_z_all.T)
    else:
        xs = (keys, w_pad.T, mask_pad.T, z_pad.T)
    ndk_out, z_cols = jax.lax.scan(step, ndk, xs)
    return ndk_out, z_cols.T


def cgs_serial_sweep(key: jax.Array, w: jax.Array, doc_ids: jax.Array,
                     mask: jax.Array, z: jax.Array, ndk: jax.Array,
                     nkw: jax.Array, nk: jax.Array, alpha: jax.Array,
                     beta: jax.Array):
    """Fully serial collapsed Gibbs sweep over every token, in corpus order.

    The exact Griffiths & Steyvers chain (ModifiedSimpleLDA.java:158-226):
    score_k = (alpha_k + n_dk^{-i}) (beta + n_kw^{-i}) / (V beta + n_k^{-i}),
    inverse-CDF draw. O(N) sequential scan — the correctness oracle, used on
    small corpora and in tests, not a performance path.

    Returns (ndk, nkw, nk, z) after the sweep.
    """
    num_types = nkw.shape[1]
    beta_v = beta * num_types
    n = w.shape[0]
    # one batched uniform per token, drawn OUTSIDE the scan: a per-step
    # scalar threefry inside the scan serialises dozens of tiny ops per
    # token and dominated the oracle's runtime
    us = jax.random.uniform(key, (n,), dtype=jnp.float32)

    def step(carry, xs):
        ndk_c, nkw_c, nk_c = carry
        ut, wt, dt, mt, zt = xs
        dec = mt.astype(jnp.int32)
        ndk_c = ndk_c.at[dt, zt].add(-dec)
        nkw_c = nkw_c.at[zt, wt].add(-dec)
        nk_c = nk_c.at[zt].add(-dec)
        scores = ((alpha + ndk_c[dt].astype(jnp.float32))
                  * (beta + nkw_c[:, wt].astype(jnp.float32))
                  / (beta_v + nk_c.astype(jnp.float32)))
        u = ut * jnp.sum(scores)
        z_new = jnp.argmax(jnp.cumsum(scores) > u).astype(jnp.int32)
        z_new = jnp.where(mt, z_new, zt)
        inc = dec
        ndk_c = ndk_c.at[dt, z_new].add(inc)
        nkw_c = nkw_c.at[z_new, wt].add(inc)
        nk_c = nk_c.at[z_new].add(inc)
        return (ndk_c, nkw_c, nk_c), z_new

    (ndk, nkw, nk), z_new = jax.lax.scan(
        step, (ndk, nkw, nk), (us, w, doc_ids, mask, z))
    return ndk, nkw, nk, z_new
