"""Microbenchmarks of the GGS iteration's individual phases on the real chip.

Isolates: theta row gather, phi slice gather, gumbel RNG, argmax, the nkw
indicator matmul, the ndk scatter-add, and a flat int32 permute gather —
each as its own jitted loop-of-iters program with host readback.
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

from bench import synth_corpus  # noqa: E402

D, V, K = 11269, 20000, 100
B, VSPAN = 8192, 512
REPS = 10


def timeit(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = jitted(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:34s} {dt:8.3f} ms/iter")
    return dt


def main():
    corpus = synth_corpus()
    blocks = corpus.w_sorted_blocks(block=B, vspan=VSPAN)
    nb = blocks.w_local.shape[0]
    print(f"blocks={nb}")
    key = jax.random.key(0, impl="rbg")
    wb = jnp.asarray(blocks.w_local)
    db = jnp.asarray(blocks.doc_ids)
    v0 = jnp.asarray(blocks.v0)
    log_theta = jax.random.uniform(key, (D, K), jnp.float32)
    log_phi = jax.random.uniform(key, (V + VSPAN, K), jnp.float32)
    z = jnp.asarray(np.random.default_rng(0).integers(0, K, (nb, B)),
                    jnp.int32)
    mask_bf16 = jnp.asarray(blocks.mask.astype(np.float32)).astype(
        jnp.bfloat16)
    perm = jnp.asarray(np.random.default_rng(1).permutation(nb * B)
                       .astype(np.int32))

    def loop(body):
        def f(*args):
            def it(c, _):
                return body(*args), None
            out, _ = jax.lax.scan(it, body(*args), None, length=REPS - 1)
            return out
        return f

    # 1. theta row gather over all blocks
    def theta_gather(log_theta, db):
        def blk(c, di):
            return c + jnp.sum(log_theta[di]), None
        out, _ = jax.lax.scan(blk, 0.0, db)
        return out
    timeit("theta gather [1.35M x K rows]", loop(theta_gather), log_theta, db)

    # 2. phi gather from dynamic slice
    def phi_gather(log_phi, wb, v0):
        def blk(c, xs):
            wi, v = xs
            loc = jax.lax.dynamic_slice(log_phi, (v, 0), (VSPAN, K))
            return c + jnp.sum(loc[wi]), None
        out, _ = jax.lax.scan(blk, 0.0, (wb, v0))
        return out
    timeit("phi slice gather", loop(phi_gather), log_phi, wb, v0)

    # 3. gumbel RNG [B, K] per block
    def gumbel_only(key):
        keys = jax.random.split(key, nb)
        def blk(c, k):
            g = jax.random.gumbel(k, (B, K), dtype=jnp.float32)
            return c + jnp.sum(g), None
        out, _ = jax.lax.scan(blk, 0.0, keys)
        return out
    timeit("gumbel RNG", loop(gumbel_only), key)

    # 4. gumbel + argmax on precomputed logits
    logits1 = jax.random.uniform(key, (B, K), jnp.float32)
    def gumbel_argmax(key, logits1):
        keys = jax.random.split(key, nb)
        def blk(c, k):
            g = jax.random.gumbel(k, (B, K), dtype=jnp.float32)
            zi = jnp.argmax(logits1 + g, axis=-1)
            return c + jnp.sum(zi), None
        out, _ = jax.lax.scan(blk, 0, keys)
        return out
    timeit("gumbel + argmax", loop(gumbel_argmax), key, logits1)

    # 5. nkw indicator matmul (incl. indicator + onehot builds + carry)
    def nkw_matmul(wb, z, mask_bf16, v0):
        def blk(acc, xs):
            wi, zi, mbf, v = xs
            ind = (wi[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (VSPAN, B), 0)).astype(jnp.bfloat16) * mbf[None, :]
            onehot = (zi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, K), 1)).astype(jnp.bfloat16)
            part = jax.lax.dot(ind, onehot,
                               preferred_element_type=jnp.float32)
            cur = jax.lax.dynamic_slice(acc, (v, 0), (VSPAN, K))
            return jax.lax.dynamic_update_slice(acc, cur + part, (v, 0)), None
        acc0 = jnp.zeros((V + VSPAN, K), jnp.float32)
        out, _ = jax.lax.scan(blk, acc0, (wb, z, mask_bf16, v0))
        return out
    timeit("nkw indicator matmul", loop(nkw_matmul), wb, z, mask_bf16, v0)

    # 6. ndk scatter-add
    def ndk_scatter(db, z):
        return jnp.zeros((D, K), jnp.int32).at[
            db.reshape(-1), z.reshape(-1)].add(1)
    timeit("ndk scatter-add", loop(ndk_scatter), db, z)

    # 7. flat int32 permute gather (1.35M)
    def permute(z, perm):
        return jnp.take(z.reshape(-1), perm)
    timeit("z permute gather (int32 flat)", loop(permute), z, perm)

    # 8. theta one-hot matmul from a [dspan, K] slice (2-D tiling candidate)
    DSPAN = 1024
    dlocal = jnp.asarray(np.random.default_rng(2).integers(
        0, DSPAN, (nb, B)), jnp.int32)
    def theta_matmul(log_theta, dlocal):
        th = jax.lax.dynamic_slice(log_theta, (0, 0), (DSPAN, K)
                                   ).astype(jnp.bfloat16)
        def blk(c, dl):
            ind = (dl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, DSPAN), 1)).astype(jnp.bfloat16)
            sel = jax.lax.dot(ind, th, preferred_element_type=jnp.float32)
            return c + jnp.sum(sel), None
        out, _ = jax.lax.scan(blk, 0.0, dlocal)
        return out
    timeit(f"theta one-hot matmul dspan={DSPAN}", loop(theta_matmul),
           log_theta, dlocal)


if __name__ == "__main__":
    main()


def extra():
    corpus = synth_corpus()
    blocks = corpus.w_sorted_blocks(block=B, vspan=VSPAN)
    nb = blocks.w_local.shape[0]
    print(f"blocks={nb}")
    key = jax.random.key(0, impl="rbg")
    wb = jnp.asarray(blocks.w_local)
    db = jnp.asarray(blocks.doc_ids)
    v0 = jnp.asarray(blocks.v0)
    z = jnp.asarray(np.random.default_rng(0).integers(0, K, (nb, B)),
                    jnp.int32)
    mask_bf16 = jnp.asarray(blocks.mask.astype(np.float32)).astype(
        jnp.bfloat16)
    log_phi = jax.random.uniform(key, (V, K), jnp.float32)

    def loop(body):
        def f(*args):
            def it(c, _):
                return body(*args), None
            out, _ = jax.lax.scan(it, body(*args), None, length=REPS - 1)
            return out
        return f

    # 5b. nkw via transposed indicator [B, VSPAN], dot_general contract dim0
    def nkw_t(wb, z, mask_bf16, v0):
        def blk(acc, xs):
            wi, zi, mbf, v = xs
            ind_t = (wi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, VSPAN), 1)).astype(jnp.bfloat16) * mbf[:, None]
            onehot = (zi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, K), 1)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                ind_t, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cur = jax.lax.dynamic_slice(acc, (v, 0), (VSPAN, K))
            return jax.lax.dynamic_update_slice(acc, cur + part, (v, 0)), None
        acc0 = jnp.zeros((V + VSPAN, K), jnp.float32)
        out, _ = jax.lax.scan(blk, acc0, (wb, z, mask_bf16, v0))
        return out
    timeit("nkw matmul transposed ind", loop(nkw_t), wb, z, mask_bf16, v0)

    # 5c. transposed ind, no carry (stack + one big scatter after)
    def nkw_t_stack(wb, z, mask_bf16, v0):
        def blk(_, xs):
            wi, zi, mbf, v = xs
            ind_t = (wi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, VSPAN), 1)).astype(jnp.bfloat16) * mbf[:, None]
            onehot = (zi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, K), 1)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                ind_t, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return None, part
        _, parts = jax.lax.scan(blk, None, (wb, z, mask_bf16, v0))
        rows = v0[:, None] + jnp.arange(VSPAN)[None, :]
        return jnp.zeros((V + VSPAN, K), jnp.float32).at[
            rows.reshape(-1)].add(parts.reshape(-1, K))
    timeit("nkw matmul T + row scatter", loop(nkw_t_stack),
           wb, z, mask_bf16, v0)

    # 9. phi full-table gather
    def phi_full_gather(log_phi, wb, v0):
        w_glob = wb + v0[:, None]
        def blk(c, wi):
            return c + jnp.sum(log_phi[wi]), None
        out, _ = jax.lax.scan(blk, 0.0, w_glob)
        return out
    timeit("phi full-table gather", loop(phi_full_gather), log_phi, wb, v0)

    # 10. nkw scatter-add (doc-sorted scenario)
    def nkw_scatter(wb, z, v0):
        w_glob = (wb + v0[:, None]).reshape(-1)
        return jnp.zeros((V, K), jnp.int32).at[w_glob, z.reshape(-1)].add(1)
    timeit("nkw scatter-add", loop(nkw_scatter), wb, z, v0)

    # 11. ndk matmul dspan=128 with carry (doc-sorted blocks scenario)
    DS = 128
    dlocal = jnp.asarray(np.random.default_rng(3).integers(
        0, DS, (nb, B)), jnp.int32)
    d0s = jnp.asarray(np.minimum(np.arange(nb) * (D // nb), D - DS),
                      jnp.int32)
    def ndk_mat(dlocal, z, mask_bf16, d0s):
        def blk(acc, xs):
            dl, zi, mbf, d0 = xs
            ind_t = (dl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, DS), 1)).astype(jnp.bfloat16) * mbf[:, None]
            onehot = (zi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, K), 1)).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                ind_t, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cur = jax.lax.dynamic_slice(acc, (d0, 0), (DS, K))
            return jax.lax.dynamic_update_slice(acc, cur + part,
                                                (d0, 0)), None
        acc0 = jnp.zeros((D + DS, K), jnp.float32)
        out, _ = jax.lax.scan(blk, acc0, (dlocal, z, mask_bf16, d0s))
        return out
    timeit("ndk matmul dspan=128 + carry", loop(ndk_mat),
           dlocal, z, mask_bf16, d0s)


if len(sys.argv) > 1 and sys.argv[1] == "extra":
    extra()
    sys.exit(0)
