"""Sublinear alias-MH z-draw probe — the measured evidence behind the
round-4 large-K decision (PERF.md "Sublinear large-K draw" section).

Implements the reference's alias-table performance idea the only way a
sublinear-in-K per-token draw CAN exist on TPU — LightLDA-style
Metropolis-Hastings with O(1)-gather count-based proposals
(LightPCLDAtypeTopicProposal.java:23-53 word proposal; LightPCLDA doc
proposal) against the GGS target theta[d,k]*phi[k,w] (tokens independent
given theta/phi, so the whole sweep is bulk XLA with no kernel):

  word step: k* = z_entry[uniform same-TYPE token] w.p. n_w/(n_w+K bh),
             else uniform; q(k) = (N_kw + bh)/(n_w + K bh)
  doc step:  k* = z_entry[uniform same-DOC token] w.p. L_d/(L_d+aSum),
             else uniform; q(k) = (n_dk + aSum/K)/(L_d + aSum)
  accept: min(1, p(k*) q(z) / (p(z) q(k*)))  [valid MH per token]

(phi, nkw) and (theta, ndk) are packed as [*, 2] rows so every density/
target evaluation costs ONE 8-byte row gather: 7 gathers/token/round —
near the floor for any valid MH on this target. The probe measures the
sweep at 20NG shapes over K in {1000, 4096, 8192, 16384} plus the
theta/phi Dirichlet-draw context cost, giving the crossover against the
dense MXU kernels (BENCH_MATRIX rows 5/5b/7c/7d).

Measured round 4 (v5e-1, N=1.35M): the packed 7-gather sweep runs
~66 ns/token (~15M tokens/s) FLAT in K through K=16384 (TPU scalar
gathers ~8-10 ns/row); naive 28-gather and hoisted 13-gather versions
measured 294/152 ms vs the packed 90 ms — gather count is the whole
game. Full iterations add the theta/phi Dirichlet draws — 45.9 ms at
K=8192 with the samplers' rbg keys, linear in K·(D+V) (an earlier
revision quoted 58/214 ms at K=4096/16384 and "~half the iteration":
threefry-key timings, ~2.5× the rbg chain's real cost) — so the z side
(gathers + packing + canonical-scatter count rebuilds) stays the
dominant ~78% of a full iteration (BENCH_MATRIX 7f: 165.1 of
211.0 ms). The crossover of record is
K=8192: the dense MXU kernels win on throughput AND held-out quality
wherever they compile (kpad <= 4096 — GGS 28.3M at K=1000, 8.1M at
K=4096); from K=8192 `ggs_aliasmh` is 15.5x the segmented XLA fallback
(6.41M vs 0.41M, row 7f). See PERF.md "Sublinear large-K draw" and
"Large-K quality resolution".

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         python benchmarks/alias_mh_probe.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

D, V = 11269, 20000
rng = np.random.default_rng(0)
lengths = np.maximum(5, rng.poisson(120, D)).astype(np.int64)
N = int(lengths.sum())
ranks = np.arange(1, V + 1, dtype=np.float64)
probs = 1.0 / ranks ** 1.1
probs /= probs.sum()
tokens = rng.choice(V, size=N, p=probs).astype(np.int32)
doc_offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
doc_ids = np.repeat(np.arange(D, dtype=np.int32), lengths)
order = np.argsort(tokens, kind="stable").astype(np.int32)
type_counts = np.bincount(tokens, minlength=V).astype(np.int32)
type_offsets = np.concatenate([[0], np.cumsum(type_counts)]).astype(np.int32)
print(f"N={N}")


@partial(jax.jit, static_argnames=("kk", "rounds"))
def mh_sweep(key, z, w, d, wk_pack, dk_pack, alpha_s, beta_hat,
             doc_off_tok, doc_len_tok, ty_off_tok, ty_cnt_tok, ty_perm,
             kk, rounds):
    n = z.shape[0]
    z_entry = z
    ld = doc_len_tok.astype(jnp.float32)
    cw = ty_cnt_tok.astype(jnp.float32)
    wK = w.astype(jnp.int32) * kk
    dK = d.astype(jnp.int32) * kk
    kbh = kk * beta_hat
    a_sum = alpha_s * kk
    p_tok_w = cw / (cw + kbh)
    p_tok_d = ld / (ld + a_sum)
    wk0 = wk_pack[wK + z]
    dk0 = dk_pack[dK + z]
    t_cur = dk0[:, 0] * wk0[:, 0]
    qw_cur = wk0[:, 1] + beta_hat
    qd_cur = dk0[:, 1] + alpha_s

    def one_round(carry, kr):
        zz, t_c, qw_c, qd_c = carry
        ks = jax.random.split(kr, 8)
        # word step: 4 gathers
        r = jax.random.uniform(ks[1], (n,))
        pos = ty_off_tok + jnp.minimum((r * cw).astype(jnp.int32),
                                       ty_cnt_tok - 1)
        k_tok = z_entry[ty_perm[pos]]
        k_unif = jax.random.randint(ks[2], (n,), 0, kk, jnp.int32)
        kprop = jnp.where(jax.random.uniform(ks[0], (n,)) < p_tok_w,
                          k_tok, k_unif)
        wkn = wk_pack[wK + kprop]
        dkn = dk_pack[dK + kprop]
        t_new = dkn[:, 0] * wkn[:, 0]
        q_new = wkn[:, 1] + beta_hat
        acc = (jax.random.uniform(ks[3], (n,)) *
               jnp.maximum(t_c * q_new, 1e-38)) < t_new * qw_c
        zz = jnp.where(acc, kprop, zz)
        t_c = jnp.where(acc, t_new, t_c)
        qw_c = jnp.where(acc, q_new, qw_c)
        qd_c = jnp.where(acc, dkn[:, 1] + alpha_s, qd_c)
        # doc step: 3 gathers
        r2 = jax.random.uniform(ks[5], (n,))
        pos2 = doc_off_tok + jnp.minimum((r2 * ld).astype(jnp.int32),
                                         doc_len_tok - 1)
        k_tok2 = z_entry[pos2]
        k_unif2 = jax.random.randint(ks[6], (n,), 0, kk, jnp.int32)
        kprop2 = jnp.where(jax.random.uniform(ks[4], (n,)) < p_tok_d,
                           k_tok2, k_unif2)
        wkn2 = wk_pack[wK + kprop2]
        dkn2 = dk_pack[dK + kprop2]
        t_new2 = dkn2[:, 0] * wkn2[:, 0]
        q2_new = dkn2[:, 1] + alpha_s
        acc2 = (jax.random.uniform(ks[7], (n,)) *
                jnp.maximum(t_c * q2_new, 1e-38)) < t_new2 * qd_c
        zz = jnp.where(acc2, kprop2, zz)
        t_c = jnp.where(acc2, t_new2, t_c)
        qd_c = jnp.where(acc2, q2_new, qd_c)
        qw_c = jnp.where(acc2, wkn2[:, 1] + beta_hat, qw_c)
        return (zz, t_c, qw_c, qd_c), (
            jnp.mean(acc.astype(jnp.float32)),
            jnp.mean(acc2.astype(jnp.float32)))

    (z_out, *_), accs = jax.lax.scan(
        one_round, (z, t_cur, qw_cur, qd_cur), jax.random.split(key, rounds))
    return z_out, accs


@jax.jit
def gamma_draws(key, ndk, nkw, alpha_s, beta):
    k1, k2 = jax.random.split(key)
    from ldagroupedgibbssampler_tpu.ops import random as rnd
    th = rnd.dirichlet(k1, ndk.astype(jnp.float32) + alpha_s)
    g = jnp.maximum(rnd.gamma(k2, nkw.astype(jnp.float32) + beta),
                    rnd.DIRICHLET_FLOOR)
    ph = g / jnp.sum(g, axis=1, keepdims=True)
    return th, ph


def bench(kk, rounds):
    # rbg keys — what the samplers run (LDAConfig.prng_impl default);
    # threefry keys inflate the RNG-bound gamma timings ~2.5x
    key = jax.random.key(0, impl="rbg")
    z = jnp.asarray(rng.integers(0, kk, N).astype(np.int32))
    w = jnp.asarray(tokens)
    dd = jnp.asarray(doc_ids)
    ndk_h = np.zeros((D, kk), np.float32)
    np.add.at(ndk_h, (doc_ids, np.asarray(z)), 1)
    nkw_h = np.zeros((V, kk), np.float32)
    np.add.at(nkw_h, (tokens, np.asarray(z)), 1)
    theta = rng.dirichlet(np.ones(kk) * 0.1, D).astype(np.float32)
    phi = (rng.dirichlet(np.ones(V) * 0.1, kk).T).astype(np.float32)
    wk_pack = jnp.stack([jnp.asarray(phi).reshape(-1),
                         jnp.asarray(nkw_h).reshape(-1)], axis=1)
    dk_pack = jnp.stack([jnp.asarray(theta).reshape(-1),
                         jnp.asarray(ndk_h).reshape(-1)], axis=1)
    args = (key, z, w, dd, wk_pack, dk_pack,
            jnp.float32(50.0 / kk), jnp.float32(0.01),
            jnp.asarray(doc_offsets[:-1])[dd],
            jnp.asarray(lengths.astype(np.int32))[dd],
            jnp.asarray(type_offsets[:-1])[w],
            jnp.asarray(type_counts)[w],
            jnp.asarray(order))
    args = jax.tree.map(jax.block_until_ready, args)
    zo, accs = mh_sweep(*args, kk=kk, rounds=rounds)
    zo.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            zo, accs = mh_sweep(*args, kk=kk, rounds=rounds)
        zo.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 3)
    # gamma context cost
    ndk_j, nkw_j = jnp.asarray(ndk_h), jnp.asarray(nkw_h)
    th, ph = gamma_draws(key, ndk_j, nkw_j, jnp.float32(50.0 / kk),
                         jnp.float32(0.01))
    th.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        th, ph = gamma_draws(key, ndk_j, nkw_j, jnp.float32(50.0 / kk),
                             jnp.float32(0.01))
    th.block_until_ready()
    gt = (time.perf_counter() - t0) / 3
    full = best + gt
    print(f"K={kk} rounds={rounds}: sweep {best*1e3:.1f} ms "
          f"({N/best/1e6:.1f}M tok/s), gammas {gt*1e3:.1f} ms, "
          f"full-iter-est {N/full/1e6:.1f}M tok/s  "
          f"acc_w={np.mean(np.asarray(accs[0])):.3f} "
          f"acc_d={np.mean(np.asarray(accs[1])):.3f}")


for kk in (1000, 4096, 8192, 16384):
    for rounds in (1, 2):
        bench(kk, rounds)
