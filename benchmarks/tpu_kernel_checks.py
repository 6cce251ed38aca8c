"""On-chip validation of the fused z-draw kernel (run on real TPU).

Three checks, mirroring the reference's test styles (SURVEY.md §4):
  1. exact gather correctness: one-hot theta rows force deterministic z
     (every token must land on its document's planted topic) and N_kw must
     equal a NumPy histogram of the drawn z — both in fast and precise mode;
  2. doc-mask semantics: tokens of unselected (zeroed-theta) docs keep z;
  3. chi-square of one token's empirical z distribution over 400 seeds
     against the exact conditionals theta_d * phi_w.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_kernel_checks.py
Last run (2026-08-19, v5e): onehot/keep/nkw ok for all (precise, stream)
combinations incl. K=1000; docmask kept-old ok; chi2 = 77.3 (dof 99) at
K=100 and 28.0 (dof ~22, tail-binned) for the K=1000 streamed path.
"""
import sys

import numpy as np
import jax  # noqa: F401

FAILURES: list[str] = []


def check(name, ok):
    if not bool(ok):
        FAILURES.append(name)
    return bool(ok)
import jax.numpy as jnp

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.ops.pallas_zdraw import fused_zdraw_nkw

rng = np.random.default_rng(0)
D, V, K = 700, 1300, 100
lens = rng.integers(20, 200, D)
toks = [rng.integers(0, V, n).astype(np.int32) for n in lens]
corpus = Corpus.from_token_lists([list(t) for t in toks],
                                 vocab=[f"w{i}" for i in range(V)])
blocks = corpus.cell_blocks(block=2048, vspan=512, dspan=512, chunk=128)
nb = blocks.w_local.shape[0]
chunk = blocks.chunk
chunks = blocks.w_local.shape[1] // chunk

w3 = jnp.asarray(blocks.w_local.reshape(nb, chunks, chunk))
d3 = jnp.asarray(blocks.d_local_a.reshape(nb, chunks, chunk))
z_old = jnp.asarray(
    rng.integers(0, K, (nb, chunks, chunk)).astype(np.int32))
win_w = jnp.asarray(blocks.win_w)
first_w = jnp.asarray(blocks.first_w)
win_d = jnp.asarray(blocks.win_d_chunks)
seed = jnp.asarray([12345], jnp.int32)

mask = blocks.mask.reshape(nb, chunks, chunk)
doc_ids = blocks.doc_ids.reshape(nb, chunks, chunk)
w_glob = np.minimum(blocks.w_local, 512 - 1).reshape(nb, chunks, chunk) \
    + blocks.win_w[:, None, None] * 512

# ---- test 1: deterministic one-hot theta -> z == doc topic -------------
doc_topic = (np.arange(D) % K).astype(np.int32)
theta = np.zeros((D, K), np.float32)
theta[np.arange(D), doc_topic] = 1.0
phi = np.full((V, K), 1.0 / V, np.float32)

for precise in (False, True):
    for stream in (False, True):
        z, nkw = fused_zdraw_nkw(
            w3, d3, z_old, jnp.asarray(theta), jnp.asarray(phi), seed,
            win_w, first_w, win_d,
            nwin_w=blocks.nwin_w, nwin_d=blocks.nwin_d,
            vspan=512, dspan=512, num_topics=K, precise=precise,
            stream_theta=stream)
        z = np.asarray(z)
        nkw = np.asarray(nkw)
        expect = doc_topic[doc_ids]
        ok = (z[mask] == expect[mask]).all()
        keep = (z[~mask] == np.asarray(z_old)[~mask]).all()
        # nkw reference
        ref = np.zeros((blocks.nwin_w * 512, K), np.int64)
        np.add.at(ref, (w_glob[mask], z[mask]), 1)
        cnt_ok = (ref == nkw.astype(np.int64)).all()
        check(f"onehot[p={precise},s={stream}]", ok and keep and cnt_ok)
        print(f"precise={precise} stream={stream}: onehot z ok={ok} "
              f"keep-old={keep} nkw ok={cnt_ok} total={nkw.sum()} "
              f"expect={mask.sum()}")

# ---- test 2: doc-mask keeps old z --------------------------------------
sel = rng.random(D) < 0.5
theta_u = rng.dirichlet(np.ones(K), D).astype(np.float32)
phi_u = rng.dirichlet(np.ones(V), K).astype(np.float32).T.copy()
theta_m = np.where(sel[:, None], theta_u, 0.0).astype(np.float32)
z, nkw = fused_zdraw_nkw(
    w3, d3, z_old, jnp.asarray(theta_m), jnp.asarray(phi_u), seed,
    win_w, first_w, win_d, nwin_w=blocks.nwin_w, nwin_d=blocks.nwin_d,
    vspan=512, dspan=512, num_topics=K, precise=False)
z = np.asarray(z)
kept = mask & ~sel[doc_ids]
drawn = mask & sel[doc_ids]
print("docmask: kept-old ok =",
      check("docmask", (z[kept] == np.asarray(z_old)[kept]).all()),
      " drawn fraction changed =",
      (z[drawn] != np.asarray(z_old)[drawn]).mean())

# ---- test 3: statistical match of conditionals -------------------------
# single doc-window corpus slice: compare empirical z distribution of one
# token position against exact conditionals over many seeds.
R = 400
tok_b, tok_c, tok_t = 0, 0, 5
d0 = int(doc_ids[tok_b, tok_c, tok_t])
w0 = int(w_glob[tok_b, tok_c, tok_t])
p = theta_u[d0] * phi_u[w0]
p = p / p.sum()


# R kernel invocations batched into ONE dispatch (lax.scan over seeds):
# per-dispatch tunnel latency otherwise dominates (~1.5 s x R).
@jax.jit
def _chi_draws_k100(seeds, theta_in, phi_in):
    def body(_, sd):
        zz, _ = fused_zdraw_nkw(
            w3, d3, z_old, theta_in, phi_in, sd[None],
            win_w, first_w, win_d, nwin_w=blocks.nwin_w,
            nwin_d=blocks.nwin_d, vspan=512, dspan=512, num_topics=K,
            precise=False)
        return 0, zz[tok_b, tok_c, tok_t]
    return jax.lax.scan(body, 0, seeds)[1]


seeds = jnp.asarray(np.arange(R) * 7919 + 13, jnp.int32)
zs = np.asarray(_chi_draws_k100(seeds, jnp.asarray(theta_u),
                                jnp.asarray(phi_u)))
counts = np.bincount(zs, minlength=K).astype(np.int64)
exp = p * R
chi2 = ((counts - exp) ** 2 / np.maximum(exp, 1e-9)).sum()
# 5-sigma band for chi-square(dof): dof + 5*sqrt(2*dof)
check("chi2_k100", chi2 < (K - 1) + 5 * np.sqrt(2.0 * (K - 1)))
print(f"chi2={chi2:.1f} (dof~{K-1}, mean expected {K-1})")

# ---- test 4: large-K streamed path — exactness + chi-square at K=1000 --
K2 = 1000
rng2 = np.random.default_rng(3)
doc_topic2 = (np.arange(D) % K2).astype(np.int32)
theta2 = np.zeros((D, K2), np.float32)
theta2[np.arange(D), doc_topic2 % K2] = 1.0
phi2 = np.full((V, K2), 1.0 / V, np.float32)
z_old2 = jnp.asarray(rng2.integers(0, K2, (nb, chunks, chunk)).astype(np.int32))
for stream in (False, True):
    z, nkw2 = fused_zdraw_nkw(
        w3, d3, z_old2, jnp.asarray(theta2), jnp.asarray(phi2), seed,
        win_w, first_w, win_d, nwin_w=blocks.nwin_w, nwin_d=blocks.nwin_d,
        vspan=512, dspan=512, num_topics=K2, precise=False,
        stream_theta=stream)
    z = np.asarray(z)
    ok = (z[mask] == doc_topic2[doc_ids][mask]).all()
    keep = (z[~mask] == np.asarray(z_old2)[~mask]).all()
    total_ok = int(np.asarray(nkw2).sum()) == int(mask.sum())
    check(f"onehot_k1000[s={stream}]", ok and keep and total_ok)
    print(f"K=1000 stream={stream}: onehot z ok={ok} keep-old={keep} "
          f"nkw total ok={total_ok}")

theta_u2 = rng2.dirichlet(np.full(K2, 0.05), D).astype(np.float32)
phi_u2 = rng2.dirichlet(np.full(V, 0.1), K2).astype(np.float32).T.copy()
p2 = theta_u2[d0] * phi_u2[w0]
p2 = p2 / p2.sum()
R2 = 600


@jax.jit
def _chi_draws_k1000(seeds, theta_in, phi_in):
    def body(_, sd):
        zz, _ = fused_zdraw_nkw(
            w3, d3, z_old2, theta_in, phi_in, sd[None],
            win_w, first_w, win_d, nwin_w=blocks.nwin_w,
            nwin_d=blocks.nwin_d, vspan=512, dspan=512, num_topics=K2,
            precise=False, stream_theta=True)
        return 0, zz[tok_b, tok_c, tok_t]
    return jax.lax.scan(body, 0, seeds)[1]


seeds2 = jnp.asarray(np.arange(R2) * 104729 + 7, jnp.int32)
zs2 = np.asarray(_chi_draws_k1000(seeds2, jnp.asarray(theta_u2),
                                  jnp.asarray(phi_u2)))
counts2 = np.bincount(zs2, minlength=K2).astype(np.int64)
# bin tail topics so expected counts stay >= ~2 for the chi-square
order2 = np.argsort(-p2)
exp2 = p2[order2] * R2
obs2 = counts2[order2].astype(np.float64)
nbig = int(np.searchsorted(-exp2, -2.0))
obs_b = np.concatenate([obs2[:nbig], [obs2[nbig:].sum()]])
exp_b = np.concatenate([exp2[:nbig], [exp2[nbig:].sum()]])
chi2b = ((obs_b - exp_b) ** 2 / np.maximum(exp_b, 1e-9)).sum()
dof_b = len(exp_b) - 1
check("chi2_k1000", chi2b < dof_b + 5 * np.sqrt(2.0 * dof_b))
print(f"K=1000 streamed chi2={chi2b:.1f} (dof~{len(exp_b)-1})")

if FAILURES:
    print("FAILED checks:", FAILURES)
    sys.exit(1)
print("ALL CHECKS PASSED")
