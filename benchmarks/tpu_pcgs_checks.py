"""On-chip validation of the fused PCGS sweep kernel (run on real TPU).

Complements tests/test_pallas_pcgs.py (which runs the same kernel under the
pltpu interpreter with injected uniforms): here the REAL in-kernel PRNG and
Mosaic lowering are exercised. Checks (SURVEY.md §4 styles 1+3):
  1. count semantics under the in-kernel PRNG: returned N_kw and the n_dk
     table must equal histograms of the returned z; unselected docs and
     pads keep z; PRNG must be non-degenerate (draws spread over topics);
  2. deterministic one-hot phi: every token must land on its word's
     planted topic regardless of the uniforms;
  3. chi-square of single-token-doc draws against the exact conditional
     (n_dk + alpha_k) * phi[k][w] (UncollapsedParallelLDA.java:1509-1513);
  4. end-to-end: the pcgs scheme on a synthetic corpus uses the fused path
     (gate on), conserves counts each iteration, and its model LL matches
     the XLA doc-sequential path's trajectory within MC noise.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_pcgs_checks.py
"""
import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: repeat runs skip the 20-40s Mosaic compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.models.registry import create_model
from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
    FLAG_ROWS, fused_pcgs_sweep)

assert jax.default_backend() == "tpu", jax.devices()
rng = np.random.default_rng(0)


def run_sweep(c, K, z_flat, doc_mask, phi, alpha, seed, nk_plus=None,
              beta=None):
    b = c.cell_blocks_seq(block=2048, vspan=128, dspan=128, chunk=128)
    nb = b.w_local.shape[0]
    chunks = b.w_local.shape[1] // b.chunk
    sh3 = (nb, chunks, b.chunk)
    fi3 = b.flat_index.reshape(sh3)
    z_old = np.zeros(sh3, np.int32)
    z_old[fi3 >= 0] = z_flat[fi3[fi3 >= 0]]
    ndk = np.zeros((c.num_docs, K), np.int64)
    np.add.at(ndk, (c.token_doc_ids(), z_flat), 1)
    kpad = max(128, -(-K // 128) * 128)
    table = np.zeros((kpad + FLAG_ROWS, b.nwin_d * 128), np.float32)
    table[:K, :c.num_docs] = (ndk + alpha).T
    table[kpad, :c.num_docs] = doc_mask
    z, nkw, table_out = fused_pcgs_sweep(
        jnp.asarray(b.w_local.reshape(sh3)),
        jnp.asarray(b.d_local_a.reshape(sh3)),
        jnp.asarray(z_old), jnp.asarray(table), jnp.asarray(phi),
        jnp.asarray([seed], jnp.int32), jnp.asarray(b.win_w),
        jnp.asarray(b.first_w), jnp.asarray(b.win_d_chunks),
        nk_plus=(None if nk_plus is None
                 else jnp.asarray(nk_plus, jnp.float32)), beta=beta,
        nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=128, dspan=128,
        num_topics=K)
    z_out = np.zeros(c.num_tokens, np.int32)
    z_out[fi3[fi3 >= 0]] = np.asarray(z)[fi3 >= 0]
    return z_out, np.asarray(nkw), np.asarray(table_out)


# ---- 1. count semantics + PRNG non-degeneracy ---------------------------
D, V, K = 400, 900, 25
docs = [list(rng.integers(0, V, rng.integers(5, 150))) for _ in range(D)]
c = Corpus.from_token_lists(docs, [f"w{i}" for i in range(V)])
alpha = np.full(K, 0.4, np.float32)
z_flat = rng.integers(0, K, c.num_tokens).astype(np.int32)
doc_mask = np.ones(D, np.float32)
doc_mask[::4] = 0.0
phi = rng.dirichlet(np.full(V, 0.05), K).T.astype(np.float32)
z_out, nkw, tout = run_sweep(c, K, z_flat, doc_mask, phi, alpha, seed=77)
dall = c.token_doc_ids()
unsel = doc_mask[dall] == 0
assert (z_out[unsel] == z_flat[unsel]).all()
ref_nkw = np.zeros((V, K), np.int64)
np.add.at(ref_nkw, (c.tokens, z_out), 1)
assert np.array_equal(nkw[:V].astype(np.int64), ref_nkw)
ref_ndk = np.zeros((D, K), np.int64)
np.add.at(ref_ndk, (dall, z_out), 1)
assert np.allclose(tout[:K, :D].T - alpha[None, :], ref_ndk, atol=1e-3)
hist = np.bincount(z_out[~unsel], minlength=K)
assert (hist > 0).sum() == K and hist.max() < 0.5 * hist.sum(), hist
# different seed -> different draws (PRNG is live)
z_out2, _, _ = run_sweep(c, K, z_flat, doc_mask, phi, alpha, seed=78)
assert (z_out2 != z_out).mean() > 0.3
# same seed -> identical (determinism)
z_out3, _, _ = run_sweep(c, K, z_flat, doc_mask, phi, alpha, seed=77)
assert np.array_equal(z_out3, z_out)
print("1. count semantics + PRNG non-degeneracy + determinism: ok")

# ---- 2. one-hot phi forces planted topics --------------------------------
word_topic = (np.arange(V) % K).astype(np.int32)
phi_oh = np.zeros((V, K), np.float32)
phi_oh[np.arange(V), word_topic] = 1.0
z_p, nkw_p, _ = run_sweep(c, K, z_flat, np.ones(D, np.float32), phi_oh,
                          alpha, seed=5)
assert np.array_equal(z_p, word_topic[c.tokens])
print("2. one-hot phi planted-topic check: ok")

# ---- 3. chi-square vs the exact conditional ------------------------------
from scipy import stats as sps
Dd, Kd = 8000, 5
cd = Corpus.from_token_lists([[0]] * Dd, ["w0", "w1"])
alphad = np.array([0.5, 1.0, 2.0, 0.25, 1.25], np.float32)
phid = np.array([[0.9, 0.5, 0.1, 0.4, 0.2],
                 [0.1, 0.5, 0.9, 0.6, 0.8]], np.float32)
p = alphad * phid[0]
p = p / p.sum()
zd, _, _ = run_sweep(cd, Kd, np.zeros(Dd, np.int32),
                     np.ones(Dd, np.float32), phid, alphad, seed=11)
obs = np.bincount(zd, minlength=Kd).astype(np.float64)
chi2 = float(((obs - p * Dd) ** 2 / (p * Dd)).sum())
pval = sps.chi2.sf(chi2, Kd - 1)
assert pval > 1e-4, (obs, p * Dd, pval)
print(f"3. chi-square vs exact conditional: ok (chi2={chi2:.1f}, p={pval:.3f})")


# ---- 3b. collapsed (ADLDA) LIVE-count mode: resident kernel -------------
# chi-square against the exact collapsed conditional with LARGE sweep-entry
# counts (live drift <= 0.1%), plus entry+delta bookkeeping
Dc, Kc, Vc = 4000, 5, 2
cc = Corpus.from_token_lists([[0]] * Dc, ["w0", "w1"])
alphac = np.array([0.5, 1.0, 2.0, 0.25, 1.25], np.float32)
betac = 0.3
entry = np.zeros((Vc, Kc), np.float64)
entry[0, :] = np.array([4.0e6, 4.4e6, 3.6e6, 4.8e6, 3.2e6])
nk_entry = entry.sum(0)
ownc = np.zeros(Kc)
ownc[0] = 1.0
pc = alphac * (betac + entry[0] - ownc) / (betac * Vc + nk_entry - ownc)
pc = pc / pc.sum()
zc, nkwc, _ = run_sweep(cc, Kc, np.zeros(Dc, np.int32),
                        np.ones(Dc, np.float32),
                        entry.astype(np.float32), alphac, seed=41,
                        nk_plus=(betac * Vc + nk_entry).astype(np.float32),
                        beta=betac)
obsc = np.bincount(zc, minlength=Kc).astype(np.float64)
chi2c = float(((obsc - pc * Dc) ** 2 / (pc * Dc)).sum())
pvalc = sps.chi2.sf(chi2c, Kc - 1)
assert pvalc > 1e-4, (obsc, pc * Dc, pvalc)
d_new = np.zeros((Vc, Kc), np.int64)
np.add.at(d_new, (cc.tokens, zc), 1)
d_old = np.zeros((Vc, Kc), np.int64)
np.add.at(d_old, (cc.tokens, np.zeros(Dc, np.int32)), 1)
assert np.array_equal(nkwc[:Vc].astype(np.int64),
                      entry.astype(np.int64) + d_new - d_old)
print(f"3b. collapsed live resident: chi2={chi2c:.1f} (p={pvalc:.3f}), "
      "entry+delta bookkeeping ok")

# ---- 4. end-to-end pcgs scheme: fused gate + LL trajectory vs XLA --------
from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
    model_log_likelihood)
docs_e = [list(rng.integers(0, 2000, rng.integers(20, 200)))
          for _ in range(800)]
ce = Corpus.from_token_lists(docs_e, [f"w{i}" for i in range(2000)])
for scheme in ("pcgs", "adlda", "lightpclda"):
    # ADLDA's fused path keeps counts LIVE (chunk-fresh, ~serial-CGS
    # mixing) while the XLA fallback is sweep-stale: the live chain
    # converges FASTER, so short-trajectory LLs diverge by design. Run
    # that pair to near-convergence and compare equilibria, also
    # asserting the live chain is never materially worse.
    blocks, per, tol = (15, 10, 0.015) if scheme == "adlda" else (6, 5, 0.01)
    lls = {}
    for kern in ("fused", "xla"):
        cfg = LDAConfig(scheme=scheme, topics=20, alpha=0.5, beta=0.01,
                        seed=2019, exec_time=-1, zdraw_kernel=kern)
        m = create_model(cfg)
        m.add_instances(ce)
        assert m._use_fused_sweep() == (kern == "fused")
        traj = []
        for _ in range(blocks):
            m.sample(per)
            assert int(np.asarray(m.state.nkw).sum()) == ce.num_tokens
            assert int(np.asarray(m.state.ndk).sum()) == ce.num_tokens
            traj.append(float(model_log_likelihood(
                m.state.ndk, m._nkw_kv(), m.get_alpha(), m.get_beta())))
        lls[kern] = traj
        print(f"4. {scheme}/{kern}: LL {[round(x, 0) for x in traj]}")
    if scheme == "adlda":
        # The two ADLDA kernels are DIFFERENT members of the AD-LDA
        # approximation family and equilibrate at different LLs: the
        # sweep-stale XLA fallback is the P -> infinity limit (every
        # token against one-sweep-old counts; plateaus measurably below
        # the collapsed posterior's typical set), while the live fused
        # chain is micro-batched serial CGS (<= 128-token staleness).
        # So: (a) live must never be WORSE than stale, and (b) live must
        # match the exact serial CGS oracle (run on the host CPU — the
        # serial scan is pathological on TPU) at its plateau.
        assert lls["fused"][-1] >= lls["xla"][-1] - tol * abs(lls["xla"][-1])
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            mc = create_model(LDAConfig(scheme="collapsed", topics=20,
                                        alpha=0.5, beta=0.01, seed=2019,
                                        exec_time=-1))
            mc.add_instances(ce)
            mc.sample(blocks * per)
            ll_cgs = float(model_log_likelihood(
                mc.state.ndk, mc._nkw_kv(), mc.get_alpha(), mc.get_beta()))
        gap = abs(lls["fused"][-1] - ll_cgs) / abs(ll_cgs)
        assert gap < tol, (lls["fused"], ll_cgs, gap)
        print(f"4. adlda live-fused vs serial-CGS oracle plateau "
              f"({blocks * per} iters): CGS {ll_cgs:.0f}, "
              f"live {lls['fused'][-1]:.0f}, gap {gap:.4%} — ok "
              f"(sweep-stale XLA plateaus at {lls['xla'][-1]:.0f})")
    else:
        gap = abs(lls["fused"][-1] - lls["xla"][-1]) / abs(lls["xla"][-1])
        assert gap < tol, (scheme, lls, gap)
        print(f"4. {scheme} fused vs XLA final-LL gap ({blocks * per} "
              f"iters): {gap:.4%} — ok")

# ---- 4b. HBM-streamed variant: count semantics + chi-square + perf ------
from ldagroupedgibbssampler_tpu.corpus.ragged import build_stream_blocks_seq
from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
    fused_pcgs_sweep_streamed)


def run_stream(c_, K_, z_flat_, doc_mask_, phi_, alpha_, seed_,
               nk_plus=None, beta=None):
    b = build_stream_blocks_seq(c_.tokens, c_.token_doc_ids(),
                                c_.num_types, c_.num_docs, block=2048,
                                vspan=128, dspan=128, chunk=128)
    nb = b.w_local.shape[0]
    chunks = b.w_local.shape[1] // b.chunk
    sh3 = (nb, chunks, b.chunk)
    fi3 = b.flat_index.reshape(sh3)
    z_old = np.zeros(sh3, np.int32)
    z_old[fi3 >= 0] = z_flat_[fi3[fi3 >= 0]]
    ndk = np.zeros((c_.num_docs, K_), np.int64)
    np.add.at(ndk, (c_.token_doc_ids(), z_flat_), 1)
    kpad = max(128, -(-K_ // 128) * 128)
    table = np.zeros((kpad + FLAG_ROWS, b.nwin_d * 128), np.float32)
    table[:K_, :c_.num_docs] = (ndk + alpha_).T
    table[kpad, :c_.num_docs] = doc_mask_
    import time
    args = (jnp.asarray(b.w_local.reshape(sh3)),
            jnp.asarray(b.d_local.reshape(sh3)),
            jnp.asarray(z_old), jnp.asarray(table), jnp.asarray(phi_),
            jnp.asarray([seed_], jnp.int32), jnp.asarray(b.win_w_chunks),
            jnp.asarray(b.win_d_chunks))
    kw = dict(nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=128, dspan=128,
              num_topics=K_,
              nk_plus=(None if nk_plus is None
                       else jnp.asarray(nk_plus, jnp.float32)), beta=beta)
    z, nkw_, t_ = fused_pcgs_sweep_streamed(*args, **kw)
    np.asarray(z)
    # nkw_ comes back [nwin_w*vspan, K] — already word-major [V', K]
    word_next = args[4] if nk_plus is None else nkw_.astype(jnp.float32)
    if nk_plus is not None:
        kw = dict(kw, nk_plus=beta * c_.num_types
                  + jnp.sum(nkw_, axis=0).astype(jnp.float32))
    t0 = time.perf_counter()
    for s in range(5):
        z, nkw_, t_ = fused_pcgs_sweep_streamed(
            args[0], args[1], z, t_, word_next,
            jnp.asarray([seed_ + 1 + s], jnp.int32), args[6], args[7],
            **kw)
        if nk_plus is not None:
            word_next = nkw_.astype(jnp.float32)
            kw = dict(kw, nk_plus=beta * c_.num_types
                      + jnp.sum(nkw_, axis=0).astype(jnp.float32))
    np.asarray(z)
    dt = (time.perf_counter() - t0) / 5
    z_out = np.zeros(c_.num_tokens, np.int32)
    z_out[fi3[fi3 >= 0]] = np.asarray(z)[fi3 >= 0]
    return z_out, np.asarray(nkw_), np.asarray(t_), dt


for Ks in (25, 1000):
    zs, nkws, ts, dt = run_stream(c, Ks, rng.integers(
        0, Ks, c.num_tokens).astype(np.int32), doc_mask,
        rng.dirichlet(np.full(V, 0.05), Ks).T.astype(np.float32),
        np.full(Ks, 0.4, np.float32), 99)
    refs = np.zeros((V, Ks), np.int64)
    np.add.at(refs, (c.tokens, zs), 1)
    assert np.array_equal(nkws[:V].astype(np.int64), refs)
    refd = np.zeros((D, Ks), np.int64)
    np.add.at(refd, (dall, zs), 1)
    assert np.allclose(ts[:Ks, :D].T - 0.4, refd, atol=1e-3)
    print(f"4b. streamed K={Ks}: counts ok after 6 sweeps; "
          f"{c.num_tokens / dt / 1e6:.1f}M tokens/s (tiny corpus)")
zd2, _, _, _ = run_stream(cd, Kd, np.zeros(Dd, np.int32),
                          np.ones(Dd, np.float32), phid, alphad, 31)
obs2 = np.bincount(zd2, minlength=Kd).astype(np.float64)
chi2b = float(((obs2 - p * Dd) ** 2 / (p * Dd)).sum())
assert sps.chi2.sf(chi2b, Kd - 1) > 1e-4, (obs2, p * Dd)
print(f"4b. streamed chi-square vs exact conditional: ok "
      f"(chi2={chi2b:.1f})")

# ---- 4b2. X,Y,X window-reuse hazard schedule (ADVICE round-1 item 2) ----
# The streamed kernel's NBUF=3 w-window slots admit a cross-slot store
# hazard when a w-window is revisited at reuse distance 2 — i.e. the
# schedule ...(wX),(wY),(wX)... — which only occurs when a d-window
# boundary wraps the w-window sequence with exactly 2 populated w-windows.
# Interpret-mode tests run DMAs synchronously and cannot exercise the
# async ordering; this on-chip case does. Build a corpus with exactly
# 2 w-windows x 2 d-windows, fully populated, so EVERY w-window reuse is
# at distance 2, and run several sweeps.
Dx, Vx, Kx = 200, 200, 25   # vspan=dspan=128 -> 2x2 windows
rngx = np.random.default_rng(17)
docs_x = [list(rngx.integers(0, Vx, 40)) for _ in range(Dx)]
cx = Corpus.from_token_lists(docs_x, [f"w{i}" for i in range(Vx)])
dall_x = cx.token_doc_ids()
zx, nkwx, tsx, _dtx = run_stream(
    cx, Kx, rngx.integers(0, Kx, cx.num_tokens).astype(np.int32),
    np.ones(Dx, np.float32),
    rngx.dirichlet(np.full(Vx, 0.05), Kx).T.astype(np.float32),
    np.full(Kx, 0.4, np.float32), 523)
refx = np.zeros((Vx, Kx), np.int64)
np.add.at(refx, (cx.tokens, zx), 1)
assert np.array_equal(nkwx[:Vx].astype(np.int64), refx), \
    "X,Y,X reuse schedule corrupted N_kw (store hazard)"
refdx = np.zeros((Dx, Kx), np.int64)
np.add.at(refdx, (dall_x, zx), 1)
assert np.allclose(tsx[:Kx, :Dx].T - 0.4, refdx, atol=1e-3), \
    "X,Y,X reuse schedule corrupted n_dk table (store hazard)"
print("4b2. X,Y,X window-reuse hazard schedule: counts ok after 6 sweeps")

# ---- 4b3. collapsed LIVE streamed under the same X,Y,X reuse schedule ----
# the N_kw rmw window doubles as the live word table here, so the
# store-before-reload hazard now guards the table the draws READ
z0x = rngx.integers(0, Kx, cx.num_tokens).astype(np.int32)
entry_x = np.zeros((Vx, Kx), np.int64)
np.add.at(entry_x, (cx.tokens, z0x), 1)
offs_x = rngx.integers(0, 3, (Vx, Kx)).astype(np.int64)
entry_x += offs_x
beta_x = 0.05
zxl, nkwxl, tsxl, _ = run_stream(
    cx, Kx, z0x, np.ones(Dx, np.float32),
    entry_x.astype(np.float32), np.full(Kx, 0.4, np.float32), 733,
    nk_plus=(beta_x * Vx + entry_x.sum(0)).astype(np.float32), beta=beta_x)
d_new_x = np.zeros((Vx, Kx), np.int64)
np.add.at(d_new_x, (cx.tokens, zxl), 1)
d_old_x = np.zeros((Vx, Kx), np.int64)
np.add.at(d_old_x, (cx.tokens, z0x), 1)
assert np.array_equal(nkwxl[:Vx].astype(np.int64),
                      entry_x + d_new_x - d_old_x), \
    "collapsed live X,Y,X schedule corrupted the rmw word table"
refdxl = np.zeros((Dx, Kx), np.int64)
np.add.at(refdxl, (dall_x, zxl), 1)
assert np.allclose(tsxl[:Kx, :Dx].T - 0.4, refdxl, atol=1e-3)
print("4b3. collapsed live streamed X,Y,X reuse: entry+delta ok "
      "after 6 sweeps")

# ---- 4b4. K-TILED streamed chunk body on-chip (kpad >= KTILE_MIN) --------
# kpad=2048 engages the tiled body (probs staged through the bf16
# scratch, per-tile selects/updates, nbuf=2 window slots): validate count
# semantics under the REAL in-kernel PRNG for both the PCGS (phi) and the
# collapsed LIVE modes — the rows 7d/8d kernels in miniature.
Kt = 2048
zt0 = rng.integers(0, Kt, c.num_tokens).astype(np.int32)
phit = rng.dirichlet(np.full(V, 0.05), Kt).T.astype(np.float32)
zt, nkwt, tst, dtt = run_stream(c, Kt, zt0, doc_mask, phit,
                                np.full(Kt, 0.05, np.float32), 911)
unsel_t = doc_mask[dall] == 0
assert (zt[unsel_t] == zt0[unsel_t]).all()
assert (zt[~unsel_t] != zt0[~unsel_t]).any()
reft = np.zeros((V, Kt), np.int64)
np.add.at(reft, (c.tokens, zt), 1)
assert np.array_equal(nkwt[:V].astype(np.int64), reft), \
    "K-tiled streamed body corrupted N_kw"
refdt = np.zeros((D, Kt), np.int64)
np.add.at(refdt, (dall, zt), 1)
assert np.allclose(tst[:Kt, :D].T - 0.05, refdt, atol=1e-3), \
    "K-tiled streamed body corrupted the n_dk table"
assert len(np.unique(zt[~unsel_t])) > Kt // 8  # PRNG non-degenerate
print(f"4b4. K-tiled streamed (K={Kt}): counts ok after 6 sweeps; "
      f"{c.num_tokens / dtt / 1e6:.1f}M tokens/s (tiny corpus)")
entry_t = np.zeros((V, Kt), np.int64)
np.add.at(entry_t, (c.tokens, zt0), 1)
beta_t = 0.05
ztl, nkwtl, tstl, _ = run_stream(
    c, Kt, zt0, np.ones(D, np.float32), entry_t.astype(np.float32),
    np.full(Kt, 0.05, np.float32), 913,
    nk_plus=(beta_t * V + entry_t.sum(0)).astype(np.float32), beta=beta_t)
d_new_t = np.zeros((V, Kt), np.int64)
np.add.at(d_new_t, (c.tokens, ztl), 1)
assert np.array_equal(nkwtl[:V].astype(np.int64), d_new_t), \
    "K-tiled collapsed live body: N_kw != exact recount of returned z"
refdtl = np.zeros((D, Kt), np.int64)
np.add.at(refdtl, (dall, ztl), 1)
assert np.allclose(tstl[:Kt, :D].T - 0.05, refdtl, atol=1e-3)
print(f"4b4. K-tiled collapsed live streamed (K={Kt}): counts ok "
      "after 6 sweeps")
# chi-square of the tiled inverse-CDF (running tril offsets + VPU grand
# total) against the exact conditional under the REAL PRNG: single-token
# docs, expected p = alpha * phi[w0], K=2048 cells pooled into 16
# equal-index buckets spanning all 16 topic tiles
Dq = 6000
cq = Corpus.from_token_lists([[0]] * Dq, ["w0", "w1"])
alphaq = (rng.gamma(1.0, 1.0, Kt) + 0.05).astype(np.float32)
phiq = np.stack([np.full(Kt, 0.7, np.float32),
                 np.full(Kt, 0.3, np.float32)])
pq = alphaq * phiq[0]
pq = pq / pq.sum()
zq, _, _, _ = run_stream(cq, Kt, np.zeros(Dq, np.int32),
                         np.ones(Dq, np.float32), phiq, alphaq, 47)
edges_q = np.linspace(0, Kt, 17).astype(int)
obs_q = np.add.reduceat(np.bincount(zq, minlength=Kt), edges_q[:-1])
exp_q = np.add.reduceat(pq * Dq, edges_q[:-1])
chi2_q = float(((obs_q - exp_q) ** 2 / exp_q).sum())
pval_q = float(sps.chi2.sf(chi2_q, len(exp_q) - 1))
assert pval_q > 1e-4, (obs_q, exp_q)
print(f"4b4. K-tiled chi-square vs exact conditional: ok "
      f"(chi2={chi2_q:.1f}, p={pval_q:.3f})")

# ---- 4c. streamed MH (lightpclda above the VMEM budget) ------------------
from ldagroupedgibbssampler_tpu.models import fused_sweep as _fs

_saved_budget = _fs._FUSED_PCGS_VMEM_BUDGET
_fs._FUSED_PCGS_VMEM_BUDGET = 1
try:
    cfgm = LDAConfig(scheme="lightpclda", topics=20, alpha=0.5, beta=0.01,
                     seed=2019, exec_time=-1)
    mm = create_model(cfgm)
    mm.add_instances(ce)
    assert mm._fused_mode() == "streamed"
    mm.sample(10)
    assert int(np.asarray(mm.state.nkw).sum()) == ce.num_tokens
    z_mh = mm.get_z_indicators()
    refm = np.zeros((2000, 20), np.int64)
    np.add.at(refm, (ce.tokens, z_mh), 1)
    assert np.array_equal(
        np.asarray(mm._nkw_kv()).T.astype(np.int64), refm)
    print("4c. streamed MH (lightpclda): counts ok after 10 iters")
finally:
    _fs._FUSED_PCGS_VMEM_BUDGET = _saved_budget

# ---- 5. HDP rides the fused sweep: fused vs XLA agreement ----------------
act = {}
for kern in ("fused", "xla"):
    cfg = LDAConfig(scheme="ppu_hdplda", topics=60, alpha=1.0, beta=0.01,
                    seed=2019, exec_time=-1, hdp_start_topics=10,
                    zdraw_kernel=kern)
    m = create_model(cfg)
    m.add_instances(ce)
    assert m._use_fused_sweep() == (kern == "fused")
    m.sample(20)
    assert int(np.asarray(m.state.nkw).sum()) == ce.num_tokens
    act[kern] = m.get_active_topic_history()[-1]
    print(f"5. hdp {kern}: active topics after 20 iters = {act[kern]}")
assert abs(act["fused"] - act["xla"]) <= max(5, 0.3 * act["xla"]), act
print("5. HDP fused vs XLA active-topic agreement — ok")
print("ALL PCGS ON-CHIP CHECKS PASSED")
