"""GGS — the Grouped Gibbs Sampler (the repo's namesake scheme `ggs`).

Reference: topics/LDAGroupedGibbsSampler.java (210 LoC) on top of
UncollapsedParallelLDA. Per iteration:

  1. theta_d ~ Dir(n_d + alpha) for every document (:66-72, stored in
     thetaMatrix[D][K] :33-37; UncollapsedParallelLDA.sample's "do not
     resample theta when ggs" branch :710-721 reuses these draws for
     diagnostics).
  2. each token scores theta_d[k] * phi[k][w] (:96-101) and draws z by
     inverse-CDF (:107-113).
  3. phi_k ~ Dir(beta + n_k) per topic row (:182-209).

TPU-first design (profiled phase-by-phase on a v5e chip — benchmarks/
micro.py, benchmarks/zdraw_parts.py): given (theta, phi) every token draw
is independent, so

  - on TPU the z draw AND the N_kw rebuild run as ONE fused Pallas kernel
    (ops/pallas_zdraw.py): tokens live in (w-window, d-window) cell blocks
    (Corpus.cell_blocks), so the per-token theta/phi row gathers — the
    dominant cost of the XLA formulation, 7.2 of 9.4 ms at 20NG scale,
    because TPU row gathers pay tile-granular HBM traffic — become one-hot
    matmuls on the MXU against VMEM-resident window tables, the
    inverse-CDF cumsum is a triangular matmul, one on-chip uniform draws
    each token, and the same one-hot operands accumulate N_kw windows.
    Small windows win: 128-wide vocab/doc spans measured 256M tokens/s vs
    184M at 512 despite 2.2x chunk-padding (the one-hot builds are
    VPU-bound in the span).
  - off TPU (and above the kernel's VMEM gate) the fallback is a FLAT
    fused XLA program over all tokens: two row gathers + the same
    triangular-matmul inverse-CDF; the random-scan document mask rides as
    an extra column of the gathered theta rows (rows pad to 128 lanes
    anyway), and N_kw is rebuilt by the Pallas windowed count kernel
    (ops/pallas_counts.py) or a scatter-add on CPU.
  - n_dk: one cheap chunk-granular row gather regroups z d-window-major
    (layout B of the same padded cells), after which the windowed count
    kernel produces n_dk — replacing a 13 ms [D, K] scatter. State is
    kept type-major (`nkw_layout = "vk"`), matching the kernels' output
    and the per-token access pattern.

theta and phi are whole-matrix vectorised Gamma draws. The GGS hot path
contains no scatter and, on TPU, no gather at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.models.base import LDAState, TpuLDASampler
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.ops.pallas_counts import blocked_label_counts
from ldagroupedgibbssampler_tpu.ops.pallas_zdraw import (
    fused_zdraw_nkw, fused_zdraw_vmem_bytes)

# VMEM budget for the fused z-draw's resident theta table (+ phi window);
# above this the kernel streams theta d-windows from HBM per chunk
# (double-buffered DMA) instead of keeping the whole table VMEM-resident.
_FUSED_ZDRAW_VMEM_BUDGET = 10 * 2 ** 20

# Byte budget for the XLA-fallback z-draw's [L, K] gather/score/cdf temps;
# the token axis is segmented (lax.map) to stay under it. Segmentation is
# draw-invariant: the uniforms are drawn over the global token axis first.
_XLA_ZDRAW_TEMP_BYTES = 3 << 29

_EPS = 1e-30


class LDAGroupedGibbsSampler(TpuLDASampler):
    layout = "w_sorted"
    smooth_phi = True
    nkw_layout = "vk"

    # ------------------------------------------------------------------
    def _prepare_device_data(self, corpus):
        cfg = self.config
        vspan = cfg.vocab_span
        blocks = corpus.cell_blocks(block=cfg.token_block, vspan=vspan,
                                    dspan=cfg.doc_span)
        self._blocks = blocks
        self.wb = jnp.asarray(blocks.w_local)      # sentinel vspan on pads
        self.num_blocks = blocks.w_local.shape[0]
        self.mf = jnp.asarray(blocks.mask.reshape(-1))
        # flat per-token (type, doc) arrays exist only for the XLA-fallback
        # z-draw and the CPU n_dk scatter — 8 bytes/slot that the fused TPU
        # path never reads (~7 GB at PubMed scale)
        if self._needs_xla_zdraw_arrays():
            w_glob = (np.minimum(blocks.w_local, vspan - 1)
                      + blocks.win_w[:, None] * vspan).reshape(-1)
            self.wg = jnp.asarray(w_glob.astype(np.int32))
        if self._needs_xla_zdraw_arrays() or jax.default_backend() != "tpu":
            # df also feeds the CPU-backend n_dk scatter (_count_ndk)
            self.df = jnp.asarray(blocks.doc_ids.reshape(-1))
        self.winb = jnp.asarray(blocks.win_w)
        self.firstb = jnp.asarray(blocks.first_w)
        # layout B (d-window-major) for the n_dk count kernel
        self.srcb = jnp.asarray(blocks.src_chunks)
        self.dlb = jnp.asarray(blocks.d_local)     # sentinel dspan on pads
        self.windb = jnp.asarray(blocks.win_d)
        self.firstdb = jnp.asarray(blocks.first_d)
        # layout A doc-side metadata for the fused z-draw kernel
        self.dla = jnp.asarray(blocks.d_local_a)
        self.windc = jnp.asarray(blocks.win_d_chunks)

    # Largest kpad the fused z-draw kernel COMPILES at: the chunk body's
    # per-chunk temps grow ~kpad*128*4 x a few on the Mosaic scoped-VMEM
    # stack, and at kpad=8192 the compile crashes (round-4 K=8192 probe;
    # same failure class the PCGS kernels hit at 4096 and fixed with the
    # K-tiled body — this kernel has no tiled body, so past the bound the
    # model falls back to the segmented XLA z-draw instead of crashing).
    # Past ~4096 topics the dense path is not competitive anyway: use
    # scheme `ggs_aliasmh` (O(1)-per-token draws, BENCH_MATRIX 7e/7f).
    _FUSED_ZDRAW_KPAD_MAX = 4096

    def _needs_xla_zdraw_arrays(self) -> bool:
        """Whether the flat per-slot (w, d) arrays backing the segmented
        XLA-fallback z-draw must exist. Subclasses that replace the
        z-draw entirely (ggs_aliasmh) override to False — at PubMed
        scale the arrays are ~7 GB the MH path never reads."""
        return not self._use_fused_zdraw()

    def _use_fused_zdraw(self) -> bool:
        mode = self.config.zdraw_kernel
        kpad = max(128, ((self.config.topics + 127) // 128) * 128)
        return (mode != "xla" and jax.default_backend() == "tpu"
                and kpad <= self._FUSED_ZDRAW_KPAD_MAX)

    def _zdraw_stream_theta(self) -> bool:
        """Stream theta d-windows from HBM when the whole [kpad, Dpad]
        table exceeds the VMEM residency budget (large K or large D)."""
        return fused_zdraw_vmem_bytes(
            self.corpus.num_docs, self.config.topics, self.config.doc_span,
            self.config.zdraw_precise) > _FUSED_ZDRAW_VMEM_BUDGET

    # NEGATIVE RESULT (round-3, VERDICT round-2 item 7) — do not retry:
    # emitting n_dk FROM the fused kernel (one extra oh_d x oh_z MXU pass
    # per chunk into a [Dpad, kpad] accumulator) measured the kernel at
    # 8.8 ms vs 3.6 ms at 20NG K=100 — regardless of whether the
    # accumulator was a constant-index VMEM output, a persistent VMEM
    # scratch with one final DMA, dynamically or statically offset, or
    # store-only: the added matmul depends on z_out, the END of each
    # chunk's dependency chain, so it extends the critical path by
    # ~165 ns/chunk instead of pipelining. The standalone d-window-major
    # rebuild (_count_ndk) does the same math in ~0.5 ms because its
    # one-hot operands arrive with no upstream chain. See PERF.md.

    def _count_nkw(self, z):
        nkw = blocked_label_counts(
            self.wb, z.reshape(self.wb.shape), self.winb, self.firstb,
            nwin=self._blocks.nwin_w, vspan=self.config.vocab_span,
            num_labels=self.config.topics)
        return nkw[: self.corpus.num_types]

    def _count_ndk(self, z):
        if jax.default_backend() != "tpu":
            ones = jnp.where(self.mf, 1, 0)
            return jnp.zeros((self.corpus.num_docs, self.config.topics),
                             jnp.int32).at[self.df, z].add(ones)
        # regroup z d-window-major with one chunk-granular row gather, then
        # the same Pallas count kernel produces n_dk — no scatter.
        z_b = z.reshape(-1, self._blocks.chunk)[self.srcb].reshape(
            self.dlb.shape)
        ndk = blocked_label_counts(
            self.dlb, z_b, self.windb, self.firstdb,
            nwin=self._blocks.nwin_d, vspan=self.config.doc_span,
            num_labels=self.config.topics)
        return ndk[: self.corpus.num_docs]

    def _init_state(self, key: jax.Array) -> LDAState:
        cfg = self.config
        k_z, k_phi, k_theta, k_next = jax.random.split(key, 4)
        z = jax.random.randint(k_z, self.mf.shape, 0, cfg.topics, jnp.int32)
        z = jnp.where(self.mf, z, 0)
        nkw = self._count_nkw(z)
        ndk = self._count_ndk(z)
        alpha = self._alpha_vector()
        beta = jnp.float32(cfg.beta)
        phi = self._sample_phi(k_phi, nkw, beta, None, None)
        theta = rnd.dirichlet(k_theta, ndk.astype(jnp.float32) + alpha)
        return LDAState(key=k_next, z=z, ndk=ndk, nkw=nkw,
                        nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                        alpha=alpha, beta=beta, iteration=jnp.int32(0))

    # ------------------------------------------------------------------
    def _sample_phi(self, key, nkw_vk, beta, type_mask, prev_phi_vk):
        """phi in [V, K] orientation: Gamma draw + column normalisation."""
        conc = nkw_vk.astype(jnp.float32) + (beta if self.smooth_phi
                                             else 1e-7)
        if type_mask is None:
            g = jnp.maximum(rnd.gamma(key, conc), rnd.DIRICHLET_FLOOR)
            return g / jnp.sum(g, axis=0, keepdims=True)
        phi_kv = rnd.conditional_dirichlet(key, prev_phi_vk.T, conc.T,
                                           type_mask)
        return phi_kv.T

    def _theta_update(self, key, state, doc_mask):
        theta_new = rnd.dirichlet(
            key, state.ndk.astype(jnp.float32) + state.alpha)
        if doc_mask is None:       # full sweep: no per-doc select needed
            return theta_new
        return jnp.where(doc_mask[:, None], theta_new, state.theta)

    def _step(self, state: LDAState, doc_mask,
              type_mask) -> LDAState:
        """One GGS iteration. `doc_mask = None` is the static full-sweep
        fast path (every doc selected — the multi-iteration driver):
        skips the two [D, K] doc-mask selects."""
        cfg = self.config
        num_topics = cfg.topics
        vspan = cfg.vocab_span
        pad_rows = self._blocks.nwin_w * vspan - self.corpus.num_types
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)

        # (1) theta draws — unselected docs keep their previous row.
        theta = self._theta_update(k_theta, state, doc_mask)

        if self._use_fused_zdraw():
            # (2)+(3a) fused Pallas kernel: gather-free z-draw + N_kw in one
            # pass (ops/pallas_zdraw.py). Doc selection = zeroed theta rows.
            blocks = self._blocks
            nb = blocks.w_local.shape[0]
            chunks = blocks.w_local.shape[1] // blocks.chunk
            shape3 = (nb, chunks, blocks.chunk)
            theta_m = (theta if doc_mask is None
                       else jnp.where(doc_mask[:, None], theta, 0.0))
            seed = jax.random.randint(k_z, (1,), -2 ** 31, 2 ** 31 - 1,
                                      jnp.int32)
            z3, nkw = fused_zdraw_nkw(
                self.wb.reshape(shape3), self.dla.reshape(shape3),
                state.z.reshape(shape3), theta_m, state.phi, seed,
                self.winb, self.firstb, self.windc,
                nwin_w=blocks.nwin_w, nwin_d=blocks.nwin_d,
                vspan=vspan, dspan=blocks.dspan, num_topics=num_topics,
                precise=cfg.zdraw_precise,
                stream_theta=self._zdraw_stream_theta())
            z = z3.reshape(-1)
            nkw = nkw[: self.corpus.num_types]
        else:
            # (2) flat fused z-draw over every token at once: the
            # reference's inverse-CDF draw
            # (LDAGroupedGibbsSampler.java:96-113), with the cumulative sum
            # as ONE triangular f32 matmul on the MXU and one uniform per
            # token — ~3.5 ms cheaper than Gumbel-max, which needs a [N, K]
            # Gumbel field. The doc-selection flag travels as column K of
            # the gathered theta rows (free: rows pad to the 128-lane tile
            # anyway; a separate doc_mask[doc_ids] bool gather measured
            # +12 ms).
            phi_pad = jnp.pad(state.phi, ((0, pad_rows), (0, 0)))
            dm = (jnp.ones((theta.shape[0],), jnp.float32) if doc_mask
                  is None else doc_mask.astype(jnp.float32))
            ext = jnp.concatenate([theta, dm[:, None]], axis=1)
            tri = jnp.triu(jnp.ones((num_topics, num_topics), jnp.float32))
            npad = self.df.shape[0]
            u_all = jax.random.uniform(k_z, (npad,), jnp.float32)
            # Segment the token axis so the [L, K+] gather/score/cdf temps
            # stay ~<=1.5 GB regardless of K: monolithic at 20NG K=1000 the
            # three temps are 11 GB each and OOM a 16 GB chip.
            nseg = max(1, -(-npad * num_topics * 12
                            // _XLA_ZDRAW_TEMP_BYTES))
            seg_len = (-(-npad // nseg) + 2047) // 2048 * 2048
            nseg = -(-npad // seg_len)
            pad_n = nseg * seg_len - npad

            def _seg(args):
                dfi, wgi, ui = args
                rows = ext[dfi]                      # [L, K+1]
                probs = rows[:, :num_topics] * phi_pad[wgi]
                if num_topics > 512:
                    # the [L, K] x [K, K] tril matmul is Theta(K^2) per
                    # token — ~45 TFLOP/iter at 20NG K=4096 (~4 s/iter
                    # measured, round 5). The associative-scan cumsum is
                    # bandwidth-bound instead: same inverse-CDF draw,
                    # measured ~5x faster at K=4096.
                    cdf = jnp.cumsum(probs, axis=-1)
                else:
                    cdf = jax.lax.dot(probs, tri,
                                      precision=jax.lax.Precision.HIGHEST,
                                      preferred_element_type=jnp.float32)
                u = ui[:, None] * cdf[:, -1:]
                zn = jnp.minimum(
                    jnp.sum((cdf <= u).astype(jnp.int32), axis=-1),
                    num_topics - 1)
                return zn, rows[:, num_topics]

            z_seg, sel_seg = jax.lax.map(_seg, (
                jnp.pad(self.df, (0, pad_n)).reshape(nseg, seg_len),
                jnp.pad(self.wg, (0, pad_n)).reshape(nseg, seg_len),
                jnp.pad(u_all, (0, pad_n)).reshape(nseg, seg_len)))
            z_new = z_seg.reshape(-1)[:npad]
            sel = self.mf & (sel_seg.reshape(-1)[:npad] > 0.5)
            z = jnp.where(sel, z_new, state.z)
            # (3a) N_kw rebuild: Pallas windowed count kernel.
            nkw = self._count_nkw(z)

        # (3b) n_dk rebuild on the d-window-major layout.
        ndk = self._count_ndk(z)

        # (4) phi draws.
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                              iteration=state.iteration + 1)

    # ------------------------------------------------------------------
    # multi-iteration fused driver (bench / large runs): one dispatch per
    # `n` iterations, full sweeps (no random scan), via lax.scan.
    # ------------------------------------------------------------------
    def _multi_step_fn(self, n: int):
        def run(state):
            def body(st, _):
                # doc_mask=None: the static full-sweep fast path
                return self._step(st, None, None), None
            out, _ = jax.lax.scan(body, state, None, length=n)
            return out
        jitted = jax.jit(self._with_rebound(run), donate_argnums=(1,))
        return lambda state: jitted(self._device_arrays(), state)

    def sample_chunked(self, iterations: int, chunk: int = 10):
        fn = self._multi_step_fn(chunk)
        done = 0
        while done < iterations:
            self.state = fn(self.state)
            done += chunk
        jax.block_until_ready(self.state.z)
        return self

    # ------------------------------------------------------------------
    # layout-aware accessors
    # ------------------------------------------------------------------
    def get_phi(self) -> np.ndarray:
        return np.asarray(self.state.phi.T)

    def set_phi(self, phi, vocab=None, labels=None):
        if vocab is not None and list(vocab) != list(self.corpus.vocab):
            raise ValueError("vocabulary mismatch in set_phi")
        phi = jnp.asarray(phi, jnp.float32)
        self.state = self.state._replace(phi=phi.T)

    def get_z_indicators(self) -> np.ndarray:
        z = np.asarray(self.state.z).reshape(-1)
        idx = self._blocks.flat_index.reshape(-1)
        out = np.zeros(self.corpus.num_tokens, np.int32)
        valid = idx >= 0
        out[idx[valid]] = z[valid]
        return out

    def _z_from_flat(self, z_flat: np.ndarray) -> np.ndarray:
        z_flat = np.asarray(z_flat, np.int32)
        z = np.zeros(self._blocks.flat_index.shape, np.int32)
        valid = self._blocks.flat_index >= 0
        z[valid] = z_flat[self._blocks.flat_index[valid]]
        return z.reshape(-1)  # GGS keeps z flat over block slots

    def set_z_indicators(self, z_flat):
        z_flat = np.asarray(z_flat, np.int32)
        z = np.zeros(self._blocks.flat_index.shape, np.int32)
        valid = self._blocks.flat_index >= 0
        z[valid] = z_flat[self._blocks.flat_index[valid]]
        st = self.state
        z = jnp.asarray(z.reshape(-1))
        nkw = self._count_nkw(z)
        ndk = self._count_ndk(z)
        key, k_phi = jax.random.split(st.key)
        phi = self._sample_phi(k_phi, nkw, st.beta, None, None)
        self.state = st._replace(key=key, z=z, ndk=ndk, nkw=nkw,
                                 nk=jnp.sum(nkw, axis=0), phi=phi)


class LDAGroupedGibbsSamplerTest(LDAGroupedGibbsSampler):
    """Deliberately *invalid* GGS variant kept for experiment parity.

    Reference: topics/LDAGroupedGibbsSamplerTest.java ("This is not a valid
    sampler", :2) — same structure as GGS but theta is NOT redrawn each
    iteration (token draws use the previous iteration's theta), breaking
    detailed balance exactly as the reference variant does.
    """

    def _theta_update(self, key, state, doc_mask):
        return state.theta
