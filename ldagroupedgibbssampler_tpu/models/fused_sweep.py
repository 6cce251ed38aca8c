"""Shared machinery for samplers whose z-step is the PCGS conditional
(n_dk + alpha_k) * phi[k][w] with immediate n_dk updates
(UncollapsedParallelLDA.java:1509-1513) — the PCGS/uncollapsed/spalias
family (models/pcgs.py) and the HDP family (models/hdp.py, where alpha_k is
the stick weight alpha*psi_k).

On TPU the sweep runs as ONE gather-free Pallas kernel
(ops/pallas_pcgs.py) over sequential-safe cell blocks: VMEM-resident
n_dk table when it fits the budget (corpus/ragged.py::
build_cell_blocks_seq layout), HBM-streamed windows otherwise
(build_stream_blocks, d-window-major). z then lives in the block layout
and the accessors here translate. The XLA doc-sequential sweep
(ops/kernels.py) remains the off-TPU / zdraw_kernel="xla" path.

Mixed into a TpuLDASampler subclass BEFORE the base in the MRO. The
concrete class keeps ownership of `_step` / `_init_state`; this mixin
provides the gate, the block preparation, the sweep core, and the
layout-aware z accessors. Classes whose `_step` does NOT draw from the
PCGS conditional (the LightLDA MH family) must set
`fused_pcgs_eligible = False`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.ops.pallas_pcgs import (
    FLAG_ROWS, KTILE_MIN, fused_pcgs_sweep, fused_pcgs_sweep_streamed,
    fused_pcgs_streamed_vmem_bytes, fused_pcgs_vmem_bytes)

# VMEM residency budget for the n_dk table (same gate style as the GGS
# kernel's theta table)
_FUSED_PCGS_VMEM_BUDGET = 10 * 2 ** 20
# scratch budget for the STREAMED variant (NBUF word/N_kw slots + tb_buf;
# ADVICE round-1 item 1): conservative vs the ~16 MiB/core VMEM so the
# compiler keeps headroom for spills/fusions.
_STREAMED_VMEM_BUDGET = 14 * 2 ** 20
# the sequential-safe layout requires dspan <= chunk (= 128)
_SEQ_DSPAN = 128


class FusedPCGSSweepMixin:
    """Fused-sweep gate + block layout + sweep core + z accessors."""

    fused_pcgs_eligible = True

    # -- gate ------------------------------------------------------------
    def _fused_interpret(self) -> bool:
        """Test-only: run the fused sweep under the pltpu interpreter on
        any backend (zdraw_kernel="interpret"). The in-kernel PRNG cannot
        lower there, so the sweep call injects real 24-bit uniforms drawn
        OUTSIDE the kernel (the u24 operand) — the interpreted chain is
        statistically exact, which is what lets the CPU Geweke harness
        drive the actual kernel bodies (round-3 VERDICT item 4)."""
        return self.config.zdraw_kernel == "interpret"

    # streamed-scratch shape knobs (overridden by the MH/collapsed users)
    _streamed_word_tables = 1   # 2 for the MH kernel (target + proposal)
    _streamed_collapsed = False  # True for the ADLDA collapsed conditional
    # test-only: force the K-tiled streamed chunk body at small K so the
    # joint-distribution harnesses exercise the actual tiled code
    _force_ktile = False
    # True for schemes whose conditional has provably positive support
    # everywhere (floored-Dirichlet phi, or the collapsed conditional
    # with beta > 0): lets the kernels skip the K-proportional
    # last-nonzero-topic passes (round-4 large-K speedup). Must stay
    # False for zero-support phi families (Polya-Urn, VS, masked priors,
    # HDP inactive topics).
    fused_positive_support = False

    def _streamed_block(self) -> int:
        """Token block for the STREAMED layout. When the K-tiled chunk
        body engages (kpad >= KTILE_MIN, PCGS/ADLDA kernels only — the MH
        kernel is untiled at all K, mirroring the tiled predicate in
        fused_pcgs_streamed_vmem_bytes) the kernel unrolls
        chunks-per-block x K-tiles tile bodies, so the block is capped at
        1024 tokens (8 chunks x 32 tiles at kpad=4096 ~= the measured
        K=1000 program size) to bound Mosaic compile time; the extra grid
        steps are noise against the large-K per-chunk compute."""
        blk = self.config.token_block
        tiled = (self._kpad() >= KTILE_MIN
                 and self._streamed_word_tables == 1)
        return min(blk, 1024) if tiled else blk

    def _streamed_vspan(self) -> int:
        """Largest vspan (config value halved down to 128) whose streamed
        scratch fits _STREAMED_VMEM_BUDGET; 0 if even vspan=128 is over
        (then the streamed path is ineligible and XLA runs instead) —
        the streamed-variant VMEM gate (ADVICE round-1 item 1)."""
        vspan = max(128, self.config.vocab_span)
        while vspan >= 128:
            need = fused_pcgs_streamed_vmem_bytes(
                self.config.topics, vspan, _SEQ_DSPAN,
                self._streamed_block(),
                collapsed=self._streamed_collapsed,
                num_word_tables=self._streamed_word_tables)
            if need <= _STREAMED_VMEM_BUDGET:
                return vspan
            if vspan == 128:
                return 0
            vspan = max(128, vspan // 2)
        return 0

    def _fused_mode(self):
        """None (XLA sweep) | "resident" | "streamed"."""
        if not (self.fused_pcgs_eligible
                and self.config.zdraw_kernel != "xla"
                and (jax.default_backend() == "tpu"
                     or self._fused_interpret())
                and self.corpus is not None):
            return None
        fits = fused_pcgs_vmem_bytes(self.corpus.num_docs,
                                     self.config.topics, _SEQ_DSPAN,
                                     collapsed=self._streamed_collapsed,
                                     vspan=self.config.vocab_span) \
            <= _FUSED_PCGS_VMEM_BUDGET
        if fits:
            return "resident"
        return "streamed" if self._streamed_vspan() > 0 else None

    def _use_fused_sweep(self) -> bool:
        return self._fused_mode() is not None

    # -- device data -------------------------------------------------------
    def _prepare_device_data(self, corpus):
        super()._prepare_device_data(corpus)
        mode = self._fused_mode()
        if mode is not None:
            if mode == "resident":
                b = corpus.cell_blocks_seq(block=self.config.token_block,
                                           vspan=self.config.vocab_span,
                                           dspan=_SEQ_DSPAN)
            else:
                from ldagroupedgibbssampler_tpu.corpus.ragged import (
                    build_stream_blocks)
                b = build_stream_blocks(
                    corpus.tokens, corpus.token_doc_ids(),
                    corpus.num_types, corpus.num_docs,
                    block=self._streamed_block(),
                    vspan=self._streamed_vspan(), dspan=_SEQ_DSPAN)
            self._sblocks = b
            nb = b.w_local.shape[0]
            chunks = b.w_local.shape[1] // b.chunk
            self._sshape3 = (nb, chunks, b.chunk)
            self.swb = jnp.asarray(b.w_local.reshape(self._sshape3))
            if mode == "resident":
                self.sdla = jnp.asarray(b.d_local_a.reshape(self._sshape3))
                self.swinb = jnp.asarray(b.win_w)
                self.sfirstb = jnp.asarray(b.first_w)
            else:
                self.sdla = jnp.asarray(b.d_local.reshape(self._sshape3))
                self.swwc = jnp.asarray(b.win_w_chunks)
            self.swindc = jnp.asarray(b.win_d_chunks)
            # block slot -> doc-major padded flat position, for the traced
            # z-layout conversion in _blockify_z_state (runs under the
            # jitted _init_state): canonical token i of doc d at in-doc
            # offset p sits at d * Lmax + p in z_pad.reshape(-1)
            off = corpus.doc_offsets
            d_all = corpus.token_doc_ids()
            lmax = (self.w_pad.shape[1] if hasattr(self, "w_pad")
                    else int(np.max(np.diff(off)) or 1))
            tok_pos = (np.arange(corpus.num_tokens, dtype=np.int64)
                       - off[d_all]) + d_all.astype(np.int64) * lmax
            fi = b.flat_index.reshape(-1)
            self._blk_valid = jnp.asarray(fi >= 0)
            self._blk_src = jnp.asarray(
                np.where(fi >= 0, tok_pos[np.maximum(fi, 0)], 0),
                dtype=jnp.int32)

    def _z_flat_to_blocks(self, z_flat: np.ndarray) -> np.ndarray:
        fi = self._sblocks.flat_index.reshape(self._sshape3)
        z = np.zeros(self._sshape3, np.int32)
        valid = fi >= 0
        z[valid] = np.asarray(z_flat, np.int32)[fi[valid]]
        return z

    def _blockify_z_state(self, st):
        """Convert a doc-major-z state to the block layout (traced gather
        — runs under the jitted `_init_state`). Concrete classes call this
        at the END of their `_init_state`. Counts are layout-independent."""
        if not self._use_fused_sweep():
            return st
        z = jnp.where(self._blk_valid,
                      st.z.reshape(-1)[self._blk_src],
                      0).astype(jnp.int32).reshape(self._sshape3)
        return st._replace(z=z)

    # -- sweep core --------------------------------------------------------
    def _kpad(self) -> int:
        return max(128, ((self.config.topics + 127) // 128) * 128)

    def _ndk_table(self, ndk, alpha, doc_mask):
        """(n_dk + alpha).T padded to [kpad + FLAG_ROWS, Dpad]; row kpad
        carries the random-scan doc-selection flag."""
        kpad = self._kpad()
        dpad = self._sblocks.nwin_d * _SEQ_DSPAN
        d = self.corpus.num_docs
        table = jnp.zeros((kpad + FLAG_ROWS, dpad), jnp.float32)
        table = table.at[: self.config.topics, :d].set(
            (ndk.astype(jnp.float32) + alpha[None, :]).T)
        return table.at[kpad, :d].set(doc_mask.astype(jnp.float32))

    def _fused_seed(self, k_z):
        return jax.random.randint(k_z, (1,), -2 ** 31, 2 ** 31 - 1,
                                  jnp.int32)

    def _fused_extract(self, nkw_vk, table_out, alpha):
        """Kernel outputs -> (ndk int32 [D, K], nkw int32 [K, V])."""
        nkw = nkw_vk[: self.corpus.num_types].T            # [K, V]
        ndk = jnp.rint(
            table_out[: self.config.topics, : self.corpus.num_docs].T
            - alpha[None, :]).astype(jnp.int32)
        return ndk, nkw

    def _fused_zsweep(self, k_z, z_blocks, ndk, alpha, word_vk, doc_mask,
                      nk_plus=None, beta=None):
        """One fused Gibbs sweep. Returns (z_blocks', ndk' int32 [D, K],
        nkw' int32 [K, V]) — n_dk rides the kernel's resident table, N_kw
        accumulates in-kernel, so no recount is needed. `word_vk` is phi
        [V, K] (PCGS/HDP) — or, for the collapsed ADLDA conditional (with
        `nk_plus` = (V beta + n_k) and `beta`), the sweep-entry N_kw.T
        counts, which the kernel keeps LIVE chunk to chunk."""
        cfg = self.config
        b = self._sblocks
        u24 = None
        if self._fused_interpret():
            # the interpreter cannot lower the in-kernel PRNG: draw the
            # per-token 24-bit uniforms outside and inject them, so the
            # interpreted chain is statistically exact (Geweke-able)
            k_z, k_u = jax.random.split(k_z)
            u24 = jax.random.randint(k_u, self._sshape3, 0, 2 ** 24,
                                     jnp.int32)
        if self._fused_mode() == "streamed":
            z, nkw_vk, table_out = fused_pcgs_sweep_streamed(
                self.swb, self.sdla, z_blocks,
                self._ndk_table(ndk, alpha, doc_mask), word_vk,
                self._fused_seed(k_z),
                self.swwc, self.swindc, u24=u24, nk_plus=nk_plus,
                beta=beta,
                nwin_w=b.nwin_w, nwin_d=b.nwin_d,
                vspan=self._streamed_vspan(),
                dspan=_SEQ_DSPAN, num_topics=cfg.topics,
                interpret=self._fused_interpret(),
                force_ktile=self._force_ktile,
                positive_support=self.fused_positive_support)
        else:
            z, nkw_vk, table_out = fused_pcgs_sweep(
                self.swb, self.sdla, z_blocks,
                self._ndk_table(ndk, alpha, doc_mask), word_vk,
                self._fused_seed(k_z),
                self.swinb, self.sfirstb, self.swindc, u24=u24,
                nk_plus=nk_plus,
                beta=beta,
                nwin_w=b.nwin_w, nwin_d=b.nwin_d, vspan=cfg.vocab_span,
                dspan=_SEQ_DSPAN, num_topics=cfg.topics,
                interpret=self._fused_interpret(),
                positive_support=self.fused_positive_support)
        ndk_out, nkw = self._fused_extract(nkw_vk, table_out, alpha)
        return z, ndk_out, nkw

    # -- layout-aware accessors (block-layout z when the path is on) -------
    def _z_from_flat(self, z_flat: np.ndarray) -> np.ndarray:
        if not self._use_fused_sweep():
            return super()._z_from_flat(z_flat)
        return self._z_flat_to_blocks(z_flat)

    def get_z_indicators(self) -> np.ndarray:
        if not self._use_fused_sweep():
            return super().get_z_indicators()
        z = np.asarray(self.state.z).reshape(-1)
        idx = self._sblocks.flat_index.reshape(-1)
        out = np.zeros(self.corpus.num_tokens, np.int32)
        valid = idx >= 0
        out[idx[valid]] = z[valid]
        return out

    def set_z_indicators(self, z_flat):
        if not self._use_fused_sweep():
            return super().set_z_indicators(z_flat)
        # let the base rebuild counts/phi in the doc-major layout, then
        # re-express z in the block layout
        z_flat = np.asarray(z_flat, np.int32)
        super().set_z_indicators(z_flat)
        self.state = self.state._replace(
            z=jnp.asarray(self._z_flat_to_blocks(z_flat)))

    def sample_z_given_phi(self, iterations: int = 100):
        super().sample_z_given_phi(iterations)
        if self._use_fused_sweep():
            # base rebuilds z doc-major; convert to the block layout
            z_flat = np.asarray(self.state.z)[np.asarray(self.mask_pad)]
            self.state = self.state._replace(
                z=jnp.asarray(self._z_flat_to_blocks(z_flat)))
        return self
