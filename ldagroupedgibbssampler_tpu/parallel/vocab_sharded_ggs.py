"""Multi-chip GGS with the fused kernel: vocabulary-sharded cell blocks.

The single-chip flagship (models/ggs.py) runs the z-draw + N_kw rebuild as
one fused Pallas kernel over (w-window, d-window) cell blocks. This class
composes that kernel over a device mesh by sharding the *vocabulary window*
axis: each shard owns a contiguous range of w-windows (balanced by token
count), and with it

  - the tokens of those types (its own cell blocks, window-local ids),
  - its rows of phi and N_kw (the kernel's natural output layout),
  - its slice of the fused z-draw (theta streams/resides per shard
    exactly as on one chip).

Communication per iteration (the whole of it):

  - one `psum` of the per-shard n_dk partials ([D, K]) — a document's
    tokens span shards because sharding is by type, so doc-topic counts
    are the quantity that must be reduced (the TPU analogue of the
    reference's AtomicInteger delta drain,
    UncollapsedParallelLDA.java:1107-1221). Runs in int16 (half the
    collective bytes — 1.6 GB instead of 3.3 GB per iteration at PubMed
    scale) whenever every doc is shorter than int16 max, since partials
    and their sum are bounded by doc length; int32 fallback otherwise;
  - one `psum` assembling global N_kw from the shard-local window ranges
    (zero-padded placement, so it is a concatenation riding the same
    all-reduce).

theta ([D, K]) and phi ([V, K]) are then redrawn *identically on every
shard* from the reduced counts with a shared PRNG key — replicated compute
instead of a broadcast, as in parallel/sharded_ggs.py. Compare the
reference's parallel axes: this is P1 (docs) swapped for P3/P5 (topic/type
partitioning, SpaliasUncollapsedParallelLDA.java:39-115) — on TPU the type
axis is the one that keeps the fused kernel's operands shard-local.

Off-TPU (the CPU test mesh) the per-shard z-draw uses the same flat XLA
fallback as models/ggs.py, so the whole multi-chip path is testable on a
virtual 8-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus, build_cell_blocks
from ldagroupedgibbssampler_tpu.models.base import LDAState
from ldagroupedgibbssampler_tpu.models.ggs import (
    _FUSED_ZDRAW_VMEM_BUDGET, LDAGroupedGibbsSampler)
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.ops.pallas_counts import blocked_label_counts
from ldagroupedgibbssampler_tpu.ops.pallas_zdraw import (
    fused_zdraw_nkw, fused_zdraw_vmem_bytes)
from ldagroupedgibbssampler_tpu.parallel.mesh import make_mesh

_GOLD = -1640531527


def interleave_permutation(type_counts: np.ndarray, vspan: int):
    """Frequency-interleaved type relabeling: perm[old_id] = new_id.

    Types sorted by descending frequency are dealt round-robin across the
    w-windows, so each window holds every nwin-th rank of the Zipf curve
    and carries ~equal token mass. Without this, contiguous-id windows
    concentrate the Zipf head in window 0 and no contiguous-window shard
    partition can balance (measured 4.1x max/mean imbalance on a
    PubMed-stats corpus, benchmarks/pubmed_rehearsal.py). The model works
    in permuted space internally; phi/N_kw are permuted at the step
    boundary so external state keeps original type ids."""
    v = len(type_counts)
    nwin = max(1, -(-v // vspan))
    caps = np.full(nwin, vspan, np.int64)
    caps[-1] = v - (nwin - 1) * vspan
    order = np.argsort(-np.asarray(type_counts), kind="stable")
    perm = np.empty(v, np.int64)
    fill = np.zeros(nwin, np.int64)
    w = 0
    for i in range(v):
        while fill[w] >= caps[w]:
            w = (w + 1) % nwin
        perm[order[i]] = w * vspan + fill[w]
        fill[w] += 1
        w = (w + 1) % nwin
    inv = np.empty(v, np.int64)
    inv[perm] = np.arange(v)
    return perm.astype(np.int32), inv.astype(np.int32)


def partition_windows(type_counts: np.ndarray, vspan: int, num_shards: int):
    """Contiguous w-window ranges with balanced token counts.

    Returns window bounds [S+1] (each shard gets >= 1 window)."""
    nwin = max(1, -(-len(type_counts) // vspan))
    if num_shards > nwin:
        raise ValueError(
            f"{num_shards} shards need >= {num_shards} vocab windows; "
            f"V={len(type_counts)} vspan={vspan} gives {nwin}")
    per_win = np.zeros(nwin, np.int64)
    np.add.at(per_win, np.arange(len(type_counts)) // vspan, type_counts)
    cum = np.concatenate([[0], np.cumsum(per_win)])
    bounds = [0]
    for s in range(1, num_shards):
        t = cum[-1] * s / num_shards
        b = int(np.searchsorted(cum, t))
        bounds.append(min(max(b, bounds[-1] + 1), nwin - (num_shards - s)))
    bounds.append(nwin)
    return np.asarray(bounds)


class VocabShardedGGS(LDAGroupedGibbsSampler):
    """GGS sharded by vocabulary window over `mesh` (fused kernel per shard).

    State is laid out exactly as the single-chip GGS (nkw/phi [V, K],
    ndk/theta [D, K], all replicated) except z, which lives in per-shard
    cell blocks [S, NBa, block] sharded on the mesh axis."""

    _jit_init = False  # init contains shard_map (_count_all)

    def __init__(self, config, logger=None, mesh=None):
        super().__init__(config, logger=logger)
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh_shape or None, tuple(config.mesh_axis_names))
        (self.axis,) = self.mesh.axis_names

    # ------------------------------------------------------------------
    def _prepare_device_data(self, corpus: Corpus):
        cfg = self.config
        vspan, dspan = cfg.vocab_span, cfg.doc_span
        block, chunk = cfg.token_block, 128
        S = self.mesh.devices.size
        # int16 n_dk psum: the [D, K] partial merge is THE cross-chip
        # reduction of this scheme (PERF.md scaling envelope — 3.3 GB/iter
        # at PubMed scale in int32); per-shard partials and their sum are
        # bounded by the doc length, so when every doc is shorter than
        # int16 max the collective runs at half the bytes. Decided
        # statically per corpus; wide fallback for pathological docs.
        self._ndk_i16 = bool(
            np.max(np.diff(corpus.doc_offsets), initial=0) < 2 ** 15)
        d_all = corpus.token_doc_ids()
        tf = corpus.type_frequencies()
        # frequency-interleaved internal relabeling (see
        # interleave_permutation): blocks/wgf/phi windows live in permuted
        # space; state.phi/state.nkw stay in original type ids.
        self.type_perm, self.type_inv = interleave_permutation(tf, vspan)
        self._perm_dev = jnp.asarray(self.type_perm)
        self._inv_dev = jnp.asarray(self.type_inv)
        ptokens = self.type_perm[corpus.tokens]
        tf_p = tf[self.type_inv]
        wb = partition_windows(tf_p, vspan, S)
        self.win_bounds = wb
        self.nwin_local = (wb[1:] - wb[:-1]).astype(int)
        nwin_max = int(self.nwin_local.max())
        self.nwin_max = nwin_max
        ww_all = ptokens // vspan

        per = []
        for s in range(S):
            sel = (ww_all >= wb[s]) & (ww_all < wb[s + 1])
            idx = np.nonzero(sel)[0]
            b = build_cell_blocks(
                ptokens[idx] - wb[s] * vspan, d_all[idx],
                num_types=int(self.nwin_local[s]) * vspan,
                num_docs=corpus.num_docs, block=block, vspan=vspan,
                dspan=dspan, chunk=chunk)
            per.append((b, idx))
        # shard bookkeeping for balance / memory reporting
        # (benchmarks/pubmed_rehearsal.py)
        self.shard_token_counts = [int(len(idx)) for _, idx in per]
        self.shard_pad_slots = [int(b.w_local.size) for b, _ in per]
        nba = max(b.w_local.shape[0] for b, _ in per)
        nbb = max(b.d_local.shape[0] for b, _ in per)
        bpc = block // chunk
        nwin_d = per[0][0].nwin_d

        def padA(x, fill, n2=block):
            out = np.full((S, nba, n2), fill, x[0].dtype)
            for s, a in enumerate(x):
                out[s, : a.shape[0]] = a
            return out

        w3 = padA([b.w_local for b, _ in per], vspan)
        dla = padA([b.d_local_a for b, _ in per], dspan)
        mk = padA([b.mask for b, _ in per], False)
        wdc = np.zeros((S, nba * bpc), np.int32)
        winb = np.zeros((S, nba), np.int32)
        firstb = np.zeros((S, nba), np.int32)
        fidx = np.full((S, nba, block), -1, np.int64)
        srcb = np.zeros((S, nbb * bpc), np.int32)
        dlb = np.full((S, nbb, block), dspan, np.int32)
        windb = np.zeros((S, nbb), np.int32)
        firstdb = np.zeros((S, nbb), np.int32)
        for s, (b, idx) in enumerate(per):
            na, nb_ = b.w_local.shape[0], b.d_local.shape[0]
            wdc[s, : na * bpc] = b.win_d_chunks
            winb[s, :na] = b.win_w
            winb[s, na:] = int(self.nwin_local[s]) - 1  # tail: stay on the
            firstb[s, na:] = 0                          # last real window
            firstb[s, :na] = b.first_w
            fi = b.flat_index.copy()
            valid = fi >= 0
            fi[valid] = idx[fi[valid]]                  # shard-local -> global
            fidx[s, :na] = fi
            srcb[s, : nb_ * bpc] = b.src_chunks
            srcb[s, nb_ * bpc:] = na * bpc - 1          # shard's pad chunk
            dlb[s, :nb_] = b.d_local
            windb[s, :nb_] = b.win_d
            windb[s, nb_:] = nwin_d - 1
            firstdb[s, :nb_] = b.first_d

        ax = self.axis
        sh = lambda *rest: NamedSharding(self.mesh, P(ax, *rest))  # noqa:E731
        put = jax.device_put
        self.wb3 = put(jnp.asarray(w3), sh(None, None))
        self.dla3 = put(jnp.asarray(dla), sh(None, None))
        self.mk3 = put(jnp.asarray(mk), sh(None, None))
        self.wdc = put(jnp.asarray(wdc), sh(None))
        self.winb = put(jnp.asarray(winb), sh(None))
        self.firstb = put(jnp.asarray(firstb), sh(None))
        self.srcb = put(jnp.asarray(srcb), sh(None))
        self.dlb = put(jnp.asarray(dlb), sh(None, None))
        self.windb = put(jnp.asarray(windb), sh(None))
        self.firstdb = put(jnp.asarray(firstdb), sh(None))
        self._flat_index = fidx
        # per-shard global row offset of the local vocab range, and the
        # count of valid local rows (for masking never-visited pad windows)
        row0 = (wb[:-1] * vspan).astype(np.int32)
        self.row0 = put(jnp.asarray(row0[:, None]), sh(None))
        rows = nwin_max * vspan
        rmask = (np.arange(rows)[None, :]
                 < (self.nwin_local * vspan)[:, None])
        self.rowmask = put(jnp.asarray(rmask[:, :, None]), sh(None, None))
        # padded global row count so every shard's dynamic_update_slice of
        # its [rows, K] local block fits without start-clamping
        self._vpad_global = int(row0[-1]) + rows
        # flat per-token arrays for the XLA fallback path (global ids)
        npad = nba * block
        wgf = np.full((S, npad), 0, np.int32)
        dff = np.zeros((S, npad), np.int32)
        for s, (b, idx) in enumerate(per):
            na = b.w_local.shape[0]
            wl = np.minimum(b.w_local, vspan - 1)
            wgf[s, : na * block] = (wl + b.win_w[:, None] * vspan
                                    + wb[s] * vspan).reshape(-1)
            dff[s, : na * block] = b.doc_ids.reshape(-1)
        self.wgf = put(jnp.asarray(wgf), sh(None))
        self.dff = put(jnp.asarray(dff), sh(None))
        self._nba, self._nbb = nba, nbb
        self._bpc, self._chunk = bpc, chunk
        self._nwin_d = nwin_d

    # ------------------------------------------------------------------
    def _zdraw_stream_theta(self) -> bool:
        return fused_zdraw_vmem_bytes(
            self.corpus.num_docs, self.config.topics, self.config.doc_span,
            self.config.zdraw_precise) > _FUSED_ZDRAW_VMEM_BUDGET

    def _step(self, state: LDAState, doc_mask,
              type_mask) -> LDAState:
        if doc_mask is None:   # full-sweep sentinel from _multi_step_fn
            doc_mask = jnp.ones((self.corpus.num_docs,), bool)
        cfg = self.config
        K, vspan, dspan = cfg.topics, cfg.vocab_span, cfg.doc_span
        block, chunk = cfg.token_block, self._chunk
        nba, nwin_d = self._nba, self._nwin_d
        rows = self.nwin_max * vspan
        vpadg = self._vpad_global
        D, V = self.corpus.num_docs, self.corpus.num_types
        ax = self.axis
        fused = self._use_fused_zdraw()
        stream = self._zdraw_stream_theta()
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)

        # (1) theta — replicated draw from the reduced global counts
        theta = self._theta_update(k_theta, state, doc_mask)
        theta_m = jnp.where(doc_mask[:, None], theta, 0.0)
        # external (original-id) phi -> interleaved window space
        phi_pad = jnp.pad(state.phi[self._inv_dev],
                          ((0, vpadg - V), (0, 0)))

        pe = partial(P, ax)
        ndk_i16 = self._ndk_i16  # static (per-corpus) closure constant

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(),                     # key
                           pe(None, None),          # z [S, nba, block]
                           pe(None, None),          # wb3
                           pe(None, None),          # dla3
                           pe(None, None),          # mk3
                           pe(None),                # wdc [S, nba*bpc]
                           pe(None),                # winb [S, nba]
                           pe(None),                # firstb
                           pe(None),                # srcb [S, nbb*bpc]
                           pe(None, None),          # dlb [S, nbb, block]
                           pe(None),                # windb [S, nbb]
                           pe(None),                # firstdb
                           pe(None),                # row0 [S, 1]
                           pe(None),                # wgf [S, npad]
                           pe(None),                # dff [S, npad]
                           pe(None, None),          # rmask [S, rows, 1]
                           P(),                     # theta (replicated)
                           P()),                    # phi_pad (replicated)
                 out_specs=(pe(None, None), P(), P()),
                 check_vma=False)
        def body(key_in, z3s, wb3, dla3, mk3, wdc, winb, firstb, srcb,
                 dlb, windb, firstdb, row0, wgf, dff_u, rmask,
                 theta_in, phi_in):
            sidx = jax.lax.axis_index(ax)
            z3, wb_, dla_, mk_ = z3s[0], wb3[0], dla3[0], mk3[0]
            r0 = row0[0, 0]
            if fused:
                phi_loc = jax.lax.dynamic_slice(phi_in, (r0, 0), (rows, K))
                seed = jax.random.randint(
                    key_in, (1,), -2 ** 31, 2 ** 31 - 1, jnp.int32
                ) + sidx * jnp.int32(nba) * jnp.int32(_GOLD)
                sh3 = (nba, block // chunk, chunk)
                z3n, nkw_loc = fused_zdraw_nkw(
                    wb_.reshape(sh3), dla_.reshape(sh3), z3.reshape(sh3),
                    theta_in, phi_loc, seed, winb[0], firstb[0], wdc[0],
                    nwin_w=self.nwin_max, nwin_d=nwin_d, vspan=vspan,
                    dspan=dspan, num_topics=K, precise=cfg.zdraw_precise,
                    stream_theta=stream)
                z_new3 = z3n.reshape(nba, block)
                # zero never-visited pad windows, place into global rows
                nkw_loc = nkw_loc * rmask[0]
                nkw_g = jax.lax.dynamic_update_slice(
                    jnp.zeros((vpadg, K), jnp.int32), nkw_loc, (r0, 0))
            else:
                ks = jax.random.fold_in(key_in, sidx)
                wg, df = wgf[0], dff_u[0]
                mf = mk_.reshape(-1)
                probs = theta_in[df] * phi_in[wg]
                tri = jnp.triu(jnp.ones((K, K), jnp.float32))
                cdf = jax.lax.dot(probs, tri,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
                u = (jax.random.uniform(ks, (probs.shape[0], 1), jnp.float32)
                     * cdf[:, -1:])
                z_cand = jnp.minimum(
                    jnp.sum((cdf <= u).astype(jnp.int32), axis=-1), K - 1)
                # doc selection: zeroed theta rows give total == 0
                sel = mf & (cdf[:, -1] > 0)
                z_flat = jnp.where(sel, z_cand, z3.reshape(-1))
                z_new3 = z_flat.reshape(nba, block)
                ones = jnp.where(mf, 1, 0)
                nkw_g = jnp.zeros((vpadg, K), jnp.int32
                                  ).at[wg, z_flat].add(ones)
            nkw = jax.lax.psum(nkw_g, ax)[:V]
            # n_dk partial: regroup shard-local chunks d-window-major and
            # count (TPU) or scatter (CPU), then one psum
            if fused:
                z_b = z_new3.reshape(-1, chunk)[srcb[0]].reshape(
                    dlb[0].shape)
                ndk_p = blocked_label_counts(
                    dlb[0], z_b, windb[0], firstdb[0], nwin=nwin_d,
                    vspan=dspan, num_labels=K)[:D]
            else:
                ones = jnp.where(mk_.reshape(-1), 1, 0)
                ndk_p = jnp.zeros((D, K), jnp.int32).at[
                    dff_u[0], z_new3.reshape(-1)].add(ones)
            if ndk_i16:
                ndk = jax.lax.psum(ndk_p.astype(jnp.int16), ax
                                   ).astype(jnp.int32)
            else:
                ndk = jax.lax.psum(ndk_p, ax)
            return z_new3[None], nkw, ndk

        z, nkw, ndk = body(k_z, state.z, self.wb3, self.dla3, self.mk3,
                           self.wdc, self.winb, self.firstb, self.srcb,
                           self.dlb, self.windb, self.firstdb, self.row0,
                           self.wgf, self.dff, self.rowmask, theta_m,
                           phi_pad)
        # window space -> external type ids
        nkw = jnp.take(nkw, self._perm_dev, axis=0)
        # (4) phi — replicated draw from the assembled global counts
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask, state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                              iteration=state.iteration + 1)

    # ------------------------------------------------------------------
    def _init_state(self, key: jax.Array) -> LDAState:
        cfg = self.config
        K = cfg.topics
        k_z, k_phi, k_theta, k_next = jax.random.split(key, 4)
        S = self.mesh.devices.size
        z = jax.random.randint(k_z, (S, self._nba, cfg.token_block), 0, K,
                               jnp.int32)
        z = jnp.where(self.mk3, z, 0)
        z = jax.device_put(z, NamedSharding(self.mesh, P(self.axis, None,
                                                         None)))
        nkw, ndk = self._count_all(z)
        alpha = self._alpha_vector()
        beta = jnp.float32(cfg.beta)
        phi = self._sample_phi(k_phi, nkw, beta, None, None)
        theta = rnd.dirichlet(k_theta, ndk.astype(jnp.float32) + alpha)
        return LDAState(key=k_next, z=z, ndk=ndk, nkw=nkw,
                        nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                        alpha=alpha, beta=beta, iteration=jnp.int32(0))

    def _count_all(self, z):
        """Global (nkw [V,K], ndk [D,K]) from sharded z (init/setZ path)."""
        K = self.config.topics
        D, V = self.corpus.num_docs, self.corpus.num_types
        vpadg = self._vpad_global
        ax = self.axis
        pe = partial(P, ax)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(pe(None), pe(None), pe(None), pe(None)),
                 out_specs=(P(), P()), check_vma=False)
        def cnt(zf, wg, df, mkf):
            ones = jnp.where(mkf[0], 1, 0)
            nkw_g = jnp.zeros((vpadg, K), jnp.int32).at[
                wg[0], zf[0]].add(ones)
            ndk_p = jnp.zeros((D, K), jnp.int32).at[df[0], zf[0]].add(ones)
            return jax.lax.psum(nkw_g, ax)[:V], jax.lax.psum(ndk_p, ax)

        S = self.mesh.devices.size
        zf = z.reshape(S, -1)
        nkw_p, ndk = cnt(zf, self.wgf, self.dff,
                         self.mk3.reshape(S, -1))
        return jnp.take(nkw_p, self._perm_dev, axis=0), ndk

    # ------------------------------------------------------------------
    # z accessors (global token order via per-shard flat_index)
    # ------------------------------------------------------------------
    def get_z_indicators(self) -> np.ndarray:
        z = np.asarray(self.state.z).reshape(
            self._flat_index.shape[0], -1)
        idx = self._flat_index.reshape(z.shape[0], -1)
        out = np.zeros(self.corpus.num_tokens, np.int32)
        for s in range(z.shape[0]):
            valid = idx[s] >= 0
            out[idx[s][valid]] = z[s][valid]
        return out

    def set_z_indicators(self, z_flat):
        z_flat = np.asarray(z_flat, np.int32)
        S = self._flat_index.shape[0]
        z = np.zeros((S, self._nba, self.config.token_block), np.int32)
        fi = self._flat_index
        valid = fi >= 0
        z.reshape(S, -1)[valid.reshape(S, -1)] = z_flat[
            fi[valid]]
        st = self.state
        z = jax.device_put(jnp.asarray(z), NamedSharding(
            self.mesh, P(self.axis, None, None)))
        nkw, ndk = self._count_all(z)
        key, k_phi = jax.random.split(st.key)
        phi = self._sample_phi(k_phi, nkw, st.beta, None, None)
        self.state = st._replace(key=key, z=z, ndk=ndk, nkw=nkw,
                                 nk=jnp.sum(nkw, axis=0), phi=phi)
