"""GGS-AliasMH — the sublinear large-K grouped sampler, scheme
`ggs_aliasmh`.

The TPU realization of the reference's alias-table performance layer
(SpaliasUncollapsedParallelLDA.java:39-115 + the LightLDA proposal
machinery, LightPCLDAtypeTopicProposal.java:23-53): at large K the dense
fused kernels pay Θ(K) MXU/VPU work per token, and the measured
practical ceiling of that path is ~8M tokens/s at K=4096 (BENCH_MATRIX
row 5b; PERF.md MFU table). This scheme replaces the exact K-wide
inverse-CDF z-draw of GGS with LightLDA-style Metropolis-Hastings
updates whose per-token cost is O(1) *in K*:

  target (the GGS conditional given this sweep's draws):
      p_t(k) ∝ theta[d_t, k] * phi[k, w_t]
  word step:  propose k* = z_entry[uniform token of type w_t] with
      prob n_w/(n_w + K*beta), else uniform — i.e. exactly
      q_w(k) = (N_kw^entry + beta) / (n_w + K*beta), the reference's
      count-based word proposal (LightPCLDAtypeTopicProposal.java:23-53)
  doc step:   propose k* = z_entry[uniform token of doc d_t] with prob
      L_d/(L_d + alpha_sum), else uniform — q_d(k) =
      (n_dk^entry + alpha_sum/K) / (L_d + alpha_sum). The fallback
      branch is uniform over K, so its per-topic density is
      alpha_sum/K regardless of the alpha vector — using that (not
      alpha_k) in the acceptance ratio keeps the MH step exact under
      ASYMMETRIC alpha too (learned via hyperopt), where the
      reference's LightPCLDA doc bucket instead draws the fallback
      proportional to alpha_k. Both are valid MH kernels for the same
      target; ours avoids a per-token alias draw over alpha.
      Locked by tests/test_geweke.py::test_geweke_ggs_aliasmh_asym_alpha.
  accept with min(1, p(k*) q(z) / (p(z) q(k*))) — a valid MH kernel per
  token; tokens are conditionally independent given (theta, phi) in the
  GROUPED sampler, so every token's chain runs fully in parallel as
  bulk XLA with no Pallas kernel and no sequential constraint. That
  grouping is what makes the alias idea finally TPU-viable: the PCGS
  family's live n_dk would force in-kernel scalar gathers (measured
  dead end, PERF.md "Sublinear large-K draw").

Each density/target evaluation costs ONE 8-byte row gather from packed
[.,2] tables ((phi,N_kw) by w*K+k and (theta,n_dk) by d*K+k) — 7
gathers/token/round, near the floor for a valid MH on this target.
Measured (benchmarks/alias_mh_probe.py + BENCH_MATRIX rows 7e/7f,
v5e-1, 20NG shapes): the sweep runs ~15M tokens/s *independent of K*
(K=1000..16384); full iterations at K=4096: 7.53M tok/s (1 round-pair)
— 2.15x the dense spalias row (3.52M), just under dense GGS (8.1M).
THE CROSSOVER OF RECORD IS K=8192: at K <= 4096 the dense fused
kernels win on throughput AND on held-out quality (the model-LL lead
this scheme shows at K=4096 is transient concentration, not predictive
quality — dense GGS is 426 nats / 4.8 sigma BETTER held-out at matched
iterations and protocol; PERF.md "Large-K quality resolution",
LARGEK_QUALITY.json). From K=8192 the dense kernels no longer compile
(kpad gate), the segmented XLA fallback measures 0.41M tok/s vs this
scheme's 6.41M (15.5x), and this scheme is the recommended z-step, with
the theta/phi Dirichlet draws at ~22% of the 211.0 ms iteration and
the MH-gather/packing/count side at ~78% (row 7f, rbg-key timings;
counts rebuilt by canonical-token scatter in this regime — see _step).

Chain validity: each sweep is [theta | n_d] exact, [z | theta, phi] one
or more MH rounds leaving p(z|theta,phi,w) invariant, [phi | z] exact —
the composition targets the same joint as GGS; the MH z-step is a
weaker per-sweep kernel than the exact draw (`aliasmh_rounds` trades
throughput for per-sweep mixing; the reference's LightLDA uses the same
economy), though its transient DYNAMICS concentrate model LL faster —
without better held-out quality (PERF.md "Large-K quality resolution").
Geweke-validated in tests/test_geweke.py::test_geweke_ggs_aliasmh and
(asymmetric alpha + negative control)
test_geweke_ggs_aliasmh_asym_alpha.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler

_TINY = 1e-38

# "auto" packing budget: extra device bytes the packed [.,2] f32 tables
# may cost (8*(V*K + D*K)) before the scheme switches to unpacked
# gathers straight out of state.phi/theta/nkw/ndk (zero extra memory,
# one more gather per density eval). 4 GiB keeps 20NG-scale K=8192
# (~2.05 GB extra) on the measured-faster packed path; at D=1M,
# K=8192 the packed tables alone would be ~73 GB — far past HBM —
# and the gate flips to unpacked.
_ALIASMH_PACK_BYTES = 4 << 30


def alias_mh_rounds(key, z, gather_w, gather_d, upd_ok,
                    p_tok_w, p_tok_d, pick_doc, pick_ty,
                    doc_len_tok, ty_cnt_tok, num_topics, rounds):
    """`rounds` alternating word/doc MH rounds over all tokens at once.

    z: int32 [S] current assignments over (padded) token slots.
    gather_w(k) -> (phi[k, w_t], qw(k)) and gather_d(k) ->
        (theta[d_t, k], qd(k)): per-slot density gathers at topic k —
        qw(k) = N_kw^entry + beta, qd(k) = n_dk^entry + alpha_sum/K
        (the unnormalised proposal densities; per-token normalisers
        cancel in the ratio). One packed 8-byte row gather each in the
        packed layout, two 4-byte gathers in the unpacked one.
    upd_ok: bool [S] — padding slots and random-scan-unselected docs
        keep z (their chains simply don't move this sweep).
    p_tok_w/p_tok_d: per-slot mixture probabilities n_w/(n_w+K beta) and
        L_d/(L_d+alpha_sum).
    pick_doc(r)/pick_ty(r): map a uniform in-doc / in-type rank to
        that token's SWEEP-ENTRY topic (closures over z_entry hoisted
        into doc-order / type-order once per sweep — one gather per
        pick).
    Returns (z', (acc_w, acc_d) mean acceptance rates per round).
    """
    n = z.shape[0]

    # current-point target and proposal densities, CARRIED across steps
    # so only the proposed point costs gathers
    ph0, qw_cur = gather_w(z)
    th0, qd_cur = gather_d(z)
    t_cur = th0 * ph0
    # in-type/in-doc positions are exact integer draws (randint with
    # per-token bounds) — a scaled-f32-uniform cast can't represent all
    # positions once a type's count exceeds 2^24, biasing the entry pick
    ty_hi = jnp.maximum(ty_cnt_tok, 1)
    doc_hi = jnp.maximum(doc_len_tok, 1)

    def one_round(carry, kr):
        zz, t_c, qw_c, qd_c = carry
        ks = jax.random.split(kr, 8)
        # ---- word step
        pos = jax.random.randint(ks[1], (n,), 0, ty_hi, jnp.int32)
        k_tok = pick_ty(pos)
        k_unif = jax.random.randint(ks[2], (n,), 0, num_topics, jnp.int32)
        kprop = jnp.where(jax.random.uniform(ks[0], (n,)) < p_tok_w,
                          k_tok, k_unif)
        phn, q_new = gather_w(kprop)
        thn, qdn = gather_d(kprop)
        t_new = thn * phn
        acc = upd_ok & ((jax.random.uniform(ks[3], (n,))
                         * jnp.maximum(t_c * q_new, _TINY))
                        < t_new * qw_c)
        zz = jnp.where(acc, kprop, zz)
        t_c = jnp.where(acc, t_new, t_c)
        qw_c = jnp.where(acc, q_new, qw_c)
        qd_c = jnp.where(acc, qdn, qd_c)
        # ---- doc step
        pos2 = jax.random.randint(ks[5], (n,), 0, doc_hi, jnp.int32)
        k_tok2 = pick_doc(pos2)
        k_unif2 = jax.random.randint(ks[6], (n,), 0, num_topics,
                                     jnp.int32)
        kprop2 = jnp.where(jax.random.uniform(ks[4], (n,)) < p_tok_d,
                           k_tok2, k_unif2)
        phn2, qwn2 = gather_w(kprop2)
        thn2, q2_new = gather_d(kprop2)
        t_new2 = thn2 * phn2
        acc2 = upd_ok & ((jax.random.uniform(ks[7], (n,))
                          * jnp.maximum(t_c * q2_new, _TINY))
                         < t_new2 * qd_c)
        zz = jnp.where(acc2, kprop2, zz)
        t_c = jnp.where(acc2, t_new2, t_c)
        qd_c = jnp.where(acc2, q2_new, qd_c)
        qw_c = jnp.where(acc2, qwn2, qw_c)
        sel = upd_ok.astype(jnp.float32)
        den = jnp.maximum(jnp.sum(sel), 1.0)
        return (zz, t_c, qw_c, qd_c), (
            jnp.sum(acc.astype(jnp.float32)) / den,
            jnp.sum(acc2.astype(jnp.float32)) / den)

    (z_out, *_), accs = jax.lax.scan(
        one_round, (z, t_cur, qw_cur, qd_cur),
        jax.random.split(key, rounds))
    return z_out, accs


class LDAGroupedGibbsSamplerAliasMH(LDAGroupedGibbsSampler):
    """GGS with the O(1)-per-token alias-MH z-step (module docstring)."""

    def _use_fused_zdraw(self) -> bool:
        # the MH step IS the z-draw; canonical token arrays and the
        # windowed count kernels do the rest
        return False

    def _needs_xla_zdraw_arrays(self) -> bool:
        # the segmented XLA z-draw never runs here — skip its ~8
        # bytes/slot flat (w, d) arrays (the CPU backend still gets df
        # for the n_dk scatter via the base-class gate)
        return False

    def _mh_packed(self) -> bool:
        mode = self.config.aliasmh_packed
        if mode in ("packed", "unpacked"):
            return mode == "packed"
        extra = 8 * self.config.topics * (self.corpus.num_types
                                          + self.corpus.num_docs)
        return extra <= _ALIASMH_PACK_BYTES

    def _prepare_device_data(self, corpus):
        super()._prepare_device_data(corpus)
        v = corpus.num_types
        tokens = corpus.tokens
        n = corpus.num_tokens
        # The MH rounds run over CANONICAL (doc-major, unpadded) token
        # arrays — at 128-wide windows the GGS block layout is ~2.2x
        # padded, and paying that on every gather measured the first
        # integration at 3.6M tok/s vs the probe's ~9M. Only the z
        # vector crosses the layout boundary: one gather in (slot of
        # canonical token), one gather out (canonical token of slot).
        fi = self._blocks.flat_index.reshape(-1)
        valid = fi >= 0
        inv = np.zeros(n, np.int64)
        inv[fi[valid]] = np.flatnonzero(valid)
        self._mh_slot_of_can = jnp.asarray(inv.astype(np.int32))
        self._mh_can_of_slot = jnp.asarray(
            np.maximum(fi, 0).astype(np.int32))
        lengths = np.diff(corpus.doc_offsets).astype(np.int64)
        ty_cnt = np.bincount(tokens, minlength=v).astype(np.int64)
        ty_off = np.concatenate([[0], np.cumsum(ty_cnt)[:-1]])
        self._mh_ty_perm = jnp.asarray(
            np.argsort(tokens, kind="stable").astype(np.int32))
        doc_ids = corpus.token_doc_ids()
        self._mh_w = jnp.asarray(tokens.astype(np.int32))
        self._mh_d = jnp.asarray(doc_ids.astype(np.int32))
        self._mh_doc_base = jnp.asarray(
            corpus.doc_offsets[:-1].astype(np.int64)[doc_ids]
            .astype(np.int32))
        self._mh_ty_base = jnp.asarray(ty_off[tokens].astype(np.int32))
        self._mh_doc_len = jnp.asarray(lengths[doc_ids].astype(np.int32))
        self._mh_ty_cnt = jnp.asarray(ty_cnt[tokens].astype(np.int32))

    def _step(self, state, doc_mask, type_mask):
        cfg = self.config
        K = cfg.topics
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)

        # (1) theta — unchanged GGS semantics
        theta = self._theta_update(k_theta, state, doc_mask)

        # (2) alias-MH z rounds (all tokens in parallel, bulk XLA, over
        # the canonical unpadded token axis). The doc proposal density
        # is n_dk + a_sum/K — the uniform fallback's true per-topic
        # mass for ANY alpha vector (advisor round-4 medium: using
        # alpha_k here silently de-targets the chain under hyperopt's
        # asymmetric alpha).
        a_sum = jnp.sum(state.alpha)
        au = a_sum / K
        wK = self._mh_w * K
        dK = self._mh_d * K
        if self._mh_packed():
            # packed [., 2] f32 rows: one 8-byte gather per density eval
            nkw_vk = state.nkw.astype(jnp.float32)         # [V, K]
            wk_pack = jnp.stack(
                [state.phi.reshape(-1), nkw_vk.reshape(-1) + state.beta],
                axis=1)
            dk_pack = jnp.stack(
                [theta.reshape(-1),
                 state.ndk.astype(jnp.float32).reshape(-1) + au], axis=1)

            def gather_w(k):
                r = wk_pack[wK + k]
                return r[:, 0], r[:, 1]

            def gather_d(k):
                r = dk_pack[dK + k]
                return r[:, 0], r[:, 1]
        else:
            # unpacked: gather straight out of the state arrays (int32
            # counts cast after the gather) — zero extra device memory,
            # for the D*K/V*K ranges where packing would not fit
            phi_f = state.phi.reshape(-1)
            nkw_f = state.nkw.reshape(-1)
            th_f = theta.reshape(-1)
            ndk_f = state.ndk.reshape(-1)

            def gather_w(k):
                i = wK + k
                return phi_f[i], nkw_f[i].astype(jnp.float32) + state.beta

            def gather_d(k):
                i = dK + k
                return th_f[i], ndk_f[i].astype(jnp.float32) + au
        upd_ok = (jnp.ones(self._mh_w.shape, bool) if doc_mask is None
                  else doc_mask[self._mh_d])
        kb = K * state.beta
        # f32 mixture weights: exact for counts < 2^24 (the entry-pick
        # positions themselves are exact randint draws; only these
        # scalar mixture probabilities round, by <6e-8 relative)
        ld = self._mh_doc_len.astype(jnp.float32)
        cw = self._mh_ty_cnt.astype(jnp.float32)
        z_can = state.z[self._mh_slot_of_can]
        # sweep-entry topic arrays hoisted into pick order: one gather
        # per pick inside the rounds
        z_entry_doc = z_can                       # canonical IS doc-major
        z_entry_ty = z_can[self._mh_ty_perm]
        z_can, _accs = alias_mh_rounds(
            k_z, z_can, gather_w, gather_d, upd_ok,
            cw / (cw + kb), ld / (ld + a_sum),
            lambda pos: z_entry_doc[self._mh_doc_base + pos],
            lambda pos: z_entry_ty[self._mh_ty_base + pos],
            self._mh_doc_len, self._mh_ty_cnt, K,
            max(1, cfg.aliasmh_rounds))
        z = jnp.where(self.mf, z_can[self._mh_can_of_slot], 0)

        # (3) counts. In the scheme's home regime (kpad > 4096, where
        # blocked_label_counts is gated off the Pallas kernel onto its
        # XLA scatter fallback) scatter from the CANONICAL token arrays
        # instead: the blocked layout is ~2.2x padded at vspan=128 and
        # scatter is per-update bound, so the canonical rebuild measures
        # 28.1 ms vs 63.0 for both tables at 20NG K=8192 (round 5; a
        # K-tiled Pallas count body was tried first and measured 32 ms
        # per table — MXU-roofline-bound, see PERF.md negative result).
        # At kpad <= 4096 the fused count kernels win; keep them.
        kpad = max(128, ((K + 127) // 128) * 128)
        if jax.default_backend() == "tpu" and kpad > 4096:
            nkw = jnp.zeros((self.corpus.num_types, K),
                            jnp.int32).at[self._mh_w, z_can].add(1)
            ndk = jnp.zeros((self.corpus.num_docs, K),
                            jnp.int32).at[self._mh_d, z_can].add(1)
        else:
            nkw = self._count_nkw(z)
            ndk = self._count_ndk(z)

        # (4) phi
        phi = self._sample_phi(k_phi, nkw, state.beta, type_mask,
                               state.phi)
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=0), phi=phi,
                              theta=theta,
                              iteration=state.iteration + 1)
