"""The BASELINE.md measurement matrix, self-measured.

Runs the five configurations from BASELINE.json on whatever hardware is
present (items needing a multi-chip mesh use the 8-virtual-device CPU mesh
when only one TPU chip is available; the driver's headline single-chip
number comes from bench.py) and writes one JSON report.

Usage:  python benchmarks/matrix.py [--out BENCH_MATRIX.json] [--quick]
"""

from __future__ import annotations

import argparse
import contextlib
import json
import time
import traceback

import numpy as np


def _save(report, out):
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


@contextlib.contextmanager
def row_guard(report, out, *keys):
    """Failure isolation + incremental persistence: one row's crash
    (e.g. a compile-time VMEM OOM) records an `error` entry for its keys
    and the rows measured so far are already on disk — a partial run can
    never lose completed measurements again (round-3 lesson: the
    K=4096 spalias OOM aborted the whole matrix and the end-of-run-only
    save dropped every fresh row)."""
    try:
        yield
    except Exception as e:  # noqa: BLE001 — any row failure is recorded
        traceback.print_exc()
        for k in keys:
            report["results"][k] = {"error": repr(e)[:400]}
    _save(report, out)


def _multi_step(model, n):
    """Scan `n` full-sweep iterations into one dispatch (no donation)."""
    import jax
    import jax.numpy as jnp
    doc_mask = jnp.ones((model.corpus.num_docs,), bool)

    def run(state):
        def body(st, _):
            return model._step(st, doc_mask, None), None
        return jax.lax.scan(body, state, None, length=n)[0]
    jitted = jax.jit(model._with_rebound(run), donate_argnums=(1,))
    return lambda state: jitted(model._device_arrays(), state)


def _throughput(model, corpus, iters=10):
    """Per-iteration time by iteration-count subtraction: scan(3n) - scan(n),
    best of 3 each, scalar readback to force completion. Removes the fixed
    dispatch latency of the axon tunnel that otherwise dominates small steps.
    """
    import jax.numpy as jnp

    import jax

    def timed(n):
        run = _multi_step(model, n)
        st = run(jax.tree.map(jnp.copy, model.state))
        _ = float(jnp.sum(st.nk))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st = run(st)
            _ = float(jnp.sum(st.nk))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(3 * iters) - timed(iters)) / (2 * iters)
    return corpus.num_tokens / dt


def synth_20ng(v=20000, d=11269, mean_len=120, seed=0):
    import bench
    return bench.synth_corpus(seed)


def synth_sized(d, v, mean_len, seed=0):
    """Zipf corpus at arbitrary scale (same recipe as bench.synth_corpus)."""
    from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
    rng = np.random.default_rng(seed)
    lengths = np.maximum(5, rng.poisson(mean_len, d)).astype(np.int64)
    n = int(lengths.sum())
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()
    tokens = rng.choice(v, size=n, p=probs).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    return Corpus(tokens=tokens, doc_offsets=offsets,
                  vocab=[f"w{i}" for i in range(v)])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_MATRIX.json")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip_nyt", action="store_true")
    ap.add_argument("--only", default="",
                    help="comma-separated result-key prefixes to run; "
                         "other items keep their previous value from --out")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp  # noqa: F401

    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.corpus import load_dataset
    from ldagroupedgibbssampler_tpu.models.registry import create_model

    import os
    prev = {}
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f).get("results", {})
    wanted = [w for w in args.only.split(",") if w]

    def want(key):
        return not wanted or any(key.startswith(w) for w in wanted)

    report = {"platform": str(jax.devices()[0]),
              "num_devices": jax.device_count(), "results": dict(prev)}
    iters = 3 if args.quick else 10

    # 1. CGS on cats (the plda-cats-test.cfg settings) — correctness oracle
    need_cats = want("1_cgs_cats") or want("3b_ggs_vs_cgs_ll_cats")
    cats = None if not need_cats else load_dataset(
        "/root/reference/src/main/resources/datasets/cats.txt",
        stoplist_path=None, rare_threshold=0)
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    import contextlib
    _cpus = jax.devices("cpu") if jax.default_backend() != "cpu" else []

    def cgs_ctx():
        return (jax.default_device(_cpus[0]) if _cpus
                else contextlib.nullcontext())

    m1 = None
    if need_cats:
        cfg1 = LDAConfig(scheme="collapsed", topics=3, alpha=5.0, beta=7.0,
                         seed=2019, exec_time=-1)
        # the CGS oracle is a SERIAL per-token lax.scan chain: on TPU each
        # tiny scan step pays on-chip sequencing overhead (~1k tokens/s),
        # while the host CPU runs the same chain at ~5-6M tokens/s. Pin
        # the oracle to the host backend — it is a correctness yardstick,
        # not a TPU perf item — and record the device in the row.
        with cgs_ctx():
            m1 = create_model(cfg1)
            m1.add_instances(cats)
            m1.sample(2)  # warmup: compile the serial scan before timing
            t0 = time.perf_counter()
            m1.sample(20)
            dt = (time.perf_counter() - t0) / 20
            ll_cgs = float(model_log_likelihood(
                m1.state.ndk, m1._nkw_kv(), m1.get_alpha(), m1.get_beta()))
        if want("1_cgs_cats"):
            report["results"]["1_cgs_cats"] = {
                "tokens_per_sec": round(cats.num_tokens / dt, 1),
                "device": "host-cpu" if _cpus else "default",
                "model_ll": round(ll_cgs, 1)}

    corpus = synth_20ng()

    # 2. PCGS on 20NG-scale, K=20
    m2 = None
    if want("2_pcgs_20ng_k20"):
        with row_guard(report, args.out, "2_pcgs_20ng_k20"):
            cfg2 = LDAConfig(scheme="pcgs", topics=20, alpha=0.5, beta=0.01,
                             seed=2019, exec_time=-1)
            m2 = create_model(cfg2)
            m2.add_instances(corpus)
            report["results"]["2_pcgs_20ng_k20"] = {
                "tokens_per_sec": round(_throughput(m2, corpus, iters), 1)}

    # 3. GGS on 20NG-scale, K=100 (the headline; bench.py measures the
    #    fused multi-iteration variant)
    m3 = None
    if want("3_ggs_20ng_k100"):
        with row_guard(report, args.out, "3_ggs_20ng_k100"):
            cfg3 = LDAConfig(scheme="ggs", topics=100, alpha=0.5, beta=0.01,
                             seed=2019, exec_time=-1)
            m3 = create_model(cfg3)
            m3.add_instances(corpus)
            report["results"]["3_ggs_20ng_k100"] = {
                "tokens_per_sec": round(_throughput(m3, corpus, iters), 1)}

    # 3b. GGS quality: held-out LL parity vs the CGS oracle on cats
    mq = None
    if want("3b_ggs_vs_cgs_ll_cats"):
        with row_guard(report, args.out, "3b_ggs_vs_cgs_ll_cats"):
            cfgq = LDAConfig(scheme="ggs", topics=3, alpha=5.0, beta=7.0,
                             seed=2019, exec_time=-1)
            mq = create_model(cfgq)
            mq.add_instances(cats)
            mq.sample(100)
            ll_ggs = float(model_log_likelihood(mq.state.ndk, mq._nkw_kv(),
                                                mq.get_alpha(), mq.get_beta()))
            with cgs_ctx():
                m1.sample(80)   # bring the oracle to 100 iterations too
                ll_cgs100 = float(model_log_likelihood(
                    m1.state.ndk, m1._nkw_kv(), m1.get_alpha(), m1.get_beta()))
            report["results"]["3b_ggs_vs_cgs_ll_cats"] = {
                "ggs_ll": round(ll_ggs, 1), "cgs_ll": round(ll_cgs100, 1),
                "rel_gap": round(abs(ll_ggs - ll_cgs100) / abs(ll_cgs100), 4)}

    # 3e. Held-out LL parity (the BASELINE.json metric's second clause):
    #     train GGS and the CGS oracle on the same cats train split, score
    #     the held-out halves with the Wallach left-to-right estimator
    #     (MarginalProbEstimatorPlain.java:85) from each sampler's counts.
    if want("3e_heldout_ll_cats"):
        with row_guard(report, args.out, "3e_heldout_ll_cats"):
            from ldagroupedgibbssampler_tpu.corpus.perplexity import (
                build_perplexity_split)
            from ldagroupedgibbssampler_tpu.evaluation.marginal import (
                left_to_right_log_likelihood)
            cats_full = cats if cats is not None else load_dataset(
                "/root/reference/src/main/resources/datasets/cats.txt",
                stoplist_path=None, rare_threshold=0)
            train, _est, evl = build_perplexity_split(cats_full, 0.3, seed=2019)
            hlls = {}
            for scheme in ("ggs", "collapsed"):
                cfge = LDAConfig(scheme=scheme, topics=3, alpha=5.0, beta=7.0,
                                 seed=2019, exec_time=-1)
                ctx = cgs_ctx() if scheme == "collapsed" \
                    else contextlib.nullcontext()
                with ctx:
                    me = create_model(cfge)
                    me.add_instances(train)
                    me.sample(100)
                hlls[scheme] = left_to_right_log_likelihood(
                    2019, evl, None, me.get_alpha(), num_particles=100,
                    nkw=me._nkw_kv(), nk=me.state.nk, beta=me.get_beta())
                del me
            report["results"]["3e_heldout_ll_cats"] = {
                "ggs_held_out_ll": round(hlls["ggs"], 1),
                "cgs_held_out_ll": round(hlls["collapsed"], 1),
                "rel_gap": round(abs(hlls["ggs"] - hlls["collapsed"])
                                 / abs(hlls["collapsed"]), 4)}

    # 3f. Held-out LL parity AT THE METRIC'S OWN SCALE (round-3 VERDICT
    #     item 1): BASELINE.json's metric is "tokens/s/chip at 20NG K=100
    #     with held-out log-likelihood parity vs CGS" — rows 3/3e only
    #     ever evidenced the two clauses on DIFFERENT corpora (throughput
    #     at 20NG scale, parity on 23-doc cats). This row measures the
    #     quality clause on the same 20NG-scale corpus and K as the
    #     throughput clause: host-CGS oracle and >=3 GGS seeds trained on
    #     a shared train split, shared eval halves scored with the Wallach
    #     left-to-right estimator at a matched particle count
    #     (MarginalProbEstimatorPlain.java:85-125), the GGS seed spread
    #     reported as the Monte-Carlo error bar of the parity claim.
    if want("3f_heldout_ll_20ng_k100"):
        with row_guard(report, args.out, "3f_heldout_ll_20ng_k100"):
            from ldagroupedgibbssampler_tpu.corpus.perplexity import (
                build_perplexity_split)
            from ldagroupedgibbssampler_tpu.evaluation.marginal import (
                left_to_right_log_likelihood)
            train, _est, evl = build_perplexity_split(corpus, 0.1,
                                                      seed=2019)
            iters_f = 50 if args.quick else 200

            def heldout_3f(scheme, seed, ctx, eval_keys=(None,),
                           iters=None):
                cfgf = LDAConfig(scheme=scheme, topics=100, alpha=0.5,
                                 beta=0.01, seed=seed, exec_time=-1)
                with ctx:
                    mf = create_model(cfgf)
                    mf.add_instances(train)
                    mf.sample(iters or iters_f)
                    hlls = [left_to_right_log_likelihood(
                        seed if ek is None else ek, evl, None,
                        mf.get_alpha(), num_particles=100,
                        nkw=mf._nkw_kv(), nk=mf.state.nk,
                        beta=mf.get_beta()) for ek in eval_keys]
                del mf
                return hlls

            ggs_f = [heldout_3f("ggs", s, contextlib.nullcontext())[0]
                     for s in (2019, 2020, 2021)]
            # CGS oracle: two chain seeds (chain-to-chain spread on the
            # CGS side), the first scored under TWO estimator keys (the
            # left-to-right estimator's own Monte-Carlo noise), plus a
            # 2x-length chain (mixing/plateau check: the round-4 first
            # measurement put GGS ~98 nats ABOVE CGS at 200 iterations —
            # 0.02% relative — and the extension quantifies how much of
            # that is CGS still approaching its plateau)
            cgs_f, cgs_f2 = heldout_3f("collapsed", 2019, cgs_ctx(),
                                       eval_keys=(2019, 4242))
            cgs_s2 = heldout_3f("collapsed", 2020, cgs_ctx())[0]
            cgs_long = heldout_3f("collapsed", 2019, cgs_ctx(),
                                  iters=2 * iters_f)[0]
            gm = float(np.mean(ggs_f))
            spread = float(np.max(ggs_f) - np.min(ggs_f))
            est_noise = abs(cgs_f - cgs_f2)
            cgs_spread = abs(cgs_f - cgs_s2)
            cgs_mean = (cgs_f + cgs_s2) / 2
            gap = abs(gm - cgs_mean)
            # the CGS side's chain-to-chain sigma (~cgs_spread/1.13 for a
            # 2-sample range) dominates the uncertainty; the parity claim
            # is asserted at the 0.1%-relative level (10x tighter than
            # any plausible practical requirement) with the gap-vs-sigma
            # ratio recorded for the statistical reading
            sigma = max(cgs_spread / 1.128, est_noise, spread, 1e-9)
            report["results"]["3f_heldout_ll_20ng_k100"] = {
                "ggs_held_out_ll_mean": round(gm, 1),
                "ggs_held_out_ll_seeds": [round(g, 1) for g in ggs_f],
                "ggs_seed_spread": round(spread, 1),
                "cgs_held_out_ll": round(cgs_f, 1),
                "cgs_seed2_ll": round(cgs_s2, 1),
                "cgs_seed_spread": round(cgs_spread, 1),
                "cgs_eval_key2_ll": round(cgs_f2, 1),
                "cgs_2x_iters_ll": round(cgs_long, 1),
                "estimator_noise": round(est_noise, 1),
                "gap_nats": round(gap, 1),
                "gap_vs_chain_sigma": round(gap / sigma, 2),
                "rel_gap": round(gap / abs(cgs_mean), 5),
                "parity_at_0.1pct": bool(gap / abs(cgs_mean) <= 1e-3),
                "iterations": iters_f, "num_particles": 100}

    # 4 + 3c/3d. Sharded GGS / ADLDA / vocab-sharded GGS over the mesh
    if jax.device_count() >= 2 and (want("3c") or want("4_") or want("3d")
                                    or want("2c_sharded_pcgs")):
        from ldagroupedgibbssampler_tpu.parallel.mesh import make_mesh
        from ldagroupedgibbssampler_tpu.parallel.sharded_adlda import (
            ShardedADLDA)
        from ldagroupedgibbssampler_tpu.parallel.sharded_ggs import ShardedGGS
        mesh = make_mesh((jax.device_count(),), ("data",))
        small = synth_20ng(seed=1)
        cfg4 = LDAConfig(scheme="ggs", topics=20, alpha=0.5, beta=0.01,
                         seed=2019, exec_time=-1)
        if want("3c"):
            with row_guard(report, args.out, "3c_sharded_ggs"):
                ms = ShardedGGS(cfg4, mesh=mesh)
                ms.add_instances(small)
                report["results"]["3c_sharded_ggs"] = {
                    "devices": jax.device_count(),
                    "tokens_per_sec": round(_throughput(ms, small, iters), 1)}
        if want("4_"):
            with row_guard(report, args.out, "4_sharded_adlda"):
                ma = ShardedADLDA(cfg4.replace(scheme="adlda"), mesh=mesh)
                ma.add_instances(small)
                report["results"]["4_sharded_adlda"] = {
                    "devices": jax.device_count(),
                    "tokens_per_sec": round(_throughput(ma, small, iters), 1)}
        if want("3d"):
            with row_guard(report, args.out, "3d_vocab_sharded_ggs"):
                from ldagroupedgibbssampler_tpu.parallel.vocab_sharded_ggs \
                    import VocabShardedGGS
                mv = VocabShardedGGS(cfg4, mesh=mesh)
                mv.add_instances(small)
                report["results"]["3d_vocab_sharded_ggs"] = {
                    "devices": jax.device_count(),
                    "tokens_per_sec": round(_throughput(mv, small, iters), 1)}
        if want("2c_sharded_pcgs"):
            with row_guard(report, args.out, "2c_sharded_pcgs"):
                from ldagroupedgibbssampler_tpu.parallel.sharded_pcgs import (
                    ShardedPCGS)
                mp = ShardedPCGS(cfg4.replace(scheme="pcgs"), mesh=mesh)
                mp.add_instances(small)
                report["results"]["2c_sharded_pcgs"] = {
                    "devices": jax.device_count(),
                    "tokens_per_sec": round(_throughput(mp, small, iters), 1)}

    # 5. GGS at K=1000 (large-K dense path)
    m5 = None
    if want("5_ggs_20ng_k1000"):
        with row_guard(report, args.out, "5_ggs_20ng_k1000"):
            cfg5 = LDAConfig(scheme="ggs", topics=1000, alpha=0.05, beta=0.01,
                             seed=2019, exec_time=-1)
            m5 = create_model(cfg5)
            m5.add_instances(corpus)
            report["results"]["5_ggs_20ng_k1000"] = {
                "tokens_per_sec": round(_throughput(m5, corpus,
                                                    max(3, iters // 2)), 1)}

    # 5b. GGS at K=4096 (VERDICT item 6: prove the large-K story past
    #     K=1000). The streamed dense kernel's cost model is linear in K
    #     (one bf16 [token, K] score matmul per vocab window); this row
    #     measures where the dense path lands at the reference alias
    #     machinery's target regime. alpha scaled as 50/K like the other
    #     large-K rows.
    if want("5b_ggs_20ng_k4096"):
        with row_guard(report, args.out, "5b_ggs_20ng_k4096"):
            cfg5b = LDAConfig(scheme="ggs", topics=4096, alpha=50.0 / 4096,
                              beta=0.01, seed=2019, exec_time=-1)
            m5b = create_model(cfg5b)
            m5b.add_instances(corpus)
            report["results"]["5b_ggs_20ng_k4096"] = {
                "tokens_per_sec": round(_throughput(m5b, corpus, 3), 1),
                "stream_theta": bool(m5b._use_fused_zdraw()
                                     and m5b._zdraw_stream_theta())}
            del m5b

    # 7/8/9. other sampler families at 20NG scale (single chip);
    # lightpclda at K=1000 documents the O(1)-per-token MH scaling (1.6x
    # cost for 10x K) even though dense GGS still wins in absolute terms
    # 9c/7d (round-2 VERDICT item 4): the MH / alias families measured
    # PAST the claimed K~1000 dense-GGS crossover, so PERF.md's "MH family
    # wins past it" is a measured statement, not an extrapolation.
    for key, scheme, kk in (("7_spalias_20ng_k100", "spalias", 100),
                            ("8_adlda_20ng_k100", "adlda", 100),
                            ("9_lightpclda_20ng_k1000", "lightpclda",
                             1000),
                            ("9b_lightpclda_20ng_k100", "lightpclda",
                             100),
                            ("9c_lightpclda_20ng_k4096", "lightpclda",
                             4096),
                            ("7d_spalias_20ng_k4096", "spalias", 4096),
                            # 8d: the COLLAPSED (live-count ADLDA) variant
                            # of the K-tiled streamed chunk body, measured
                            # at the same K=4096 regime as 7d
                            ("8d_adlda_20ng_k4096", "adlda", 4096)):
        if want(key):
            with row_guard(report, args.out, key):
                cfgx = LDAConfig(scheme=scheme, topics=kk,
                                 alpha=0.5 if kk <= 100 else 50.0 / kk,
                                 beta=0.01, seed=2019, exec_time=-1)
                mx = create_model(cfgx)
                mx.add_instances(corpus)
                report["results"][key] = {
                    "tokens_per_sec": round(
                        _throughput(mx, corpus, max(3, iters // 2)), 1),
                    "fused_mode": (getattr(mx, "_fused_mode",
                                           lambda: None)() or "xla")}
                del mx

    # 7e. The SUBLINEAR large-K draw (round-3 VERDICT item 2): scheme
    #     ggs_aliasmh — O(1)-per-token alias-MH z-steps on the grouped
    #     target (models/ggs_aliasmh.py). Measures throughput at the
    #     alias machinery's target regime (K=4096, where the dense
    #     kernels' Θ(K) work caps spalias at ~3.5M and dense GGS at
    #     ~8.1M tok/s) plus K=1000 (dense-GGS crossover context), and a
    #     model-LL trajectory comparison vs dense GGS at K=4096 so the
    #     speed claim carries its mixing cost.
    if want("7e_ggs_aliasmh_20ng_k4096"):
        with row_guard(report, args.out, "7e_ggs_aliasmh_20ng_k4096"):
            from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
                model_log_likelihood as _mll7e)
            cfg7e = LDAConfig(scheme="ggs_aliasmh", topics=4096,
                              alpha=50.0 / 4096, beta=0.01, seed=2019,
                              exec_time=-1, aliasmh_rounds=1)
            m7e = create_model(cfg7e)
            m7e.add_instances(corpus)
            tps1 = round(_throughput(m7e, corpus, 3), 1)
            m7e.sample(60)
            ll_mh = float(_mll7e(m7e.state.ndk, m7e._nkw_kv(),
                                 m7e.get_alpha(), m7e.get_beta()))
            m7e.sample(140)    # to 200 its (NOT a plateau: see LARGEK_QUALITY.json)
            ll_mh200 = float(_mll7e(m7e.state.ndk, m7e._nkw_kv(),
                                    m7e.get_alpha(), m7e.get_beta()))
            del m7e
            m7e2 = create_model(cfg7e.replace(aliasmh_rounds=2))
            m7e2.add_instances(corpus)
            tps2 = round(_throughput(m7e2, corpus, 3), 1)
            del m7e2
            m7k = create_model(cfg7e.replace(topics=1000, alpha=0.05))
            m7k.add_instances(corpus)
            tps1k = round(_throughput(m7k, corpus, 3), 1)
            del m7k
            mgg = create_model(cfg7e.replace(scheme="ggs"))
            mgg.add_instances(corpus)
            mgg.sample(60)
            ll_gg = float(_mll7e(mgg.state.ndk, mgg._nkw_kv(),
                                 mgg.get_alpha(), mgg.get_beta()))
            mgg.sample(140)
            ll_gg200 = float(_mll7e(mgg.state.ndk, mgg._nkw_kv(),
                                    mgg.get_alpha(), mgg.get_beta()))
            del mgg
            report["results"]["7e_ggs_aliasmh_20ng_k4096"] = {
                "tokens_per_sec": tps1,
                "tokens_per_sec_rounds2": tps2,
                "tokens_per_sec_k1000": tps1k,
                "aliasmh_ll_60": round(ll_mh, 1),
                "dense_ggs_ll_60": round(ll_gg, 1),
                "ll_rel_gap_60": round(abs(ll_mh - ll_gg) / abs(ll_gg),
                                       4),
                "aliasmh_ll_200": round(ll_mh200, 1),
                "dense_ggs_ll_200": round(ll_gg200, 1),
                "ll_rel_gap_200": round(abs(ll_mh200 - ll_gg200)
                                        / abs(ll_gg200), 4)}

    # 7f. K=8192 end-to-end (round-4 VERDICT item 3): full iterations in
    #     the regime ggs_aliasmh uniquely owns, plus what the dense path
    #     actually does there (kpad-gated -> segmented XLA fallback).
    #     Each arm runs in a SUBPROCESS (benchmarks/k8192_row.py):
    #     round 4's in-process pair crashed the TPU worker under
    #     combined HBM high-water; isolation bounds each arm's footprint.
    if want("7f_ggs_aliasmh_20ng_k8192"):
        with row_guard(report, args.out, "7f_ggs_aliasmh_20ng_k8192"):
            import subprocess
            import sys as _sys
            import tempfile
            row7f = {}
            for arm in ("aliasmh", "dense"):
                with tempfile.NamedTemporaryFile(suffix=".json",
                                                 delete=False) as tf:
                    frag = tf.name
                r = subprocess.run(
                    [_sys.executable, "benchmarks/k8192_row.py",
                     "--arm", arm, "--out", frag],
                    capture_output=True, text=True, timeout=4800)
                if r.returncode != 0:
                    row7f[arm + "_error"] = (r.stderr or r.stdout)[-400:]
                else:
                    with open(frag) as f:
                        row7f.update(json.load(f))
            assert "tokens_per_sec" in row7f, row7f
            report["results"]["7f_ggs_aliasmh_20ng_k8192"] = row7f

    # 8c. ADLDA staleness-contract check at realistic K/V (round-1 weak
    #     item 6): the sweep-stale fused ADLDA's model-LL trajectory must
    #     track the PCGS chain at 20NG scale K=100 — the same "one sweep
    #     of staleness" approximation family as ADLDA.java:176-332, here
    #     measured rather than argued at toy scale.
    if want("8c_adlda_vs_pcgs_ll_20ng"):
        with row_guard(report, args.out, "8c_adlda_vs_pcgs_ll_20ng"):
            from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
                model_log_likelihood as _mll)
            lls, lls60 = {}, {}
            for scheme in ("adlda", "pcgs"):
                cfg8c = LDAConfig(scheme=scheme, topics=100, alpha=0.5,
                                  beta=0.01, seed=2019, exec_time=-1,
                                  topic_interval=0)
                m8c = create_model(cfg8c)
                m8c.add_instances(corpus)
                m8c.sample(60)
                lls60[scheme] = float(_mll(m8c.state.ndk, m8c._nkw_kv(),
                                           m8c.get_alpha(), m8c.get_beta()))
                m8c.sample(140)      # to 200 iterations — both plateau
                lls[scheme] = float(_mll(m8c.state.ndk, m8c._nkw_kv(),
                                         m8c.get_alpha(), m8c.get_beta()))
                del m8c
            report["results"]["8c_adlda_vs_pcgs_ll_20ng"] = {
                "adlda_ll_200": round(lls["adlda"], 1),
                "pcgs_ll_200": round(lls["pcgs"], 1),
                "rel_gap_200": round(abs(lls["adlda"] - lls["pcgs"])
                                     / abs(lls["pcgs"]), 4),
                "adlda_ll_60": round(lls60["adlda"], 1),
                "pcgs_ll_60": round(lls60["pcgs"], 1),
                "rel_gap_60": round(abs(lls60["adlda"] - lls60["pcgs"])
                                    / abs(lls60["pcgs"]), 4)}

    # 10. HDP (Poisson Polya-Urn, full K_max array) at 20NG scale: the
    #     nonparametric family's throughput + how many topics stay active
    if want("10_ppu_hdplda_20ng"):
        with row_guard(report, args.out, "10_ppu_hdplda_20ng"):
            cfgh = LDAConfig(scheme="ppu_hdplda", topics=100, alpha=0.5,
                             beta=0.01, seed=2019, exec_time=-1)
            mh = create_model(cfgh)
            mh.add_instances(corpus)
            tps = round(_throughput(mh, corpus, max(3, iters // 2)), 1)
            mh.sample(20)
            active = int(np.sum(np.asarray(mh.state.nk) > 0))
            report["results"]["10_ppu_hdplda_20ng"] = {
                "tokens_per_sec": tps, "active_topics_after_20": active}
            del mh

    # 7c. spalias at K=1000 — the regime the reference's alias tables
    #     target; the fused sweep runs HBM-STREAMED here (the n_dk table
    #     exceeds the VMEM budget at kpad=1024).
    if want("7c_spalias_20ng_k1000"):
        with row_guard(report, args.out, "7c_spalias_20ng_k1000"):
            cfg7c = LDAConfig(scheme="spalias", topics=1000, alpha=0.05,
                              beta=0.01, seed=2019, exec_time=-1)
            m7c = create_model(cfg7c)
            m7c.add_instances(corpus)
            report["results"]["7c_spalias_20ng_k1000"] = {
                "tokens_per_sec": round(_throughput(m7c, corpus,
                                                    max(3, iters // 2)), 1),
                "fused_mode": m7c._fused_mode() or "xla"}
            del m7c

    # 6. NYTimes-scale GGS (D=300k, V=102,660, N≈100M — the UCI stats the
    #    reference quotes in datasets/README.txt): production-scale run on
    #    one chip via the HBM-streamed theta kernel. doc_span=1024 keeps
    #    (w-window, d-window) cell padding low at this document count.
    if (not args.skip_nyt and jax.default_backend() == "tpu"
            and want("6_ggs_nyt_k100")):
        with row_guard(report, args.out, "6_ggs_nyt_k100"):
            del m2, m3, m5, mq
            nyt = synth_sized(d=300_000, v=102_660, mean_len=333, seed=2)
            cfg6 = LDAConfig(scheme="ggs", topics=100, alpha=0.5, beta=0.01,
                             seed=2019, exec_time=-1, doc_span=1024)
            m6 = create_model(cfg6)
            m6.add_instances(nyt)
            report["results"]["6_ggs_nyt_k100"] = {
                "num_tokens": nyt.num_tokens,
                "tokens_per_sec": round(_throughput(m6, nyt, 3), 1)}

    # 2d. NYTimes-scale PCGS: per-document sequential updates at 100M
    #     tokens on one chip — only possible via the HBM-streamed fused
    #     sweep (n_dk table ~163 MB, HBM-resident).
    if (not args.skip_nyt and jax.default_backend() == "tpu"
            and want("2d_pcgs_nyt_k100")):
        with row_guard(report, args.out, "2d_pcgs_nyt_k100"):
            nyt2 = synth_sized(d=300_000, v=102_660, mean_len=333, seed=2)
            cfg2d = LDAConfig(scheme="pcgs", topics=100, alpha=0.5, beta=0.01,
                              seed=2019, exec_time=-1)
            m2d = create_model(cfg2d)
            m2d.add_instances(nyt2)
            report["results"]["2d_pcgs_nyt_k100"] = {
                "num_tokens": nyt2.num_tokens,
                "fused_mode": m2d._fused_mode() or "xla",
                "tokens_per_sec": round(_throughput(m2d, nyt2, 3), 1)}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
