"""One arm of BENCH_MATRIX row 7f (K=8192 end-to-end — round-4 VERDICT
item 3): the regime `ggs_aliasmh` is claimed to uniquely own, measured
with full iterations rather than the round-4 sweep-only probe.

Run per-arm in a SEPARATE process (benchmarks/matrix.py spawns this):
round 4's in-process dense+aliasmh K=8192 pair crashed the TPU worker
under combined HBM high-water; isolating the arms bounds each process's
footprint (~7 GB aliasmh, ~5 GB dense-fallback, v5e 16 GB).

Arms:
  --arm aliasmh  scheme ggs_aliasmh, K=8192, alpha=50/K: full-iteration
      throughput, the z-side vs theta/phi-Dirichlet split (the round-4
      probe claimed the Dirichlet draws dominate here; that was a
      threefry-key timing artifact — with the chain's rbg keys the
      split of record is ~22% Dirichlet / ~78% z side, row 7f), and
      the 60/200-iteration model-LL trajectory sanity.
  --arm dense    scheme ggs, K=8192: the dense path past its
      _FUSED_ZDRAW_KPAD_MAX=4096 gate — records which mode actually ran
      (expected: the segmented XLA fallback) and its throughput, i.e.
      what a user gets if they ignore the crossover guidance.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         python benchmarks/k8192_row.py --arm aliasmh --out frag.json
"""

from __future__ import annotations

import argparse
import json
import time

K = 8192
ALPHA = 50.0 / K


def _throughput(model, corpus, iters=3):
    import jax
    import jax.numpy as jnp

    def timed(n):
        run = model._multi_step_fn(n)
        st = run(jax.tree.map(jnp.copy, model.state))
        _ = float(jnp.sum(st.nk))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st = run(jax.tree.map(jnp.copy, model.state))
            _ = float(jnp.sum(st.nk))
            best = min(best, time.perf_counter() - t0)
        return best
    t3, t1 = timed(3 * iters), timed(iters)
    return corpus.num_tokens * 2 * iters / (t3 - t1)


def _dirichlet_only_ms(model, iters=6):
    """ms/iter of JUST the theta + phi Dirichlet draws (the non-z part
    of the aliasmh step), by the same 3n-n subtraction."""
    import jax
    import jax.numpy as jnp

    st = model.state

    # state arrays travel as ARGUMENTS — closing over them embeds them
    # as HLO constants and the remote-compile upload exceeds the
    # tunnel's request-size limit at K=8192 (HTTP 413)
    def run_keys(keys, state):
        def body(c, k):
            th = model._theta_update(k, state, None)
            ph = model._sample_phi(k, state.nkw, state.beta, None,
                                   state.phi)
            return c + th[0, 0] + ph[0, 0], None
        return jax.lax.scan(body, jnp.float32(0.0), keys)[0]

    f = jax.jit(run_keys)

    def timed(n):
        # the MODEL'S key impl (rbg), not the threefry default: with
        # threefry keys the RNG-bound gamma kernel measures ~2.5x slower
        # than the chain actually runs — the same measurement-bug class
        # as the historical phase_timing inflation (PERF.md "Gamma phase
        # at 3.7 ms" note). Caught round 5: the first 7f split recorded
        # 119.7 ms "Dirichlet" where the rbg chain really spends ~47 ms.
        ks = jax.random.split(
            jax.random.key(0, impl=model.config.prng_impl), n)
        _ = float(f(ks, st))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(ks, st))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(3 * iters) - timed(iters)) / (2 * iters) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["aliasmh", "dense"], required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    from ldagroupedgibbssampler_tpu.models.registry import create_model

    corpus = bench.synth_corpus(0)
    out = {}
    if args.arm == "aliasmh":
        cfg = LDAConfig(scheme="ggs_aliasmh", topics=K, alpha=ALPHA,
                        beta=0.01, seed=2019, exec_time=-1,
                        topic_interval=0, aliasmh_rounds=1)
        m = create_model(cfg)
        m.add_instances(corpus)
        tps = _throughput(m, corpus)
        dir_ms = _dirichlet_only_ms(m)
        iter_ms = corpus.num_tokens / tps * 1000.0
        m.sample(60)
        ll60 = float(model_log_likelihood(m.state.ndk, m._nkw_kv(),
                                          m.get_alpha(), m.get_beta()))
        m.sample(140)
        ll200 = float(model_log_likelihood(m.state.ndk, m._nkw_kv(),
                                           m.get_alpha(), m.get_beta()))
        out = {"tokens_per_sec": round(tps, 1),
               "iter_ms": round(iter_ms, 1),
               "dirichlet_ms": round(dir_ms, 1),
               "zsweep_ms": round(iter_ms - dir_ms, 1),
               "packed_tables": bool(m._mh_packed()),
               "aliasmh_ll_60": round(ll60, 1),
               "aliasmh_ll_200": round(ll200, 1)}
    else:
        cfg = LDAConfig(scheme="ggs", topics=K, alpha=ALPHA, beta=0.01,
                        seed=2019, exec_time=-1, topic_interval=0)
        m = create_model(cfg)
        m.add_instances(corpus)
        out = {"dense_mode": ("fused" if m._use_fused_zdraw()
                              else "xla_fallback"),
               "dense_tokens_per_sec": round(_throughput(m, corpus), 1)}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
