"""Headline benchmark: GGS tokens sampled/sec/chip at 20NG-scale, K=100.

Matches the BASELINE.json driver metric ("tokens sampled/sec/chip at 20NG
K=100"). The real 20-Newsgroups file is stripped from the reference snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so the corpus is synthesised to 20NG
statistics: D=11,269 docs, V=20,000 types, mean doc length ~120 tokens
(N≈1.35M), Zipf-distributed types — same shapes, same memory/gather
behaviour.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor is
a generous estimate of the Java GGS sampler's throughput on a 16-core
workstation: dense K=100 inverse-CDF z-draws at ~1.2M tokens/s/core
(~200 cycles/token incl. RNG + atomic delta updates) × 16 threads ≈ 20M
tokens/s. vs_baseline = tokens_per_sec / 20e6, i.e. 1.0 == estimated Java
parity on ONE chip.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

JAVA_GGS_TOKENS_PER_SEC_ESTIMATE = 20e6

D, V, K = 11269, 20000, 100
MEAN_LEN = 120
ITERS_WARMUP, ITERS_MEASURED = 3, 10


def synth_corpus(seed=0):
    from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
    rng = np.random.default_rng(seed)
    lengths = np.maximum(5, rng.poisson(MEAN_LEN, D)).astype(np.int64)
    n = int(lengths.sum())
    # Zipf-ish type distribution over V types
    ranks = np.arange(1, V + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()
    tokens = rng.choice(V, size=n, p=probs).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    return Corpus(tokens=tokens, doc_offsets=offsets,
                  vocab=[f"w{i}" for i in range(V)])


def main():
    import jax
    # axon remote compiles are slow (minutes); persist compiled programs so
    # repeat bench runs skip straight to execution
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler

    corpus = synth_corpus()
    cfg = LDAConfig(scheme="ggs", topics=K, alpha=0.5, beta=0.01, seed=2019,
                    exec_time=-1)
    model = LDAGroupedGibbsSampler(cfg)
    model.add_instances(corpus)

    # Iteration-count subtraction: time a fused scan of 3n iterations minus
    # a scan of n (scalar readback forces completion — block_until_ready is
    # unreliable through the axon tunnel, and the subtraction removes the
    # fixed dispatch + readback latency that otherwise pollutes the number).
    import jax.numpy as jnp

    def reps(n, k):
        run = model._multi_step_fn(n)
        st = jax.tree.map(jnp.copy, model.state)
        st = run(st)                      # warmup (compile + execute)
        _ = float(jnp.sum(st.nk))
        out = []
        for _ in range(k):
            t0 = time.perf_counter()
            st = run(st)
            _ = float(jnp.sum(st.nk))
            out.append(time.perf_counter() - t0)
        return out

    # The NUMBER OF RECORD is computed from MEDIANS of >= 5 timed
    # repeats per arm: tokens / (median(t_3n) - median(t_n)).
    # (Round-4 VERDICT item 2: a best-of-3 through the axon tunnel is
    # not robust to the tunnel's occasional timing outlier — the
    # round-4 driver capture recorded a best 35% above its own median,
    # and a same-code rerun here showed a pairwise-estimate spread of
    # 54% driven by a single anomalous t_n repeat. Medians of the raw
    # times are immune to any 2-of-5 outliers.) best/spread over the
    # per-pair estimates are kept as diagnostic fields only.
    k = 5
    t3, t1 = reps(3 * ITERS_MEASURED, k), reps(ITERS_MEASURED, k)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    tokens_per_sec = (corpus.num_tokens * 2 * ITERS_MEASURED
                      / (med(t3) - med(t1)))
    tps = sorted(corpus.num_tokens * 2 * ITERS_MEASURED / (a - b)
                 for a, b in zip(t3, t1))
    spread_pct = 100.0 * (tps[-1] - tps[0]) / tps[-1]
    print(json.dumps({
        "metric": "GGS tokens sampled/sec/chip (synthetic 20NG, K=100)",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec
                             / JAVA_GGS_TOKENS_PER_SEC_ESTIMATE, 3),
        "best_pair": round(tps[-1], 1),
        "pair_spread_pct": round(spread_pct, 1),
    }))


if __name__ == "__main__":
    main()
