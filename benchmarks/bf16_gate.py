"""bf16 fast-path quality gate (VERDICT round-1 item 4; round-2 item 3
strengthened the criterion from a 2-seed "~2x spread" heuristic to a
proper predictive interval).

The fused z-draw's default mode (`zdraw_precise=False`) scores tokens with
bf16 theta/phi window tables (ops/pallas_zdraw.py:35-40), perturbing each
per-token conditional by <= 2^-8 relative. This gate runs GGS at bench
scale (the bench.py synthetic 20NG, K=100) for 200 iterations and
compares three statistics between the bf16 chain and an ensemble of
PRECISE chains under different seeds:

  1. final model LL (Dirichlet-multinomial joint LL after 200 its),
  2. the sorted tokens-per-topic profile (topic-size moments),
  3. held-out LL (Wallach left-to-right on a perplexity split).

Criterion: every chain is an independent MCMC run, so if the bf16
perturbation introduces no bias, the bf16 chain's statistics are
exchangeable with the precise seed ensemble. With n precise seeds
(mean m, sd s with ddof=1, df = n-1), the gate asserts each bf16
statistic lies inside the two-sided 99% PREDICTIVE interval

    |x_bf16 - m| <= t_{0.995, n-1} * s * sqrt(1 + 1/n)

— the interval a new PRECISE seed would fall in 99% of the time. If the
gate fails, flip the default to zdraw_precise=True.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bf16_gate.py
Writes BF16_GATE.json next to the repo's other bench artifacts.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_PRECISE_SEEDS = 6
# two-sided 99% Student-t quantile, df = N_PRECISE_SEEDS - 1 = 5
T_CRIT_995_DF5 = 4.032


def run_chain(corpus, train, evl, precise: bool, seed: int, iters=200,
              k=100, ll_every=20):
    import jax.numpy as jnp  # noqa: F401

    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    from ldagroupedgibbssampler_tpu.evaluation.marginal import (
        left_to_right_log_likelihood)
    from ldagroupedgibbssampler_tpu.models.registry import create_model

    cfg = LDAConfig(scheme="ggs", topics=k, alpha=0.5, beta=0.01,
                    seed=seed, exec_time=-1, topic_interval=0,
                    zdraw_precise=precise)
    model = create_model(cfg)
    model.add_instances(corpus)
    ll_traj = []
    t0 = time.time()
    for _ in range(iters // ll_every):
        model.sample(ll_every)
        ll_traj.append(float(model_log_likelihood(
            model.state.ndk, model._nkw_kv(), model.get_alpha(),
            model.get_beta())))
    elapsed = time.time() - t0
    nk_sorted = np.sort(np.asarray(model.state.nk))[::-1].astype(float)

    # held-out: fold a fresh model on the train split (same mode) and
    # score the evaluation halves
    mh = create_model(cfg)
    mh.add_instances(train)
    mh.sample(iters)
    hll = float(left_to_right_log_likelihood(
        seed, evl, None, mh.get_alpha(), num_particles=50,
        nkw=mh._nkw_kv(), nk=mh.state.nk, beta=mh.get_beta()))
    del model, mh
    return {"ll_traj": ll_traj, "nk_sorted_top20": nk_sorted[:20].tolist(),
            "nk_gini": float(np.abs(nk_sorted[:, None]
                                    - nk_sorted[None, :]).mean()
                             / (2 * nk_sorted.mean())),
            "held_out_ll": hll, "seconds": round(elapsed, 1)}


def predictive_check(bf16_value: float, precise_values) -> dict:
    """Two-sided 99% predictive-interval check of one scalar statistic
    against the precise seed ensemble (df = n - 1)."""
    pv = np.asarray(precise_values, float)
    n = len(pv)
    m, s = float(pv.mean()), float(pv.std(ddof=1))
    half_width = T_CRIT_995_DF5 * s * float(np.sqrt(1.0 + 1.0 / n))
    delta = float(abs(bf16_value - m))
    return {"bf16": bf16_value, "precise_mean": m, "precise_sd": s,
            "df": n - 1, "n_precise_seeds": n,
            "interval_half_width": half_width, "abs_delta": delta,
            "t_stat": delta / max(s * float(np.sqrt(1.0 + 1.0 / n)),
                                  1e-12),
            "pass": bool(delta <= half_width)}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from ldagroupedgibbssampler_tpu.corpus.perplexity import (
        build_perplexity_split)

    corpus = bench.synth_corpus(0)
    train, _est, evl = build_perplexity_split(corpus, 0.1, seed=2019)

    runs = {"bf16_seed0": run_chain(corpus, train, evl, precise=False,
                                    seed=0)}
    for seed in range(N_PRECISE_SEEDS):
        runs[f"precise_seed{seed}"] = run_chain(corpus, train, evl,
                                                precise=True, seed=seed)
    precise = [runs[f"precise_seed{s}"] for s in range(N_PRECISE_SEEDS)]
    bf16 = runs["bf16_seed0"]

    checks = {
        "final_model_ll": predictive_check(
            bf16["ll_traj"][-1], [r["ll_traj"][-1] for r in precise]),
        "held_out_ll": predictive_check(
            bf16["held_out_ll"], [r["held_out_ll"] for r in precise]),
        # topic-size profile scalar: Gini of the sorted nk (captures the
        # whole profile shape in one exchangeable statistic)
        "nk_gini": predictive_check(
            bf16["nk_gini"], [r["nk_gini"] for r in precise]),
    }

    report = {
        "criterion": ("each bf16 statistic inside the two-sided 99% "
                      "predictive interval of the precise seed ensemble: "
                      f"|x - mean| <= t(.995, df={N_PRECISE_SEEDS - 1}) "
                      f"* sd * sqrt(1 + 1/{N_PRECISE_SEEDS})"),
        "runs": runs,
        "checks": checks,
        "gate_pass": bool(all(c["pass"] for c in checks.values())),
    }
    with open("BF16_GATE.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "runs"},
                     indent=2))


if __name__ == "__main__":
    main()
