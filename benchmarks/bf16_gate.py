"""bf16 fast-path quality gate (VERDICT round-1 item 4).

The fused z-draw's default mode (`zdraw_precise=False`) scores tokens with
bf16 theta/phi window tables (ops/pallas_zdraw.py:35-40), perturbing each
per-token conditional by <= 2^-8 relative. This gate runs GGS at bench
scale (the bench.py synthetic 20NG, K=100) for 200 iterations in both
modes under a common seed and compares:

  1. model-LL trajectories (Dirichlet-multinomial joint LL every 20 its),
  2. the sorted tokens-per-topic profile (topic-size moments),
  3. held-out LL (Wallach left-to-right on a perplexity split).

Both chains are independent MCMC runs after the first draw, so agreement
is judged against the seed-to-seed Monte-Carlo spread: a third run with
the precise kernel under a different seed calibrates the natural
variation; the bf16-vs-precise deltas must sit within ~2x that spread.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bf16_gate.py
Writes BF16_GATE.json next to the repo's other bench artifacts.
"""

from __future__ import annotations

import json
import time

import numpy as np


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

    runs = {
        "bf16_seed0": run_chain(corpus, train, evl, precise=False, seed=0),
        "precise_seed0": run_chain(corpus, train, evl, precise=True,
                                   seed=0),
        "precise_seed1": run_chain(corpus, train, evl, precise=True,
                                   seed=1),
    }

    def final_ll(r):
        return r["ll_traj"][-1]

    mc_spread = abs(final_ll(runs["precise_seed0"])
                    - final_ll(runs["precise_seed1"]))
    bf16_delta = abs(final_ll(runs["bf16_seed0"])
                     - final_ll(runs["precise_seed0"]))
    hll_spread = abs(runs["precise_seed0"]["held_out_ll"]
                     - runs["precise_seed1"]["held_out_ll"])
    hll_delta = abs(runs["bf16_seed0"]["held_out_ll"]
                    - runs["precise_seed0"]["held_out_ll"])
    nk0 = np.asarray(runs["precise_seed0"]["nk_sorted_top20"])
    nk1 = np.asarray(runs["precise_seed1"]["nk_sorted_top20"])
    nkb = np.asarray(runs["bf16_seed0"]["nk_sorted_top20"])
    nk_spread = float(np.abs(nk0 - nk1).max() / nk0[0])
    nk_delta = float(np.abs(nkb - nk0).max() / nk0[0])

    report = {
        "runs": runs,
        "final_ll_delta_bf16_vs_precise": bf16_delta,
        "final_ll_mc_spread_precise_seeds": mc_spread,
        "held_out_delta_bf16_vs_precise": hll_delta,
        "held_out_mc_spread_precise_seeds": hll_spread,
        "sorted_nk_top20_rel_delta": nk_delta,
        "sorted_nk_top20_rel_mc_spread": nk_spread,
        # two seeds give a noisy spread estimate; floor the band at 0.1%
        # of |LL| so a freak tiny spread can't fail an acceptable delta
        "gate_pass": bool(
            bf16_delta <= max(2 * mc_spread,
                              1e-3 * abs(final_ll(runs["precise_seed0"])))
            and hll_delta <= max(
                2 * hll_spread,
                1e-3 * abs(runs["precise_seed0"]["held_out_ll"]))),
    }
    with open("BF16_GATE.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "runs"},
                     indent=2))


if __name__ == "__main__":
    main()
