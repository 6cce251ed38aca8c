"""Large-K (K=4096) quality resolution — round-4 VERDICT items 1 & 2
(Missing #2): settle whether the 8.7% model-LL gap between dense GGS and
`ggs_aliasmh` at iteration 200 (BENCH_MATRIX row 7e) is (a) a large-K
sampling defect in the dense bf16/K-tiled path, or (b) an early-mixing
difference between two exact samplers of the same joint.

Three independent measurements, each sufficient to falsify (a):

A. `precise_gate_k4096` — the BF16_GATE criterion at the large-K dense
   path itself: dense GGS K=4096 on the fused bf16 kernel (the accused
   default) vs an ensemble of seeds on the SEGMENTED XLA z-draw — an
   entirely independent f32 implementation of the same draw
   (ggs.py `_step` XLA branch; `zdraw_kernel="xla"`) — 200 iterations,
   model-LL + topic-profile statistics inside the two-sided 99%
   predictive interval. This is a cross-IMPLEMENTATION check, stronger
   than precise-vs-bf16 on the same kernel: any fused-kernel large-K
   defect (bf16 tables, K-tiling, semaphores), not just rounding,
   would put the fused chain outside the XLA ensemble. (The fused
   kernel's own `zdraw_precise=True` mode does not compile at
   kpad=4096 — f32 tables double the scoped-VMEM footprint past the
   16M limit — which is itself recorded here; the XLA path is the
   precise reference at this K.)

B. `rounds_monotonicity_k4096` — the discriminating experiment: as
   `aliasmh_rounds` grows the MH z-step converges to the exact
   conditional draw, i.e. lim rounds->inf ggs_aliasmh == dense GGS
   *as a transition kernel*. If the 7e gap is MH-memory concentration
   (each token's chain starts at its previous topic, so few-round
   sweeps keep inter-sweep z memory that the memoryless exact draw
   does not have), LL-at-200 must move monotonically TOWARD the dense
   trajectory as rounds increases; if instead it stays put while
   rounds grows, the dense path is the outlier and suspect.

C. `plateau_k4096` — both schemes, 3 seeds each, run long (default
   3000 iterations) on the 90% train split; model-LL every 100
   iterations; held-out LL (Wallach left-to-right, matched particles
   and eval subset — the row-3g anchor the aliasmh scheme lacked) at
   the end. Exact samplers of one joint must agree at plateau within
   seed noise, whatever their early-iteration transients.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/largek_quality.py \
      [--sections A,B,C] [--iters-c 3000] [--out LARGEK_QUALITY.json]

Writes incrementally after every chain (a crashed run keeps its
completed chains).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

K = 4096
ALPHA = 50.0 / K
BETA = 0.01
N_PRECISE_SEEDS = 5
# two-sided 99% Student-t quantile, df = N_PRECISE_SEEDS - 1 = 4
T_CRIT_995_DF4 = 4.604


def _model_ll(m):
    from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
        model_log_likelihood)
    return float(model_log_likelihood(m.state.ndk, m._nkw_kv(),
                                      m.get_alpha(), m.get_beta()))


def _nk_gini(m):
    nk = np.sort(np.asarray(m.state.nk))[::-1].astype(float)
    return float(np.abs(nk[:, None] - nk[None, :]).mean()
                 / (2 * max(nk.mean(), 1e-9)))


def _make(scheme, seed, corpus, **kw):
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    cfg = LDAConfig(scheme=scheme, topics=K, alpha=ALPHA, beta=BETA,
                    seed=seed, exec_time=-1, topic_interval=0, **kw)
    m = create_model(cfg)
    m.add_instances(corpus)
    return m


class Report:
    def __init__(self, path):
        self.path = path
        self.data = {}
        if os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)

    def put(self, *keys_and_value):
        *keys, value = keys_and_value
        d = self.data
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = value
        with open(self.path, "w") as f:
            json.dump(self.data, f, indent=1)


def predictive_check(x, ensemble):
    pv = np.asarray(ensemble, float)
    n = len(pv)
    m, s = float(pv.mean()), float(pv.std(ddof=1))
    hw = T_CRIT_995_DF4 * s * float(np.sqrt(1.0 + 1.0 / n))
    return {"value": x, "precise_mean": m, "precise_sd": s, "n": n,
            "interval_half_width": hw, "abs_delta": float(abs(x - m)),
            "pass": bool(abs(x - m) <= hw)}


def run_traj(m, iters, every):
    """Sample `iters` iterations, recording model LL every `every`."""
    traj = {}
    t0 = time.time()
    done = 0
    while done < iters:
        step = min(every, iters - done)
        m.sample(step)
        done += step
        traj[str(done)] = _model_ll(m)
    return traj, round(time.time() - t0, 1)


def section_a(rep, corpus):
    for tag, precise, seed in (
            [("bf16_seed0", False, 0)]
            + [(f"precise_seed{s}", True, s)
               for s in range(N_PRECISE_SEEDS)]):
        if rep.data.get("A", {}).get(tag):
            continue
        # precise reference = the independent segmented XLA z-draw
        # (f32 end to end); the fused kernel's f32-table mode OOMs
        # scoped VMEM at kpad=4096 (19.97M > 16M limit)
        kw = ({"zdraw_kernel": "xla"} if precise else {})
        m = _make("ggs", seed, corpus, **kw)
        traj, secs = run_traj(m, 200, 20)
        rep.put("A", tag, {"ll_traj": traj, "nk_gini": _nk_gini(m),
                           "seconds": secs})
        del m
    a = rep.data["A"]
    pre = [a[f"precise_seed{s}"] for s in range(N_PRECISE_SEEDS)]
    bf = a["bf16_seed0"]
    checks = {
        "ll_200": predictive_check(bf["ll_traj"]["200"],
                                   [p["ll_traj"]["200"] for p in pre]),
        "nk_gini": predictive_check(bf["nk_gini"],
                                    [p["nk_gini"] for p in pre]),
    }
    rep.put("A", "checks", checks)
    rep.put("A", "gate_pass",
            bool(all(c["pass"] for c in checks.values())))


def section_b(rep, corpus):
    for tag, scheme, rounds in (("dense_ggs", "ggs", None),
                                ("aliasmh_r1", "ggs_aliasmh", 1),
                                ("aliasmh_r4", "ggs_aliasmh", 4),
                                ("aliasmh_r16", "ggs_aliasmh", 16)):
        if rep.data.get("B", {}).get(tag):
            continue
        kw = {} if rounds is None else {"aliasmh_rounds": rounds}
        m = _make(scheme, 2019, corpus, **kw)
        traj, secs = run_traj(m, 200, 20)
        rep.put("B", tag, {"ll_traj": traj, "seconds": secs})
        del m
    b = rep.data["B"]

    def ll200(tag):
        return b[tag]["ll_traj"]["200"]
    dense = ll200("dense_ggs")
    seq = [ll200(f"aliasmh_r{r}") for r in (1, 4, 16)]
    # distance of each rounds-variant from the dense trajectory at 200
    dist = [abs(x - dense) for x in seq]
    rep.put("B", "summary", {
        "dense_ll_200": dense,
        "aliasmh_ll_200_by_rounds": {"1": seq[0], "4": seq[1],
                                     "16": seq[2]},
        "abs_gap_to_dense_by_rounds": {"1": dist[0], "4": dist[1],
                                       "16": dist[2]},
        "monotone_toward_dense": bool(dist[0] >= dist[1] >= dist[2]),
    })


def section_c(rep, corpus, iters):
    from ldagroupedgibbssampler_tpu.corpus.perplexity import (
        build_perplexity_split)
    from ldagroupedgibbssampler_tpu.evaluation.marginal import (
        left_to_right_log_likelihood)
    train, _est, evl = build_perplexity_split(corpus, 0.1, seed=2019)
    # matched held-out protocol for every chain: same eval subset,
    # same particle count, same estimator key
    sub = evl.subset(np.arange(min(256, evl.num_docs)))
    for scheme in ("ggs", "ggs_aliasmh"):
        for seed in range(3):
            tag = f"{scheme}_seed{seed}"
            if rep.data.get("C", {}).get(tag):
                continue
            kw = {"aliasmh_rounds": 1} if scheme == "ggs_aliasmh" else {}
            m = _make(scheme, seed, train, **kw)
            traj, secs = run_traj(m, iters, 100)
            hll = float(left_to_right_log_likelihood(
                7, sub, None, m.get_alpha(), num_particles=20,
                nkw=m._nkw_kv(), nk=m.state.nk, beta=m.get_beta()))
            rep.put("C", tag, {"ll_traj": traj, "held_out_ll": hll,
                               "nk_gini": _nk_gini(m), "seconds": secs})
            del m
    c = rep.data["C"]

    def final(tag):
        t = c[tag]["ll_traj"]
        return t[str(max(int(k) for k in t))]

    def slope(tag):
        """LL change over the last 500 iterations."""
        t = {int(k): v for k, v in c[tag]["ll_traj"].items()}
        top = max(t)
        lo = max(k for k in t if k <= top - 500)
        return t[top] - t[lo]
    g = [final(f"ggs_seed{s}") for s in range(3)]
    a = [final(f"ggs_aliasmh_seed{s}") for s in range(3)]
    gh = [c[f"ggs_seed{s}"]["held_out_ll"] for s in range(3)]
    ah = [c[f"ggs_aliasmh_seed{s}"]["held_out_ll"] for s in range(3)]
    sigma = float(np.sqrt((np.var(g, ddof=1) + np.var(a, ddof=1)) / 2))
    gap = float(abs(np.mean(g) - np.mean(a)))
    rep.put("C", "summary", {
        "iters": iters,
        "ggs_final_ll": g, "aliasmh_final_ll": a,
        "ggs_slope_last500": [slope(f"ggs_seed{s}") for s in range(3)],
        "aliasmh_slope_last500": [slope(f"ggs_aliasmh_seed{s}")
                                  for s in range(3)],
        "ggs_held_out_ll": gh, "aliasmh_held_out_ll": ah,
        "held_out_gap": float(abs(np.mean(gh) - np.mean(ah))),
        "held_out_sigma": float(np.sqrt((np.var(gh, ddof=1)
                                         + np.var(ah, ddof=1)) / 2)),
        "final_ll_gap": gap, "final_ll_seed_sigma": sigma,
        "gap_vs_sigma": gap / max(sigma, 1e-9),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="A,B,C")
    ap.add_argument("--iters-c", type=int, default=3000)
    ap.add_argument("--out", default="LARGEK_QUALITY.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    corpus = bench.synth_corpus(0)
    rep = Report(args.out)
    secs = args.sections.split(",")
    if "A" in secs:
        section_a(rep, corpus)
    if "B" in secs:
        section_b(rep, corpus)
    if "C" in secs:
        section_c(rep, corpus, args.iters_c)
    print(json.dumps({k: rep.data[k].get("checks",
                                         rep.data[k].get("summary"))
                      for k in rep.data}, indent=1))


if __name__ == "__main__":
    main()
