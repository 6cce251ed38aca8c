"""Phase timing of the GGS step by ABLATION on the real chip.

Standalone per-phase loops mis-measure through the axon tunnel (XLA hoists
loop-invariant bodies; fusion context differs), so each phase is costed as
(full fused 10-iteration program) minus (the same program with that phase
stubbed out). Variants:

  full        — the real step
  no_z        — z-draw replaced by carrying z forward
  no_counts   — nkw/ndk rebuilds replaced by carrying counts forward
  no_gammas   — theta/phi draws replaced by carrying them forward
  bf16_z      — z-draw gather tables + cdf matmul in bf16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import synth_corpus, K  # noqa: E402
from ldagroupedgibbssampler_tpu.config import LDAConfig  # noqa: E402
from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler  # noqa: E402
from ldagroupedgibbssampler_tpu.ops import random as rnd  # noqa: E402

REPS = 10


def build_model():
    corpus = synth_corpus()
    cfg = LDAConfig(scheme="ggs", topics=K, alpha=0.5, beta=0.01, seed=2019,
                    exec_time=-1)
    model = LDAGroupedGibbsSampler(cfg)
    model.add_instances(corpus)
    return model, corpus


def make_step(model, *, z_mode="real", counts=True, gammas=True):
    """A _step clone with phases stubbed/controlled."""
    cfg = model.config
    num_topics = cfg.topics
    vspan = cfg.vocab_span
    pad_rows = model._blocks.nwin_w * vspan - model.corpus.num_types
    doc_mask = jnp.ones((model.corpus.num_docs,), bool)
    tri = jnp.triu(jnp.ones((num_topics, num_topics), jnp.float32))

    def step(state):
        k_theta, k_z, k_phi, k_next = jax.random.split(state.key, 4)
        if gammas:
            theta = rnd.dirichlet(
                k_theta, state.ndk.astype(jnp.float32) + state.alpha)
        else:
            keybits = jax.random.key_data(k_theta).ravel()[0]
            theta = state.theta + 0e0 * keybits.astype(jnp.float32)

        if z_mode == "skip":
            z = state.z
        else:
            bf16 = z_mode == "bf16"
            tdt = jnp.bfloat16 if bf16 else jnp.float32
            phi_pad = jnp.pad(state.phi, ((0, pad_rows), (0, 0))).astype(tdt)
            ext = jnp.concatenate(
                [theta, doc_mask.astype(jnp.float32)[:, None]],
                axis=1).astype(tdt)
            rows = ext[model.df]
            probs = rows[:, :num_topics] * phi_pad[model.wg]
            if bf16:
                cdf = jax.lax.dot(probs, tri.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
            else:
                cdf = jax.lax.dot(probs, tri,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
            u = (jax.random.uniform(k_z, (probs.shape[0], 1), jnp.float32)
                 * cdf[:, -1:])
            z_new = jnp.minimum(
                jnp.sum((cdf <= u).astype(jnp.int32), axis=-1),
                num_topics - 1)
            sel = model.mf & (rows[:, num_topics] > 0.5)
            z = jnp.where(sel, z_new, state.z)

        if counts:
            nkw = model._count_nkw(z)
            ndk = model._count_ndk(z)
        else:
            nkw, ndk = state.nkw, state.ndk

        if gammas:
            phi = model._sample_phi(k_phi, nkw, state.beta, None, None)
        else:
            phi = state.phi
        return state._replace(key=k_next, z=z, ndk=ndk, nkw=nkw,
                              nk=jnp.sum(nkw, axis=0), phi=phi, theta=theta,
                              iteration=state.iteration + 1)
    return step


def time_variant(name, model, step):
    """Per-iteration cost by ITERATION-COUNT SUBTRACTION: time a scan of
    3*REPS minus a scan of REPS (best of 3 each) with a scalar readback.
    Full-array readbacks and fixed dispatch latency through the axon tunnel
    otherwise dominate and mis-rank the variants (measured: the same step
    reads 30 ms/iter with a 5.8 MB np.asarray readback over 10 iters vs
    12.4 ms/iter by subtraction)."""
    def make_run(n):
        def run(state):
            def body(st, _):
                return step(st), None
            out, _ = jax.lax.scan(body, state, None, length=n)
            return out
        return jax.jit(model._with_rebound(run), donate_argnums=(1,))
    dev = model._device_arrays()

    def timed(n):
        jitted = make_run(n)
        st = jax.tree.map(jnp.copy, model.state)  # donation-safe copy
        st = jitted(dev, st)                       # compile + warm
        _ = float(jnp.sum(st.nk))                  # force completion
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st = jitted(dev, st)
            _ = float(jnp.sum(st.nk))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(3 * REPS) - timed(REPS)) / (2 * REPS) * 1e3
    print(f"{name:44s} {dt:8.3f} ms/iter", flush=True)
    return dt


def main():
    model, corpus = build_model()
    print(f"blocks A={model.wb.shape} chunk={model._blocks.chunk} "
          f"nwin_w={model._blocks.nwin_w} nwin_d={model._blocks.nwin_d}",
          flush=True)
    full = time_variant("full step", model, make_step(model))
    noz = time_variant("no z-draw", model, make_step(model, z_mode="skip"))
    noc = time_variant("no count rebuilds", model,
                       make_step(model, counts=False))
    nog = time_variant("no theta/phi gammas", model,
                       make_step(model, gammas=False))
    bf = time_variant("bf16 z-draw tables+cdf", model,
                      make_step(model, z_mode="bf16"))
    print(f"\nphase costs (full - ablated):")
    print(f"  z-draw      {full - noz:7.3f} ms")
    print(f"  counts      {full - noc:7.3f} ms")
    print(f"  gammas      {full - nog:7.3f} ms")
    print(f"  bf16 z gain {full - bf:7.3f} ms")
    print(f"tokens/s full: {corpus.num_tokens / full * 1e3 / 1e6:.1f}M",
          flush=True)


if __name__ == "__main__":
    main()
