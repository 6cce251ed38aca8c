"""Phase timing of the GGS step on the real chip.

Times the full fused step plus each component in isolation, all by
ITERATION-COUNT SUBTRACTION: a lax.scan of 3n bodies minus a scan of n
(best of 3 each, scalar readback to force completion). Full-array
readbacks and fixed dispatch latency through the axon tunnel otherwise
dominate and mis-rank variants.

Components (the step's phases, models/ggs.py::_step):
  full step        — model._step via _multi_step_fn (fused kernel on TPU)
  zdraw+nkw kernel — ops/pallas_zdraw.fused_zdraw_nkw alone
  ndk rebuild      — chunk regroup + windowed count kernel alone
  theta+phi gammas — the two Dirichlet draws alone
  xla fallback     — the full step with zdraw_kernel="xla"
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import synth_corpus, K  # noqa: E402
from ldagroupedgibbssampler_tpu.config import LDAConfig  # noqa: E402
from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler  # noqa: E402
from ldagroupedgibbssampler_tpu.ops import random as rnd  # noqa: E402
from ldagroupedgibbssampler_tpu.ops.pallas_zdraw import fused_zdraw_nkw  # noqa: E402

REPS = 10


def build_model(**kw):
    corpus = synth_corpus()
    cfg = LDAConfig(scheme="ggs", topics=K, alpha=0.5, beta=0.01, seed=2019,
                    exec_time=-1, **kw)
    model = LDAGroupedGibbsSampler(cfg)
    model.add_instances(corpus)
    return model, corpus


def time_full_step(name, model):
    def timed(n):
        run = model._multi_step_fn(n)
        st = jax.tree.map(jnp.copy, model.state)
        st = run(st)
        _ = float(jnp.sum(st.nk))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st = run(st)
            _ = float(jnp.sum(st.nk))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(3 * REPS) - timed(REPS)) / (2 * REPS) * 1e3
    print(f"{name:44s} {dt:8.3f} ms/iter", flush=True)
    return dt


def time_body(name, model, body):
    """body(key) -> scalar; scanned with key splitting."""
    def mk(n):
        def run(carry):
            def sc(c, _):
                key, acc = c
                key, k = jax.random.split(key)
                return (key, acc + body(k)), None
            return jax.lax.scan(sc, carry, None, length=n)[0]
        jitted = jax.jit(model._with_rebound(run))
        return lambda carry: jitted(model._device_arrays(), carry)

    def timed(n):
        run = mk(n)
        # use the model's key impl (default rbg) — a threefry carry here
        # inflates the RNG-heavy phases ~3.5x vs what the model executes
        c = run((jax.random.key(0, impl=model.config.prng_impl),
                 jnp.float32(0)))
        _ = float(c[1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            c2 = run(c)
            _ = float(c2[1])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(3 * REPS) - timed(REPS)) / (2 * REPS) * 1e3
    print(f"{name:44s} {dt:8.3f} ms/iter", flush=True)
    return dt


def main():
    model, corpus = build_model()
    st = model.state
    blocks = model._blocks
    nb = blocks.w_local.shape[0]
    chunks = blocks.w_local.shape[1] // blocks.chunk
    shape3 = (nb, chunks, blocks.chunk)
    print(f"blocks A={blocks.w_local.shape} chunk={blocks.chunk} "
          f"nwin_w={blocks.nwin_w} nwin_d={blocks.nwin_d} "
          f"fused={model._use_fused_zdraw()}", flush=True)

    t_full = time_full_step("full step (fused)", model)

    if model._use_fused_zdraw():
        w3 = model.wb.reshape(shape3)
        d3 = model.dla.reshape(shape3)
        z3_0 = st.z.reshape(shape3)

        def zdraw_body(k):
            seed = jax.random.randint(k, (1,), -2 ** 31, 2 ** 31 - 1,
                                      jnp.int32)
            z3, nkw = fused_zdraw_nkw(
                w3, d3, z3_0, st.theta, st.phi, seed, model.winb,
                model.firstb, model.windc, nwin_w=blocks.nwin_w,
                nwin_d=blocks.nwin_d, vspan=blocks.vspan, dspan=blocks.dspan,
                num_topics=model.config.topics, precise=False)
            return jnp.float32(z3[0, 0, 0] + nkw[0, 0])

        time_body("zdraw+nkw kernel", model, zdraw_body)

    def ndk_body(k):
        z = jnp.where(jax.random.bernoulli(k, 0.5, model.mf.shape),
                      st.z, st.z)
        return jnp.float32(model._count_ndk(z)[0, 0])

    time_body("ndk rebuild (regroup + count kernel)", model, ndk_body)

    def gamma_body(k):
        k1, k2 = jax.random.split(k)
        theta = rnd.dirichlet(k1, st.ndk.astype(jnp.float32) + st.alpha)
        conc = st.nkw.astype(jnp.float32) + st.beta
        g = jnp.maximum(rnd.gamma(k2, conc), rnd.DIRICHLET_FLOOR)
        phi = g / jnp.sum(g, axis=0, keepdims=True)
        return jnp.float32(theta[0, 0] + phi[0, 0])

    time_body("theta+phi gammas", model, gamma_body)

    model_x, _ = build_model(zdraw_kernel="xla")
    time_full_step("full step (xla fallback)", model_x)

    print(f"tokens/s full: {corpus.num_tokens / t_full * 1e3 / 1e6:.1f}M",
          flush=True)


if __name__ == "__main__":
    main()
