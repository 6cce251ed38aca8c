"""Micro-profile the GGS z-draw components on the real chip.

Iteration-count-subtraction timing (see benchmarks/phase_timing.py): each
candidate is a state->state function scanned 3n vs n times with a scalar
readback; the difference isolates per-iteration cost from tunnel latency.

Variants:
  full        gathers + product + tri-cdf(HIGHEST) + uniform + compare-sum
  tri_default same but tri matmul at default precision
  gumbel      gathers + product + log + gumbel argmax (no tri matmul)
  gathers     the two row gathers only (sum-reduced to keep them live)
  theta_gather / phi_gather  each gather alone
  no_gather   product of *sliced* (contiguous) rows + tri-cdf + draw
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.matrix import synth_20ng  # noqa: E402
from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.models.ggs import LDAGroupedGibbsSampler

REPS = 10
K = 100


def main():
    corpus = synth_20ng()
    cfg = LDAConfig(scheme="ggs", topics=K, alpha=0.1, beta=0.01,
                    iterations=1, seed=7, exec_time=-1,
                    zdraw_kernel="xla")  # this ablation probes the XLA path
    model = LDAGroupedGibbsSampler(cfg)
    model.add_instances(corpus)
    st = model.state
    num_topics = K
    vspan = cfg.vocab_span
    pad_rows = model._blocks.nwin_w * vspan - corpus.num_types
    df, wg = model.df, model.wg
    n = df.shape[0]
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))

    def mk(body):
        def step(carry):
            key, acc = carry
            key, k = jax.random.split(key)
            return key, acc + body(k)
        def run_n(nreps):
            @jax.jit
            def run(carry):
                def sc(c, _):
                    return step(c), None
                out, _ = jax.lax.scan(sc, carry, None, length=nreps)
                return out
            return run
        return run_n

    theta = st.theta
    phi_pad = jnp.pad(st.phi, ((0, pad_rows), (0, 0)))
    ext = jnp.concatenate(
        [theta, jnp.ones((theta.shape[0], 1), jnp.float32)], axis=1)

    def full(k):
        rows = ext[df]
        probs = rows[:, :num_topics] * phi_pad[wg]
        cdf = jax.lax.dot(probs, tri, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        u = jax.random.uniform(k, (n, 1), jnp.float32) * cdf[:, -1:]
        z = jnp.minimum(jnp.sum((cdf <= u).astype(jnp.int32), -1), K - 1)
        return jnp.sum(z)

    def tri_default(k):
        rows = ext[df]
        probs = rows[:, :num_topics] * phi_pad[wg]
        cdf = jax.lax.dot(probs, tri, preferred_element_type=jnp.float32)
        u = jax.random.uniform(k, (n, 1), jnp.float32) * cdf[:, -1:]
        z = jnp.minimum(jnp.sum((cdf <= u).astype(jnp.int32), -1), K - 1)
        return jnp.sum(z)

    def gumbel(k):
        rows = ext[df]
        probs = rows[:, :num_topics] * phi_pad[wg]
        g = jax.random.gumbel(k, probs.shape, jnp.float32)
        z = jnp.argmax(jnp.log(probs + 1e-30) + g, -1).astype(jnp.int32)
        return jnp.sum(z)

    def gathers(k):
        rows = ext[df]
        ph = phi_pad[wg]
        s = jnp.sum(rows[:, :1]) + jnp.sum(ph[:, :1])
        return (s + jax.random.uniform(k, ())).astype(jnp.int32)

    def theta_gather(k):
        rows = ext[df]
        return (jnp.sum(rows[:, :1]) + jax.random.uniform(k, ())).astype(
            jnp.int32)

    def phi_gather(k):
        ph = phi_pad[wg]
        return (jnp.sum(ph[:, :1]) + jax.random.uniform(k, ())).astype(
            jnp.int32)

    def no_gather(k):
        i = jax.random.randint(k, (), 0, 7)
        rows = jax.lax.dynamic_slice(
            jnp.tile(ext, (n // ext.shape[0] + 2, 1)), (i, 0), (n, K + 1))
        ph = jax.lax.dynamic_slice(
            jnp.tile(phi_pad, (n // phi_pad.shape[0] + 2, 1)), (i, 0), (n, K))
        probs = rows[:, :K] * ph
        cdf = jax.lax.dot(probs, tri, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        u = jax.random.uniform(k, (n, 1), jnp.float32) * cdf[:, -1:]
        z = jnp.minimum(jnp.sum((cdf <= u).astype(jnp.int32), -1), K - 1)
        return jnp.sum(z)

    for name, body in [("full", full), ("tri_default", tri_default),
                       ("gumbel", gumbel), ("gathers", gathers),
                       ("theta_gather", theta_gather),
                       ("phi_gather", phi_gather),
                       ("no_gather", no_gather)]:
        run_factory = mk(body)

        def timed(nreps):
            run = run_factory(nreps)
            # rbg, matching the samplers; threefry keys inflate the
            # RNG-heavy variants (uniform / gumbel draws) ~2.5x
            carry = (jax.random.key(0, impl="rbg"), jnp.int32(0))
            carry = run(carry)
            _ = float(carry[1])
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(carry)
                _ = float(out[1])
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(3 * REPS) - timed(REPS)) / (2 * REPS) * 1e3
        print(f"{name:16s} {dt:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
