"""Sampler base: functional state + the reference's run-lifecycle API.

The reference defines `LDAGibbsSampler` (topics/LDAGibbsSampler.java:10-46)
with `addInstances / sample(iterations) / getters / lifecycle hooks`, extended
by `LDASamplerWithPhi` (topics/LDASamplerWithPhi.java:5-12) and
`AbortableSampler` (topics/AbortableSampler.java:3-6). `TpuLDASampler`
provides that whole surface.

TPU-first redesign: where the reference mutates shared Java arrays from
thread pools, here per-iteration sampler state is an immutable `LDAState`
pytree and each scheme supplies a pure jitted `_step(state, doc_mask,
type_mask) -> state`. The Python-level `sample()` loop mirrors
`UncollapsedParallelLDA.sample` (topics/UncollapsedParallelLDA.java:552-943):
lifecycle hooks, wall-clock budget, abort-file polling, likelihood /
posterior / held-out series, phi-mean accumulation with burn-in + thinning,
hyperparameter optimisation — but every hot operation stays on device.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.evaluation.hyperopt import (
    learn_dirichlet_parameters, learn_symmetric_concentration)
from ldagroupedgibbssampler_tpu.evaluation.likelihood import (
    log_posterior, matrix_density, model_log_likelihood)
from ldagroupedgibbssampler_tpu.evaluation.topwords import top_words
from ldagroupedgibbssampler_tpu.models import randomscan
from ldagroupedgibbssampler_tpu.ops import counts as count_ops
from ldagroupedgibbssampler_tpu.ops import random as rnd
from ldagroupedgibbssampler_tpu.utils.timing import IterationStats


def _min_pairwise_distances(x) -> jnp.ndarray:
    """Per-row min Euclidean distance to any OTHER row (the diagnostics of
    UncollapsedParallelLDA.java:723-806), as one [rows] vector via a Gram
    matmul instead of the reference's triple loop."""
    x = jnp.asarray(x, jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    g = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    g = jnp.where(jnp.eye(x.shape[0], dtype=bool), jnp.inf,
                  jnp.maximum(g, 0.0))
    return jnp.sqrt(jnp.min(g, axis=1))


class LDAState(NamedTuple):
    """One immutable snapshot of the Markov chain.

    Field map to the reference's mutable state (UncollapsedParallelLDA.java):
      z     <- per-token topic indicators (TopicAssignment sequences)
      ndk   <- document-topic counts  (ModifiedSimpleLDA docTopicCounts)
      nkw   <- topicTypeCountMapping[K][V] (:108); the V×K transpose
               `typeTopicCounts` is just nkw.T here — no second copy
      nk    <- tokensPerTopic (:373-375)
      phi   <- phi[K][V] (:69)
      theta <- GGS thetaMatrix[D][K] (LDAGroupedGibbsSampler.java:33-37);
               None for schemes that integrate theta out
      alpha/beta <- hyperparameters (device scalars so hyperopt never
               triggers recompilation)
    """
    key: jax.Array
    z: jax.Array
    ndk: jax.Array
    nkw: jax.Array
    nk: jax.Array
    phi: jax.Array
    theta: Optional[jax.Array]
    alpha: jax.Array
    beta: jax.Array
    iteration: jax.Array


class TpuLDASampler:
    """Base class for all schemes. Subclasses set `layout` ("flat" or
    "doc_major") and implement `_step`."""

    layout = "flat"
    # Whether phi rows are drawn with beta smoothing (LDAPartiallyCollapsed
    # GibbsSampler.java:95-118 fixes the unsmoothed draw flagged at
    # UncollapsedParallelLDA.java:1313-1315).
    smooth_phi = True
    # Orientation of state.nkw / state.phi: "kv" = [K, V] (reference
    # orientation), "vk" = [V, K] (type-major, used by the fused GGS path
    # where per-token access is row-wise by type).
    nkw_layout = "kv"
    # jit the whole _init_state (fast path); samplers whose init contains
    # shard_map sections disable this (see add_instances)
    _jit_init = True

    def __init__(self, config: LDAConfig, logger=None):
        self.config = config
        self.logger = logger
        self.corpus: Optional[Corpus] = None
        self.test_corpus: Optional[Corpus] = None
        self.state: Optional[LDAState] = None
        self._abort = False
        self._ll_history: list = []          # (iteration, ll)
        self._held_out_history: list = []
        self._phi_mean = None
        self._phi_mean_count = 0
        self._step_jit = None
        self._iteration_listeners = []       # tui/IterationListener.java:5-7
        self.doc_batch_builder = None
        self.topic_index_builder = None
        self.topic_batch_builder = None

    # ------------------------------------------------------------------
    # data loading (LDAGibbsSampler.addInstances / addTestInstances)
    # ------------------------------------------------------------------
    def add_instances(self, corpus: Corpus, key: jax.Array | None = None):
        """Random z init + count build (ModifiedSimpleLDA.addInstances
        :939-969 draws each token's initial topic uniformly)."""
        self.corpus = corpus
        cfg = self.config
        if key is None:
            key = jax.random.key(cfg.effective_seed(), impl=cfg.prng_impl)
        self._prepare_device_data(corpus)
        # one fused compile for the whole init instead of op-by-op eager;
        # device data goes in as arguments, not closure constants (see
        # _with_rebound). Samplers whose init contains shard_map sections
        # set _jit_init = False (nesting them under this jit hangs the
        # axon remote compiler).
        if self._jit_init:
            self.state = jax.jit(self._with_rebound(self._init_state))(
                self._device_arrays(), key)
        else:
            self.state = self._init_state(key)
        self.doc_batch_builder = randomscan.make_document_batch_builder(
            cfg, corpus.num_docs)
        self.topic_index_builder = randomscan.make_topic_index_builder(
            cfg, corpus)
        self.topic_batch_builder = randomscan.make_topic_batch_builder(cfg)
        return self

    def add_test_instances(self, corpus: Corpus):
        self.test_corpus = corpus
        return self

    def swap_corpus_tokens(self, corpus: Corpus):
        """Replace the training tokens with a same-shape corpus, keeping
        the compiled step and the chain's latents: z carries over by
        canonical flat token index, counts (nkw/ndk/nk) are rebuilt for
        the new tokens, and phi / theta are PRESERVED — the w-replication
        step of a Geweke chain must not touch the latents, and for the
        sparse-phi schemes (VS, Polya-Urn) an inserted dense redraw is
        not the scheme's own conditional (it would deterministically
        collapse the VS support: dense prev -> zeroPhi = 0 -> inclusion
        posterior exactly 0, ops/random.py::vs_inclusion_prob).

        This is the data-replication hook for joint-distribution (Geweke,
        "getting it right") validation: every device-resident corpus table
        rides the step as a jit ARGUMENT (`_with_rebound`), so a swap that
        preserves the padded shapes re-enters the already-compiled step
        with new values instead of recompiling per replication."""
        assert self.corpus is not None, "call add_instances first"
        assert corpus.num_docs == self.corpus.num_docs
        assert corpus.num_tokens == self.corpus.num_tokens
        assert corpus.num_types == self.corpus.num_types
        z = self.get_z_indicators()
        st = self.state
        phi, theta = st.phi, st.theta
        self.corpus = corpus
        self._prepare_device_data(corpus)
        self.set_z_indicators(z)
        self.state = self.state._replace(phi=phi, theta=theta,
                                         key=st.key)
        return self

    def _prepare_device_data(self, corpus: Corpus):
        cfg = self.config
        if self.layout == "flat":
            w, doc_ids, mask = corpus.flat_padded(cfg.token_block)
            self.w = jnp.asarray(w)
            self.doc_ids = jnp.asarray(doc_ids)
            self.mask = jnp.asarray(mask)
        else:
            w_pad, mask_pad = corpus.to_padded(cfg.doc_length_multiple)
            self.w_pad = jnp.asarray(w_pad)
            self.mask_pad = jnp.asarray(mask_pad)

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def _alpha_vector(self) -> jnp.ndarray:
        return jnp.full((self.config.topics,), self.config.alpha, jnp.float32)

    def _init_state(self, key: jax.Array) -> LDAState:
        cfg, corpus = self.config, self.corpus
        num_topics, num_types = cfg.topics, corpus.num_types
        k_z, k_phi, k_theta, k_next = jax.random.split(key, 4)
        if self.layout == "flat":
            z = jax.random.randint(k_z, self.w.shape, 0, num_topics,
                                   dtype=jnp.int32)
            z = jnp.where(self.mask, z, 0)
            nkw = count_ops.topic_word_counts(z, self.w, self.mask,
                                              num_topics, num_types)
            ndk = count_ops.doc_topic_counts(z, self.doc_ids, self.mask,
                                             corpus.num_docs, num_topics)
        else:
            z = jax.random.randint(k_z, self.w_pad.shape, 0, num_topics,
                                   dtype=jnp.int32)
            z = jnp.where(self.mask_pad, z, 0)
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              num_topics, num_types)
            ndk = count_ops.padded_doc_topic_counts(z, self.mask_pad,
                                                    num_topics)
        alpha = self._alpha_vector()
        beta = jnp.float32(cfg.beta)
        phi = self._initial_phi(k_phi, nkw, beta)
        theta = self._initial_theta(k_theta, ndk, alpha)
        return LDAState(key=k_next, z=z, ndk=ndk, nkw=nkw,
                        nk=count_ops.tokens_per_topic(nkw), phi=phi,
                        theta=theta, alpha=alpha, beta=beta,
                        iteration=jnp.int32(0))

    def _initial_phi(self, key, nkw, beta):
        return rnd.dirichlet(key, nkw.astype(jnp.float32)
                             + (beta if self.smooth_phi else 0.0)
                             + (0.0 if self.smooth_phi else 1e-3))

    def _initial_theta(self, key, ndk, alpha):
        return None  # only GGS carries theta in state

    # ------------------------------------------------------------------
    # the per-iteration transition — implemented by each scheme
    # ------------------------------------------------------------------
    def _step(self, state: LDAState, doc_mask: jax.Array,
              type_mask: jax.Array) -> LDAState:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # closure-to-argument conversion for jit
    #
    # Device-resident corpus data (token blocks, doc ids, masks, alias
    # tables, priors...) lives on `self`, so a plain jax.jit(self._step)
    # would capture those arrays as *constants baked into the HLO*. On the
    # axon TPU that inflates remote compiles from seconds to minutes
    # (measured 299 s -> 3.5 s for GGS init on the 20NG-sized corpus when
    # the same arrays are passed as arguments). These helpers collect every
    # jax.Array attribute and rebind it to tracers for the duration of the
    # trace, turning all of them into ordinary jit arguments with no change
    # to the sampler implementations.
    # ------------------------------------------------------------------
    def _device_arrays(self) -> dict:
        return {name: val for name, val in vars(self).items()
                if name != "state" and isinstance(val, jax.Array)}

    def _with_rebound(self, fn):
        """Wrap `fn(*args)` as `g(arrs, *args)` where `arrs` rebinds the
        self.* device arrays while tracing."""
        def g(arrs, *args):
            saved = {n: getattr(self, n) for n in arrs}
            try:
                for n, v in arrs.items():
                    setattr(self, n, v)
                return fn(*args)
            finally:
                for n, v in saved.items():
                    setattr(self, n, v)
        return g

    def _get_step_jit(self):
        if self._step_jit is None:
            jitted = jax.jit(self._with_rebound(self._step),
                             donate_argnums=(1,))
            self._step_jit = lambda state, doc_mask, type_mask: jitted(
                self._device_arrays(), state, doc_mask, type_mask)
        return self._step_jit

    # ------------------------------------------------------------------
    # iteration fusion (config key scan_chunk)
    # ------------------------------------------------------------------
    def _fusable_chunk(self) -> int:
        """scan_chunk when iteration groups can be fused without changing
        any observable behaviour, else 1. Conditions: no per-iteration host
        work (hooks, listeners, paranoid checks, timing, phi-mean
        accumulation, hyperopt) and no runtime-feedback random scan
        (delta-N type masks, percentage topic batches)."""
        cfg = self.config
        if (cfg.scan_chunk <= 1 or cfg.paranoid or self._iteration_listeners
                or cfg.measure_timing or cfg.save_phi_means
                or cfg.hyperparam_optim_interval > 0
                or cfg.topic_index_building_scheme != "all"
                or cfg.topic_batch_building_scheme != "even"
                or float(cfg.percentage_split_size_topic) < 1.0
                or self._needs_delta()):
            return 1
        for h in ("pre_iteration", "post_iteration", "pre_z", "post_z",
                  "pre_phi", "post_phi"):
            if getattr(type(self), h) is not getattr(TpuLDASampler, h):
                return 1
        return max(1, int(self.config.scan_chunk))

    def _iteration_has_event(self, it: int) -> bool:
        cfg = self.config
        if cfg.topic_interval and cfg.topic_interval > 0 \
                and it % cfg.topic_interval == 0:
            return True
        if self.logger is not None and it % 100 == 0:
            return True          # device-metrics logging cadence
        return any(self._in_interval(it, w) for w in (
            cfg.diagnostic_interval, cfg.dn_diagnostic_interval,
            cfg.print_ndocs_interval, cfg.print_ntopwords_interval))

    def _fusable_span(self, it: int, end_it: int, chunk: int) -> int:
        """Length of the fused group starting at `it`: exactly `chunk`
        event-free iterations, else 1 (fixed group size keeps one compiled
        program instead of one per remainder length)."""
        if it + chunk - 1 > end_it:
            return 1
        if any(self._iteration_has_event(j) for j in range(it, it + chunk)):
            return 1
        return chunk

    def _get_fused_steps_jit(self, n: int):
        fn = getattr(self, "_fused_jits", None)
        if fn is None:
            fn = self._fused_jits = {}
        if n not in fn:
            def run(state, dms, tmask):
                def body(st, dm):
                    return self._step(st, dm, tmask), None
                return jax.lax.scan(body, state, dms)[0]
            jitted = jax.jit(self._with_rebound(run), donate_argnums=(1,))
            fn[n] = lambda state, dms, tmask: jitted(
                self._device_arrays(), state, dms, tmask)
        return fn[n]

    # ------------------------------------------------------------------
    # main loop (UncollapsedParallelLDA.sample:552-943)
    # ------------------------------------------------------------------
    def sample(self, iterations: int | None = None):
        cfg = self.config
        iterations = iterations or cfg.iterations
        assert self.state is not None, "call add_instances first"
        step = self._get_step_jit()
        deadline = time.time() + cfg.exec_time if cfg.exec_time > 0 else None
        self.pre_sample()
        start_iter = int(self.state.iteration)
        # measure_timing (UncollapsedParallelLDA.java:1340-1347 wrote
        # per-thread phase files): per-iteration wall times to timings.txt
        # plus one jax-profiler (xprof) trace of iterations 2-4 under
        # timing_data/ — phases are fused into one device program on TPU,
        # so the trace is where per-phase device time lives.
        self._tracing = False
        trace_dir = (os.path.join(self.logger.run_dir, "timing_data")
                     if cfg.measure_timing and self.logger else None)
        fuse = self._fusable_chunk()
        end_it = start_iter + iterations
        it = start_iter + 1
        while it <= end_it:
            # scan_chunk: fuse event-free full-sweep iterations into one
            # scanned dispatch (kills per-iteration host dispatch latency —
            # dominant for sub-10ms steps through the remote TPU tunnel).
            # Bit-identical to single-stepping: same _step, same masks,
            # same key threading. Abort/deadline checked per group.
            n = self._fusable_span(it, end_it, fuse) if fuse > 1 else 1
            if n >= 2:
                dms = np.stack([self.doc_batch_builder.doc_mask(j)
                                for j in range(it, it + n)])
                tmask = jnp.asarray(self.topic_index_builder.type_mask(
                    it, None))
                self.state = self._get_fused_steps_jit(n)(
                    self.state, jnp.asarray(dms), tmask)
                it += n
                if self._abort or os.path.exists("abort"):
                    break
                if deadline is not None and time.time() > deadline:
                    break
                continue
            t0 = time.perf_counter()
            self.pre_iteration()
            doc_mask = jnp.asarray(self.doc_batch_builder.doc_mask(it))
            type_mask = jnp.asarray(self.topic_index_builder.type_mask(
                it, self._delta_types()))
            self.pre_z()
            # copy (+0), not alias: the step donates its input buffers
            need_prev = (self._needs_delta() or self._in_interval(
                it, cfg.dn_diagnostic_interval))
            prev_nkw = self.state.nkw + 0 if need_prev else None
            # topic-batch row selection (PercentageTopicBatchBuilder):
            # unselected phi rows keep their previous draw — exact, since
            # rows are independent Dirichlets given counts. Copy (+0) before
            # the step because the step donates its input buffers.
            topic_mask_np = self.topic_batch_builder.topic_mask(it)
            prev_phi = (self.state.phi + 0 if not topic_mask_np.all()
                        else None)
            self.state = step(self.state, doc_mask, type_mask)
            self.post_z()
            if prev_phi is not None:
                tm = jnp.asarray(topic_mask_np)
                tm = tm[:, None] if self.nkw_layout == "kv" else tm[None, :]
                self.state = self.state._replace(
                    phi=jnp.where(tm, self.state.phi, prev_phi))
            self.post_phi()
            if prev_nkw is not None:
                self._last_delta_types = np.asarray(
                    jnp.any(self.state.nkw != prev_nkw, axis=0))
            if cfg.paranoid:
                self._paranoid_checks()
            if trace_dir is not None:
                self.logger.log_timing(
                    f"iteration_{it}", (time.perf_counter() - t0) * 1e3)
                if it == start_iter + 2 and not self._tracing:
                    try:
                        jax.profiler.start_trace(trace_dir)
                        self._tracing = True
                    except Exception:
                        trace_dir = None
                elif it == start_iter + 4 and self._tracing:
                    jax.block_until_ready(self.state.nkw)
                    try:
                        jax.profiler.stop_trace()
                    finally:
                        self._tracing = False
            self._periodic_logging(it, t0)
            self._interval_dumps(it, prev_nkw)
            self._accumulate_phi_mean(it, iterations)
            if (cfg.hyperparam_optim_interval > 0
                    and it % cfg.hyperparam_optim_interval == 0):
                self._optimize_hyperparameters()
            self.post_iteration()
            for listener in self._iteration_listeners:
                listener(self, it)
            # cooperative abort: flag or an `abort` file in CWD
            # (UncollapsedParallelLDA.java:131,908-910)
            if self._abort or os.path.exists("abort"):
                break
            if deadline is not None and time.time() > deadline:
                break
            it += 1
        jax.block_until_ready(self.state.z)
        if self._tracing:   # break/abort inside the trace window
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
            self._tracing = False
        self.post_sample()
        return self

    # ------------------------------------------------------------------
    # lifecycle hooks (LDAGibbsSampler.java:10-46) — overridable no-ops
    # ------------------------------------------------------------------
    def pre_sample(self): pass
    def post_sample(self): pass
    def pre_iteration(self): pass
    def post_iteration(self): pass
    def pre_z(self): pass
    def post_z(self): pass
    def pre_phi(self): pass
    def post_phi(self): pass

    def add_iteration_listener(self, fn):
        self._iteration_listeners.append(fn)

    # ------------------------------------------------------------------
    # periodic work inside the loop
    # ------------------------------------------------------------------
    def _nkw_kv(self, st: LDAState | None = None) -> jnp.ndarray:
        """Counts in the reference's [K, V] orientation regardless of the
        sampler's internal layout."""
        st = st if st is not None else self.state
        return st.nkw if self.nkw_layout == "kv" else st.nkw.T

    def _phi_kv(self, st: LDAState | None = None) -> jnp.ndarray:
        st = st if st is not None else self.state
        return st.phi if self.nkw_layout == "kv" else st.phi.T

    def _needs_delta(self) -> bool:
        return isinstance(self.topic_index_builder,
                          randomscan.DeltaNTopicIndexBuilder) or isinstance(
            self.topic_index_builder,
            randomscan.MixedMandelbrotDeltaNTopicIndexBuilder)

    def _delta_types(self):
        return getattr(self, "_last_delta_types", None)

    def _periodic_logging(self, it: int, t0: float):
        cfg = self.config
        interval = cfg.topic_interval
        if interval is None or interval <= 0 or it % interval != 0:
            return
        st = self.state
        stats = IterationStats(iteration=it,
                               total_ms=(time.perf_counter() - t0) * 1e3)
        if cfg.compute_likelihood:
            ll = float(model_log_likelihood(st.ndk, self._nkw_kv(st),
                                            st.alpha, float(st.beta)))
            self._ll_history.append((it, ll))
            if self.logger:
                self.logger.log_likelihood(it, ll)
        if cfg.start_diagnostic > 0 and it >= cfg.start_diagnostic:
            theta = st.theta if st.theta is not None else \
                self.get_theta_estimate()
            lp = float(log_posterior(st.ndk, self._nkw_kv(st), theta,
                                     self._phi_kv(st), st.alpha,
                                     float(st.beta)))
            if self.logger:
                self.logger.log_posterior(it, lp)
            if cfg.compute_doc_topic_distances and self.logger:
                # min pairwise Euclidean distances between theta rows and
                # between phi rows, one CSV row per diagnostic iteration
                # (UncollapsedParallelLDA.java:723-806) — O(D^2)/O(K^2)
                # matmuls on device, opt-in
                dd = np.asarray(_min_pairwise_distances(theta))
                td = np.asarray(_min_pairwise_distances(self._phi_kv(st)))
                self.logger.log_min_distances("min_doc_distances.csv",
                                              it, dd)
                self.logger.log_min_distances("min_topic_distances.csv",
                                              it, td)
        if self.test_corpus is not None:
            hll = self._held_out_log_likelihood()
            self._held_out_history.append((it, hll))
            if self.logger:
                self.logger.log_held_out_ll(it, hll)
        if self.logger:
            if cfg.log_type_topic_density:
                stats.density_nkw = float(matrix_density(st.nkw))  # orientation-free
            if cfg.log_document_density:
                stats.density_ndk = float(matrix_density(st.ndk))
            if cfg.log_phi_density:
                stats.density_phi = float(matrix_density(st.phi))
            self.logger.log_stats_row(stats.as_row())
            if cfg.log_tokens_per_topic:
                self.logger.log_tokens_per_topic(np.asarray(st.nk))
        # device resource metrics every RESOURCE_LOG_INTERVAL iterations —
        # the JMX MemoryMXBean/ThreadMXBean equivalent
        # (UncollapsedParallelLDA.java:1972-2048, RESOURCE_LOG_INTERVAL=100)
        if self.logger and it % 100 == 0:
            try:
                mem = jax.local_devices()[0].memory_stats() or {}
            except Exception:
                mem = {}
            self.logger.log_device_metrics(it, mem)

    @staticmethod
    def _in_interval(it: int, intervals) -> bool:
        """intervals = flat (a1, b1, a2, b2, ...) iteration windows
        (Configuration-README.txt `diagnostic_interval`)."""
        pairs = list(intervals or ())
        return any(a <= it <= b for a, b in zip(pairs[::2], pairs[1::2]))

    def _interval_dumps(self, it: int, prev_nkw):
        """Windowed artifact dumps (UncollapsedParallelLDA.java:829-833 and
        :945-968): binary phi/N/M snapshots + z CSV inside
        `diagnostic_interval`, delta-N magnitude inside
        `dn_diagnostic_interval`, doc-topic / top-word console prints
        inside their windows."""
        cfg = self.config
        if self.logger is None:
            return
        if self._in_interval(it, cfg.diagnostic_interval):
            from ldagroupedgibbssampler_tpu.utils import matrix_io
            base = self.logger.run_dir
            matrix_io.write_binary_double_matrix(
                self.get_phi(), it, os.path.join(base, "phi"))
            matrix_io.write_binary_int_matrix(
                self.get_topic_type_counts(), it, os.path.join(base, "N"))
            matrix_io.write_binary_int_matrix(
                self.get_document_topic_matrix(), it,
                os.path.join(base, "M"))
            self.logger.save_z(it, self.get_z_indicators())
        if (self._in_interval(it, cfg.dn_diagnostic_interval)
                and prev_nkw is not None):
            delta = int(np.abs(np.asarray(self.state.nkw, np.int64)
                               - np.asarray(prev_nkw, np.int64)).sum())
            self.logger._append("delta_n.txt", f"{it}\t{delta}")
        if (self._in_interval(it, cfg.print_ndocs_interval)
                and cfg.print_ndocs_cnt > 0):
            theta = self.get_theta_estimate()[: cfg.print_ndocs_cnt]
            print(f"Iteration {it} doc-topic means:\n{np.round(theta, 4)}")
        if (self._in_interval(it, cfg.print_ntopwords_interval)
                and cfg.print_ntopwords_cnt > 0):
            for k, ws in enumerate(self.get_top_words(
                    cfg.print_ntopwords_cnt)):
                print(f"Iteration {it} topic {k}: {' '.join(ws)}")

    def _accumulate_phi_mean(self, it: int, total_iters: int):
        cfg = self.config
        if not cfg.save_phi_means:
            return
        burn_iter = int(total_iters * cfg.phi_mean_burnin / 100.0)
        if it <= burn_iter or (it - burn_iter) % max(cfg.phi_mean_thin, 1):
            return
        phi = self.state.phi
        self._phi_mean = phi if self._phi_mean is None \
            else self._phi_mean + phi
        self._phi_mean_count += 1

    def _optimize_hyperparameters(self):
        """optimizeAlpha / optimizeBeta (ModifiedSimpleLDA.java:812-905)."""
        st = self.state
        ndk = np.asarray(st.ndk)
        lengths = ndk.sum(axis=1)
        if self.config.symmetric_alpha:
            a = learn_symmetric_concentration(ndk, lengths,
                                              self.config.topics,
                                              float(st.alpha[0]))
            alpha = jnp.full_like(st.alpha, a)
        else:
            alpha = jnp.asarray(learn_dirichlet_parameters(
                np.asarray(st.alpha), ndk, lengths), jnp.float32)
        nkw = np.asarray(self._nkw_kv(st))
        b = learn_symmetric_concentration(nkw, nkw.sum(axis=1),
                                          self.corpus.num_types,
                                          float(st.beta))
        self.state = st._replace(alpha=alpha, beta=jnp.float32(b))

    def _paranoid_checks(self):
        """ParanoidUncollapsedParallelLDA invariants
        (test subclass, SURVEY.md §4.3) run inline each iteration."""
        st = self.state
        checks = count_ops.check_count_consistency(self._nkw_kv(st), st.ndk,
                                                   self.corpus.num_tokens)
        for name, ok in checks.items():
            if not bool(ok):
                raise AssertionError(
                    f"paranoid: invariant {name} violated at iteration "
                    f"{int(st.iteration)}")
        phi_sums = jnp.sum(self._phi_kv(st), axis=-1)
        # Inactive HDP topics have all-zero phi rows by design
        # (PoissonPolyaUrnHLDA.java:810-819); every other row must
        # normalise (ensureConsistentPhi).
        if not bool(jnp.all((jnp.abs(phi_sums - 1.0) < 1e-3)
                            | (phi_sums == 0.0))):
            raise AssertionError("paranoid: phi rows not normalised "
                                 "(ensureConsistentPhi)")
        # recount N_kw from z (ensureConsistentTopicTypeCounts proper,
        # UncollapsedParallelLDA.java:299-338): catches any kernel/layout
        # drift between the z array and the count matrices
        z = self.get_z_indicators()
        ref = np.zeros((self.corpus.num_types, self.config.topics),
                       np.int64)
        np.add.at(ref, (self.corpus.tokens, z), 1)
        if not np.array_equal(
                np.asarray(self._nkw_kv(st)).T.astype(np.int64), ref):
            raise AssertionError(
                "paranoid: N_kw does not match a recount of z "
                f"(iteration {int(st.iteration)})")

    def _held_out_log_likelihood(self) -> float:
        from ldagroupedgibbssampler_tpu.evaluation.marginal import (
            left_to_right_log_likelihood)
        st = self.state
        return float(left_to_right_log_likelihood(
            jax.random.fold_in(st.key, 7919), self.test_corpus, None,
            np.asarray(st.alpha), num_particles=100,
            nkw=self._nkw_kv(st), nk=st.nk, beta=float(st.beta)))

    # ------------------------------------------------------------------
    # accessors (LDAGibbsSampler / LDASamplerWithPhi getters)
    # ------------------------------------------------------------------
    def abort(self):
        self._abort = True

    def get_abort(self) -> bool:
        return self._abort

    def get_phi(self) -> np.ndarray:
        """phi in the reference's [K, V] orientation regardless of the
        sampler's internal layout."""
        return np.asarray(self._phi_kv())

    def set_phi(self, phi, vocab=None, labels=None):
        """setPhi with alphabet verification
        (UncollapsedParallelLDA.java:1913-1926). `phi` is [K, V]."""
        if vocab is not None and list(vocab) != list(self.corpus.vocab):
            raise ValueError("vocabulary mismatch in set_phi")
        phi = jnp.asarray(phi, jnp.float32)
        if self.nkw_layout != "kv":
            phi = phi.T
        assert phi.shape == self.state.phi.shape
        self.state = self.state._replace(phi=phi)

    def sample_z_given_phi(self, iterations: int = 100):
        """Resample z (and the count matrices) holding phi fixed —
        LDASamplerWithPhi.sampleZGivenPhi
        (UncollapsedParallelLDA.java:975-1014). All documents fold in
        simultaneously in one jitted scan; the post-burn-in theta mean is
        cached for `get_theta_estimate`-style read-out via
        `get_fold_in_theta`."""
        from ldagroupedgibbssampler_tpu.evaluation import foldin
        st = self.state
        key, k_fold = jax.random.split(st.key)
        phi_kv = jnp.asarray(self._phi_kv(), jnp.float32)
        log_phi_vk = jnp.log(jnp.maximum(phi_kv.T, 1e-30))
        w, doc_ids, mask = self.corpus.flat_padded(self.config.token_block)
        z, ndk, theta_mean = foldin._fold_in_jit(
            k_fold, jnp.asarray(w), jnp.asarray(doc_ids), jnp.asarray(mask),
            log_phi_vk, st.alpha, self.corpus.num_docs, int(iterations),
            int(iterations) // 2)
        nkw = count_ops.topic_word_counts(z, jnp.asarray(w),
                                          jnp.asarray(mask),
                                          self.config.topics,
                                          self.corpus.num_types)
        if self.nkw_layout != "kv":
            nkw = nkw.T
        if self.layout != "flat":
            # doc-major samplers keep z padded [D, L]; rebuild that layout
            z_np = np.zeros(self.w_pad.shape, np.int32)
            z_np[np.asarray(self.mask_pad)] = np.asarray(z)[np.asarray(mask)]
            z = jnp.asarray(z_np)
        self._fold_in_theta = np.asarray(theta_mean)
        self.state = st._replace(key=key, z=z, ndk=ndk, nkw=nkw,
                                 nk=count_ops.tokens_per_topic(self._nkw_kv(
                                     st._replace(nkw=nkw))))
        return self

    def get_fold_in_theta(self) -> Optional[np.ndarray]:
        return getattr(self, "_fold_in_theta", None)

    def get_phi_means(self) -> Optional[np.ndarray]:
        if self._phi_mean is None or self._phi_mean_count == 0:
            return None
        return np.asarray(self._phi_mean) / self._phi_mean_count

    def get_topic_type_counts(self) -> np.ndarray:
        """K×V counts (topicTypeCountMapping)."""
        return np.asarray(self._nkw_kv())

    def get_type_topic_matrix(self) -> np.ndarray:
        """V×K counts (typeTopicCounts — reference keeps both orientations,
        UncollapsedParallelLDA.java:373-375; we transpose on demand)."""
        return np.asarray(self._nkw_kv()).T

    def get_document_topic_matrix(self) -> np.ndarray:
        return np.asarray(self.state.ndk)

    def get_tokens_per_topic(self) -> np.ndarray:
        return np.asarray(self.state.nk)

    def get_alpha(self) -> np.ndarray:
        return np.asarray(self.state.alpha)

    def get_beta(self) -> float:
        return float(self.state.beta)

    def get_theta_estimate(self) -> np.ndarray:
        """Mean-estimate theta = (ndk + alpha) / (len_d + alphaSum)
        (ModifiedSimpleLDA.getThetaEstimate:617-778)."""
        st = self.state
        ndk = np.asarray(st.ndk, np.float64)
        alpha = np.asarray(st.alpha, np.float64)
        denom = ndk.sum(axis=1, keepdims=True) + alpha.sum()
        return (ndk + alpha[None, :]) / np.maximum(denom, 1e-12)

    def get_zbar(self) -> np.ndarray:
        """Empirical doc-topic proportions ndk / len_d (getZbar)."""
        ndk = np.asarray(self.state.ndk, np.float64)
        return ndk / np.maximum(ndk.sum(axis=1, keepdims=True), 1.0)

    def get_z_indicators(self) -> np.ndarray:
        """Per-token topic assignments in flat corpus order
        (getZIndicators, UncollapsedParallelLDA.java:1782-1795)."""
        z = np.asarray(self.state.z)
        if self.layout == "flat":
            return z[: self.corpus.num_tokens]
        mask = np.asarray(self.mask_pad)
        return z[mask]

    def set_z_indicators(self, z_flat):
        """Rebuild counts from imported z and resample phi
        (setZIndicators, UncollapsedParallelLDA.java:1797-1843) — the manual
        resume path."""
        z_flat = np.asarray(z_flat, np.int32)
        assert z_flat.shape[0] == self.corpus.num_tokens
        st = self.state
        if self.layout == "flat":
            z = np.zeros(self.w.shape, np.int32)
            z[: len(z_flat)] = z_flat
            z = jnp.asarray(z)
            nkw = count_ops.topic_word_counts(z, self.w, self.mask,
                                              self.config.topics,
                                              self.corpus.num_types)
            ndk = count_ops.doc_topic_counts(z, self.doc_ids, self.mask,
                                             self.corpus.num_docs,
                                             self.config.topics)
        else:
            z = np.zeros(self.w_pad.shape, np.int32)
            mask = np.asarray(self.mask_pad)
            z[mask] = z_flat
            z = jnp.asarray(z)
            nkw = count_ops.topic_word_counts(z, self.w_pad, self.mask_pad,
                                              self.config.topics,
                                              self.corpus.num_types)
            ndk = count_ops.padded_doc_topic_counts(z, self.mask_pad,
                                                    self.config.topics)
        key, k_phi = jax.random.split(st.key)
        # The reference resamples phi through the SUBCLASS's own sampler
        # (initialSamplePhi, UncollapsedParallelLDA.java:1842) — so VS /
        # Polya-Urn / priors schemes keep their sparse-support semantics
        # here instead of getting a dense Dirichlet row (which would zero
        # the VS inclusion posterior: zeroPhi = 0 -> p = 0).
        phi = self._initial_phi(k_phi, nkw, st.beta)
        self.state = st._replace(key=key, z=z, ndk=ndk, nkw=nkw,
                                 nk=count_ops.tokens_per_topic(nkw), phi=phi)

    def get_log_likelihoods(self) -> list:
        return list(self._ll_history)

    def get_held_out_log_likelihoods(self) -> list:
        return list(self._held_out_history)

    def get_top_words(self, n: int | None = None) -> list:
        return top_words(self.get_topic_type_counts(), self.corpus.vocab,
                         n or self.config.no_top_words)

    # checkpoint / resume (SURVEY.md §5: make (z, counts, phi, key,
    # iteration) a real checkpoint — the reference only had setZIndicators)
    def _z_from_flat(self, z_flat: np.ndarray) -> np.ndarray:
        """Inverse of get_z_indicators: flat canonical token order → this
        sampler's internal z layout."""
        z_flat = np.asarray(z_flat, np.int32)
        if self.layout == "flat":
            z = np.zeros(self.w.shape, np.int32)
            z[: len(z_flat)] = z_flat
            return z
        z = np.zeros(self.w_pad.shape, np.int32)
        z[np.asarray(self.mask_pad)] = z_flat
        return z

    def save_checkpoint(self, path: str):
        st = self.state
        # z is stored in the flat canonical token order so a checkpoint is
        # portable across backends/layouts (the fused TPU paths keep z in
        # block layouts; CPU keeps it doc-major)
        np.savez(path, z=self.get_z_indicators(), ndk=np.asarray(st.ndk),
                 nkw=np.asarray(st.nkw), nk=np.asarray(st.nk),
                 phi=np.asarray(st.phi),
                 theta=(np.asarray(st.theta) if st.theta is not None
                        else np.zeros(0)),
                 alpha=np.asarray(st.alpha), beta=np.asarray(st.beta),
                 iteration=np.asarray(st.iteration),
                 key=jax.random.key_data(st.key))

    def _load_z(self, d) -> jnp.ndarray:
        z = np.asarray(d["z"])
        if z.shape == (self.corpus.num_tokens,):
            return jnp.asarray(self._z_from_flat(z))
        return jnp.asarray(z)  # legacy raw-layout checkpoint

    def load_checkpoint(self, path: str):
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        theta = jnp.asarray(d["theta"]) if d["theta"].size else None
        self.state = LDAState(
            key=jax.random.wrap_key_data(jnp.asarray(d["key"]),
                                         impl=self.config.prng_impl),
            z=self._load_z(d), ndk=jnp.asarray(d["ndk"]),
            nkw=jnp.asarray(d["nkw"]), nk=jnp.asarray(d["nk"]),
            phi=jnp.asarray(d["phi"]), theta=theta,
            alpha=jnp.asarray(d["alpha"]), beta=jnp.asarray(d["beta"]),
            iteration=jnp.asarray(d["iteration"]))
        return self
