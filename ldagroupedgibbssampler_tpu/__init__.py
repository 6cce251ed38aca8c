"""TPU-native LDA Gibbs-sampling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
clintpgeorge/LDAGroupedGibbsSampler (a Java/MALLET research codebase): a
config-driven batch experiment runner over a family of LDA / HDP Gibbs
samplers (CGS, PCGS, GGS, ADLDA, Spalias, Polya-Urn, LightLDA, HDP) with
extensive convergence diagnostics, held-out evaluation, and downstream
similarity / classification applications.

Design stance (see SURVEY.md §7): the reference parallelises with JVM thread
pools and AtomicInteger delta matrices; here every sampler is a functional
JAX program — per-iteration state is a pytree, the token sweep is a fused
vectorised kernel (Gumbel-max categorical over gathered phi/theta rows),
counts are rebuilt by scatter-add/segment-sum, Dirichlet rows are vectorised
Gamma draws, and multi-chip scaling is `shard_map` over a `jax.sharding.Mesh`
with `psum` count-delta merges riding ICI.
"""

__version__ = "0.1.0"

from ldagroupedgibbssampler_tpu.models.registry import create_model, SCHEMES  # noqa: F401
