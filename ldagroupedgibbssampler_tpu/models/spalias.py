"""Spalias — sparse partially-collapsed LDA (Magnusson et al.), scheme
`spalias`.

Reference: topics/SpaliasUncollapsedParallelLDA.java (376 LoC): decomposes
the PCGS conditional p(z=k) ∝ (n_dk + alpha_k) phi[k][w] into a *document*
part n_dk·phi (sparse cumsum over the doc's nonzero topics, :186-198) and a
*prior* part alpha_k·phi (pre-tabled per type in Walker alias tables rebuilt
each iteration, :39-115), drawn via a two-bucket u-split (:277-293) with
swap-remove nonzero-topic bookkeeping (:295-344).

TPU-first analysis: the alias decomposition exists because a scalar CPU core
pays O(K) per token for the dense cumsum, while the table amortises the prior
part to O(1). On TPU the dense K-wide draw is MXU/VPU vector work — all K
lanes per issue — so the crossover the alias table targets sits far beyond
this model family's range. The chain sampled here is therefore *identical in
distribution* to the reference's Spalias (same PCGS target:
phi-stale-within-sweep, n_dk-immediate), implemented with the dense fused
sweep; the reference's alias-table *mechanism* is covered behaviourally.

The sublinear-per-token alternative was BUILT AND MEASURED in round 4
(benchmarks/alias_mh_probe.py; PERF.md "Sublinear large-K draw — measured
negative"): an O(1)-gather LightLDA-style MH realization of the two-bucket
idea (count-based word/doc proposals, 7 packed gathers/token/round, the
TPU-feasible form of the alias draw) reaches only ~6-9M tokens/s at
K=1000-4096 because TPU scalar-gather throughput (~8-10 ns/element) makes
its per-token constant ~150-220 ns — MORE than the dense kernels' Θ(K)
MXU work at every K this PCGS family compiles at. THE crossover of
record is K=8192 (PERF.md "Large-K quality resolution"): it is set by
the dense fused kernels' kpad<=4096 compile gate, not by gather
economics — below it the dense path wins throughput and held-out
quality; past it `ggs_aliasmh` (the GGS-family realization — the PCGS
family's live n_dk makes the MH form infeasible here) is the
recommended scheme. Large-K throughput in-family is earned on the dense
path: bf16x3
one-hot selects + the positive-support last-nonzero skip
(ops/pallas_pcgs.py::SELECT_PRECISION, round-4 MFU table in PERF.md).
"""

from __future__ import annotations

from ldagroupedgibbssampler_tpu.models.pcgs import (
    LDAPartiallyCollapsedGibbsSampler)


class SpaliasUncollapsedParallelLDA(LDAPartiallyCollapsedGibbsSampler):
    """Same Markov chain as PCGS; see module docstring for why the alias
    mechanism is replaced by the dense fused sweep on TPU, and for the
    measured fate of the sublinear alternative."""

    smooth_phi = True
