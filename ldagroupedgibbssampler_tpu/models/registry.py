"""Scheme registry — mirrors ParallelLDA.createModel
(topics/tui/ParallelLDA.java:401-490), mapping the same 16 scheme strings to
sampler classes. Modules are imported lazily so optional schemes don't slow
down framework import.
"""

from __future__ import annotations

import importlib

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig

# scheme -> (module, class, human description printed by createModel)
SCHEMES = {
    "ggs": ("ggs", "LDAGroupedGibbsSampler",
            "LDA Grouped Gibbs Sampler. GGS by George and Doss (2025)."),
    "ggs_test": ("ggs", "LDAGroupedGibbsSamplerTest",
                 "Invalid GGS comparison variant (stale theta)."),
    "ggs_aliasmh": ("ggs_aliasmh", "LDAGroupedGibbsSamplerAliasMH",
                    "GGS with O(1)-per-token alias-MH z-draws — the "
                    "sublinear large-K mode (LightLDA-style count "
                    "proposals on the grouped target). Recommended at "
                    "K >= 8192, where the dense fused kernels stop "
                    "compiling; at K <= 4096 scheme 'ggs' is faster "
                    "AND better held-out (PERF.md large-K resolution)."),
    "adlda": ("adlda", "ADLDA",
              "Approximate Distributed LDA. ADLDA by Newman et al. (2009)."),
    "pcgs": ("pcgs", "LDAPartiallyCollapsedGibbsSampler",
             "Partially Collapsed Gibbs Sampler. PCGS by Magnusson et al. "
             "(2018)."),
    "uncollapsed": ("pcgs", "UncollapsedParallelLDA",
                    "Uncollapsed Parallel LDA. PCGS by Magnusson et al. "
                    "(2018)."),
    "collapsed": ("cgs", "SerialCollapsedLDA",
                  "Collapsed Serial LDA. CGS of Griffiths and Steyvers "
                  "(2004)."),
    "lightcollapsed": ("lightlda", "CollapsedLightLDA",
                       "CollapsedLightLDA Parallel LDA."),
    "efficient_uncollapsed": ("pcgs", "EfficientUncollapsedParallelLDA",
                              "EfficientUncollapsedParallelLDA Parallel "
                              "LDA."),
    "spalias": ("spalias", "SpaliasUncollapsedParallelLDA",
                "SpaliasUncollapsed Parallel LDA."),
    "polyaurn": ("polyaurn", "PolyaUrnSpaliasLDA",
                 "PolyaUrnSpaliasLDA Parallel LDA."),
    "ppu_hlda": ("hdp", "PoissonPolyaUrnHLDA",
                 "PoissonPolyaUrnHLDA Parallel HDP."),
    "ppu_hdplda": ("hdp", "PoissonPolyaUrnHDPLDA",
                   "PoissonPolyaUrnHDPLDA Parallel HDP."),
    "ppu_hdplda_all_topics": ("hdp", "PoissonPolyaUrnHDPLDAInfiniteTopics",
                              "PoissonPolyaUrnHDPLDAInfiniteTopics Parallel "
                              "HDP."),
    "spalias_priors": ("priors", "SpaliasUncollapsedParallelWithPriors",
                       "SpaliasUncollapsed Parallel LDA with Priors."),
    "lightpclda": ("lightlda", "LightPCLDA", "Light PC LDA."),
    "lightpcldaw2": ("lightlda", "LightPCLDAtypeTopicProposal",
                     "Light PC LDA with proposal 2."),
    "nzvsspalias": ("nzvs", "NZVSSpaliasUncollapsedParallelLDA",
                    "NZVSSpaliasUncollapsedParallelLDA Parallel LDA."),
}

# Multi-chip variants (beyond the reference, whose parallelism was
# single-process threads): constructed with the default mesh over all
# visible devices; mesh shape/axes come from config.mesh_shape /
# config.mesh_axis_names.
_SHARDED_SCHEMES = {
    "sharded_ggs": ("parallel.sharded_ggs", "ShardedGGS",
                    "GGS, documents sharded over the device mesh "
                    "(per-iteration N_kw psum)."),
    "vocab_sharded_ggs": ("parallel.vocab_sharded_ggs", "VocabShardedGGS",
                          "GGS, vocabulary windows sharded over the device "
                          "mesh; fused Pallas kernel per shard."),
    "sharded_adlda": ("parallel.sharded_adlda", "ShardedADLDA",
                      "ADLDA, replicated stale counts + per-sweep psum "
                      "merge over the device mesh."),
    "sharded_pcgs": ("parallel.sharded_pcgs", "ShardedPCGS",
                     "PCGS, documents sharded over the device mesh "
                     "(exact: docs independent given phi; one N_kw psum "
                     "per sweep)."),
    "sharded_uncollapsed": ("parallel.sharded_pcgs", "ShardedUncollapsedLDA",
                            "uncollapsed-variant PCGS (unsmoothed phi), "
                            "documents sharded over the device mesh."),
}


def create_model(config: LDAConfig, scheme: str | None = None, logger=None,
                 verbose: bool = False):
    """Instantiate a sampler for `scheme` (default: config.scheme).

    Raises ValueError for unknown schemes (the reference prints "Invalid
    model type. Aborting", ParallelLDA.java:486-489).
    """
    scheme = scheme or config.scheme
    if scheme in _SHARDED_SCHEMES:
        module_name, class_name, description = _SHARDED_SCHEMES[scheme]
        module = importlib.import_module(
            f"ldagroupedgibbssampler_tpu.{module_name}")
        if verbose:
            print(description)
        return getattr(module, class_name)(config, logger=logger)
    if scheme not in SCHEMES:
        raise ValueError(f"Invalid model type {scheme!r}. Known schemes: "
                         f"{sorted(SCHEMES) + sorted(_SHARDED_SCHEMES)}")
    module_name, class_name, description = SCHEMES[scheme]
    module = importlib.import_module(
        f"ldagroupedgibbssampler_tpu.models.{module_name}")
    if verbose:
        print(description)
    return getattr(module, class_name)(config, logger=logger)
