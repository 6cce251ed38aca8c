"""Multi-chip PCGS: documents sharded, phi replicated, one psum per sweep.

This is the P1 pattern of SURVEY.md §2.2 for the partially collapsed
sampler: the reference fans documents out over a ForkJoinPool with phi held
fixed for the whole sweep (UncollapsedParallelLDA.java:1354-1437, z-scores
(n_dk + alpha_k) * phi[k][w] at :1509-1513) and drains AtomicInteger count
deltas afterwards (:1107-1221). Because documents are conditionally
independent given phi, sharding documents over the mesh is *exact* — unlike
ADLDA there is no staleness beyond what the reference itself has: each
shard runs the doc-sequential vectorised sweep against the replicated phi,
the shard-local N_kw matrices are merged with ONE `psum` per iteration over
ICI, and phi ~ Dir(beta + n_k) is redrawn identically on every shard from
the summed counts with a shared PRNG key (a replicated computation instead
of a broadcast, LDAPartiallyCollapsedGibbsSampler.java:95-118).

Implementation: ShardedADLDA with `collapsed = False` — the two schemes
differ only in what the sweep scores against (explicit phi vs stale
collapsed counts with the own-count self-correction); the sharded data
layout, the shard_map, and the count merge are identical.
"""

from __future__ import annotations

from ldagroupedgibbssampler_tpu.parallel.sharded_adlda import ShardedADLDA


class ShardedPCGS(ShardedADLDA):
    """Scheme `sharded_pcgs`: beta-smoothed phi, documents sharded."""

    collapsed = False
    smooth_phi = True


class ShardedUncollapsedLDA(ShardedPCGS):
    """Scheme `sharded_uncollapsed`: the historical unsmoothed phi ~ Dir(n_k)
    draw (UncollapsedParallelLDA.java:1306-1316, flagged incorrect at
    :1313-1315 but kept for experiment parity), documents sharded."""

    smooth_phi = False

    def _sample_phi(self, key, nkw, beta, type_mask, prev_phi):
        import jax.numpy as jnp

        from ldagroupedgibbssampler_tpu.ops import random as rnd
        conc = nkw.astype(jnp.float32) + 1e-7
        if type_mask is None:
            return rnd.dirichlet(key, conc)
        return rnd.conditional_dirichlet(key, prev_phi, conc, type_mask)
