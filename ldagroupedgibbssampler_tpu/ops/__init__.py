"""Device-side math / RNG primitives (replaces reference L1).

Reference parity map (SURVEY.md §2.4):
  - `random.py`   — Gamma/Dirichlet/Poisson/Binomial/Beta draws
                    (cc/mallet/util/ParallelRandoms.java, types/*Dirichlet*.java)
  - `categorical.py` — vectorised categorical draws (Gumbel-max / inverse-CDF);
                    replaces WalkerAliasTable + sequential inverse-CDF loops
  - `counts.py`   — count-matrix construction from z via scatter/segment-sum;
                    replaces the AtomicInteger delta-matrix machinery
  - `kernels.py`  — Pallas TPU kernels for the hot z-step
"""

from ldagroupedgibbssampler_tpu.ops import random  # noqa: F401
from ldagroupedgibbssampler_tpu.ops import categorical  # noqa: F401
from ldagroupedgibbssampler_tpu.ops import counts  # noqa: F401
