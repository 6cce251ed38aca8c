"""Distribution layer (replaces reference §2.2 thread/atomic machinery with
mesh + collectives — SURVEY.md §7.5)."""

from ldagroupedgibbssampler_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, distributed_initialize)
from ldagroupedgibbssampler_tpu.parallel.sharded_ggs import (  # noqa: F401
    ShardedGGS)
