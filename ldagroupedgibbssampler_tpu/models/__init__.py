"""Sampler layer (replaces reference L4: cc.mallet.topics)."""

from ldagroupedgibbssampler_tpu.models.base import (  # noqa: F401
    LDAState, TpuLDASampler)
from ldagroupedgibbssampler_tpu.models.registry import (  # noqa: F401
    create_model, SCHEMES)
