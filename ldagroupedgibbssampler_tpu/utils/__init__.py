"""Logging / timing / IO utilities (replaces reference L8)."""

from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger  # noqa: F401
from ldagroupedgibbssampler_tpu.utils.timing import IterationStats, Timing  # noqa: F401
