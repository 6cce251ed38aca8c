"""Config / flag system (replaces reference L2: cc.mallet.configuration)."""

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig  # noqa: F401
from ldagroupedgibbssampler_tpu.config.ini import (  # noqa: F401
    ParsedConfig, parse_ini)
from ldagroupedgibbssampler_tpu.config.cli import parse_args  # noqa: F401
