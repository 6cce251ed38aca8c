"""Evaluation layer (replaces reference L7 + diagnostics)."""

from ldagroupedgibbssampler_tpu.evaluation.likelihood import (  # noqa: F401
    model_log_likelihood, log_posterior, matrix_density)
from ldagroupedgibbssampler_tpu.evaluation.hyperopt import (  # noqa: F401
    learn_symmetric_concentration, learn_dirichlet_parameters)
from ldagroupedgibbssampler_tpu.evaluation.topwords import (  # noqa: F401
    top_words, top_relevance_words, top_salient_words,
    top_distinctive_words)
