"""Classification layer — TPU equivalents of ``cc.mallet.classify``
(SURVEY.md §2.8)."""

from ldagroupedgibbssampler_tpu.classify.confusion import (
    EnhancedConfusionMatrix)
from ldagroupedgibbssampler_tpu.classify.kl_classifier import (
    KLDivergenceClassifier, KLDivergenceClassifierMultiCorpus)

__all__ = ["EnhancedConfusionMatrix", "KLDivergenceClassifier",
           "KLDivergenceClassifierMultiCorpus"]
