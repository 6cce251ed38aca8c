"""Similarity layer — batched TPU equivalents of ``cc.mallet.similarity``
(SURVEY.md §2.8)."""

from ldagroupedgibbssampler_tpu.similarity.bm25 import (BM25Searcher, bm25f,
                                                        bm25fext, idf)
from ldagroupedgibbssampler_tpu.similarity.corpus_statistics import (
    CorpusStatistics)
from ldagroupedgibbssampler_tpu.similarity.distances import (DISTANCES,
                                                             Distance,
                                                             pairwise)
from ldagroupedgibbssampler_tpu.similarity.lda_distancer import LDADistancer

__all__ = ["BM25Searcher", "bm25f", "bm25fext", "idf", "CorpusStatistics",
           "DISTANCES", "Distance", "pairwise", "LDADistancer"]
