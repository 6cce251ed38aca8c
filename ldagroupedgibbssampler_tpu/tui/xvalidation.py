"""Cross-validation fold dataset creator.

Replaces ``cc.mallet.topics.tui.XValidationCreator``
(tui/XValidationCreator.java:20-160): per fold, train a sampler on the
training split, fold the held-out split into the trained phi, and write
`train-/test-` doc-topic mean matrices plus row-id files to a per-fold log
directory. The trained-phi fold-in runs all test docs at once
(evaluation/foldin.py) instead of a fresh per-fold Spalias instance.

Usage:
    python -m ldagroupedgibbssampler_tpu.tui.xvalidation \
        --run_cfg=<cfg> [--folds=N ...]
"""

from __future__ import annotations

import os

import numpy as np

from ldagroupedgibbssampler_tpu.config.lda_config import LDAConfig
from ldagroupedgibbssampler_tpu.corpus.perplexity import (
    cross_validation_folds)
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.evaluation.foldin import fold_in
from ldagroupedgibbssampler_tpu.models.registry import create_model
from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger
from ldagroupedgibbssampler_tpu.utils.matrix_io import (
    write_ascii_double_matrix)


def _row_ids(corpus: Corpus, indices) -> list[str]:
    """extractRowIds (XValidationCreator.java:149-156): instance names."""
    if corpus.doc_ids:
        return [str(corpus.doc_ids[i]) for i in indices]
    return [str(int(i)) for i in indices]


def sample_training_set(train: Corpus, cfg: LDAConfig, logger: RunLogger,
                        scheme: str = "spalias"):
    """sampleTrainingset (XValidationCreator.java:89-119): train, write
    train- doc-topic means + phi means + ids."""
    model = create_model(cfg, scheme)
    model.add_instances(train)
    model.sample(cfg.iterations)
    write_ascii_double_matrix(
        model.get_zbar(),
        os.path.join(logger.run_dir, "train-" + cfg.doc_topic_mean_filename))
    pm = model.get_phi_means()
    write_ascii_double_matrix(
        pm if pm is not None else model.get_phi(),
        os.path.join(logger.run_dir, "train-" + cfg.phi_mean_filename))
    return model


def sample_test_set(test: Corpus, phi, alpha, cfg: LDAConfig,
                    logger: RunLogger):
    """sampleTestset (XValidationCreator.java:122-147): fold test docs into
    the trained phi, write test- doc-topic means."""
    import jax
    key = jax.random.key(cfg.effective_seed() + 101)
    ndk, _ = fold_in(key, phi, test, alpha, iterations=cfg.iterations)
    ndk = ndk.astype(np.float64)
    zbar = ndk / np.maximum(ndk.sum(axis=1, keepdims=True), 1.0)
    write_ascii_double_matrix(
        zbar,
        os.path.join(logger.run_dir, "test-" + cfg.doc_topic_mean_filename))
    return zbar


def create_xvalidation_dataset(corpus: Corpus, folds: int, cfg: LDAConfig,
                               logger: RunLogger, scheme: str = "spalias"):
    """createXValidationDataset (XValidationCreator.java:72-87)."""
    out = []
    for fold, (train_idx, test_idx) in enumerate(
            cross_validation_folds(corpus.num_docs, folds,
                                   seed=cfg.effective_seed())):
        fold_logger = logger.sub_logger(f"fold-{fold + 1}")
        train = corpus.subset(train_idx)
        test = corpus.subset(test_idx)
        model = sample_training_set(train, cfg, fold_logger, scheme)
        sample_test_set(test, model.get_phi(), model.get_alpha(), cfg,
                        fold_logger)
        fold_logger.save_lines("train-ids.txt", _row_ids(corpus, train_idx))
        fold_logger.save_lines("test-ids.txt", _row_ids(corpus, test_idx))
        out.append((fold_logger.run_dir, model))
    return out


def main(argv=None):
    from ldagroupedgibbssampler_tpu.tui.common import iterate_runs

    def body(cfg, corpus, logger):
        return create_xvalidation_dataset(corpus, cfg.folds, cfg, logger)

    return iterate_runs(argv, body, "XValidationCreator")


if __name__ == "__main__":
    main()
