"""Smoke tests for the secondary CLI drivers (SURVEY.md §2.9):
XValidationCreator, ParallelLDATrainTest, KLClassifier, LDASimilarity,
BM25Search, TopicMassExperiment — library-level bodies driven on a tiny
corpus, checking the artifact files each reference driver writes.
"""

import glob
import os

import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.config import LDAConfig
from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger


@pytest.fixture()
def cfg(tmp_path):
    return LDAConfig(scheme="ggs", topics=3, alpha=0.5, beta=0.01, seed=11,
                     iterations=15, exec_time=-1, folds=2,
                     experiment_out_dir=str(tmp_path))


@pytest.fixture()
def logger(tmp_path):
    return RunLogger(str(tmp_path / "run"))


def test_xvalidation_creator(cfg, logger, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.tui.xvalidation import (
        create_xvalidation_dataset)
    out = create_xvalidation_dataset(synthetic_corpus, 2, cfg, logger,
                                     scheme="ggs")
    assert len(out) == 2
    for fold_dir, _model in out:
        files = os.listdir(fold_dir)
        assert "train-ids.txt" in files and "test-ids.txt" in files
        assert any(f.startswith("train-doc_topic_means") for f in files)
        assert any(f.startswith("test-doc_topic_means") for f in files)
    # folds partition the docs
    ids = []
    for fold_dir, _ in out:
        with open(os.path.join(fold_dir, "test-ids.txt")) as f:
            ids += [l.strip() for l in f if l.strip()]
    assert len(set(ids)) == synthetic_corpus.num_docs


def test_train_test_runner(cfg, logger, synthetic_corpus, tmp_path):
    from ldagroupedgibbssampler_tpu.tui.train_test import run_train_test
    ids_file = tmp_path / "test_ids.txt"
    ids_file.write_text("\n".join(str(i) for i in range(0, 60, 5)))
    cfg = cfg.replace(test_ids_filename=str(ids_file))
    run_train_test(cfg, synthetic_corpus, logger, scheme="ggs")
    with open(os.path.join(logger.run_dir, "test-ids.txt")) as f:
        test_ids = [l.strip() for l in f if l.strip()]
    assert test_ids == [str(i) for i in range(0, 60, 5)]
    mats = glob.glob(os.path.join(logger.run_dir, "test-doc_topic_means*"))
    assert mats
    m = np.loadtxt(mats[0], delimiter=",")
    assert m.shape == (12, 3)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_kl_classifier_driver(cfg, logger, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.tui.kl_classifier import (
        run_classification)
    cfg = cfg.replace(scheme="spalias", iterations=40)
    combined = run_classification(cfg, synthetic_corpus, logger, folds=2)
    assert combined.total == synthetic_corpus.num_docs
    assert combined.average_accuracy >= 0.6
    assert os.path.exists(os.path.join(logger.run_dir,
                                       "last-confusion-matrix.csv"))


def test_lda_similarity_driver(cfg, logger, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.tui.lda_similarity import run_similarity
    cfg = cfg.replace(iterations=30)
    out = run_similarity(cfg, synthetic_corpus, logger)
    assert out.shape[0] == synthetic_corpus.num_docs // 2
    sim_file = os.path.join(logger.run_dir, "similarities.csv")
    assert os.path.exists(sim_file)
    with open(sim_file) as f:
        assert len(f.readlines()) == out.shape[0] + 1


def test_bm25_search_driver(cfg, logger, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.tui.bm25_search import run_search
    idx, scores = run_search(cfg, synthetic_corpus, logger)
    n_train = synthetic_corpus.num_docs - synthetic_corpus.num_docs // 2
    assert idx.shape == (n_train, 2)
    # a doc's best match is usually itself (it is in the index); same-class
    # docs in the synthetic corpus share vocab, so allow near-duplicates to
    # win sometimes
    self_in_top2 = ((idx[:, 0] == np.arange(n_train))
                    | (idx[:, 1] == np.arange(n_train)))
    assert self_in_top2.mean() > 0.5
    assert os.path.exists(os.path.join(logger.run_dir, "bm25_results.csv"))


def test_topic_mass_driver(cfg, logger, synthetic_corpus):
    from ldagroupedgibbssampler_tpu.tui.topic_mass import (
        run_topic_mass, type_mass_cumsum)
    cum = run_topic_mass(cfg, synthetic_corpus, logger, print_every=10)
    assert cum[-1] == pytest.approx(1.0)
    assert np.all(np.diff(cum) >= -1e-12)
    assert os.path.exists(os.path.join(logger.run_dir,
                                       "type_mass_cumsum.csv"))
    np.testing.assert_allclose(type_mass_cumsum(synthetic_corpus), cum)


def test_rare_words_experiment():
    from ldagroupedgibbssampler_tpu.tui.topic_mass import (
        rare_words_experiment)
    cats = "/root/reference/src/main/resources/datasets/cats.txt"
    rows = rare_words_experiment(cats, [0, 2], stoplist=None)
    assert rows[0]["vocab"] >= rows[1]["vocab"]
    assert rows[0]["corpus_tokens"] >= rows[1]["corpus_tokens"]


def test_measure_timing_writes_timings_and_trace(tmp_path, cats_corpus):
    """measure_timing=true writes per-iteration wall times and a jax
    profiler trace directory (the reference's timing_data equivalent,
    UncollapsedParallelLDA.java:1340-1347)."""
    import os
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger

    logger = RunLogger.create_run_suite(str(tmp_path), "t")
    cfg = LDAConfig(scheme="ggs", topics=3, alpha=1.0, beta=0.1, seed=5,
                    exec_time=-1, measure_timing=True, topic_interval=-1)
    m = create_model(cfg, logger=logger)
    m.add_instances(cats_corpus)
    m.sample(6)
    timings = os.path.join(logger.run_dir, "timings.txt")
    assert os.path.exists(timings)
    rows = open(timings).read().strip().split("\n")
    assert len(rows) == 6 and rows[0].startswith("iteration_1\t")
    trace = os.path.join(logger.run_dir, "timing_data")
    # the profiler may be unavailable on some backends; when it ran, the
    # trace directory must be non-empty
    if os.path.isdir(trace):
        assert any(files for _, _, files in os.walk(trace))


def test_compute_doc_topic_distances(tmp_path, cats_corpus):
    """compute_doc_topic_distances writes the reference's min-distance CSVs
    (UncollapsedParallelLDA.java:723-806) with one row per diagnostic
    iteration and correct values."""
    import os
    import numpy as np
    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.models.registry import create_model
    from ldagroupedgibbssampler_tpu.utils.logging_utils import RunLogger

    logger = RunLogger.create_run_suite(str(tmp_path), "d")
    cfg = LDAConfig(scheme="ggs", topics=3, alpha=1.0, beta=0.1, seed=5,
                    exec_time=-1, topic_interval=2, start_diagnostic=1,
                    compute_doc_topic_distances=True)
    m = create_model(cfg, logger=logger)
    m.add_instances(cats_corpus)
    m.sample(4)
    for fn, rows_len in (("min_doc_distances.csv", cats_corpus.num_docs),
                         ("min_topic_distances.csv", 3)):
        path = os.path.join(logger.run_dir, fn)
        assert os.path.exists(path), fn
        lines = open(path).read().strip().split("\n")
        assert len(lines) == 2              # iterations 2 and 4
        vals = lines[-1].split(",")
        assert len(vals) == rows_len + 1
        assert all(float(v) > 0 for v in vals[1:])
    # spot-check the math against numpy on the final theta
    theta = np.asarray(m.state.theta)
    d = np.sqrt(((theta[:, None, :] - theta[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    got = np.array([float(v) for v in lines[-1].split(",")[1:]])
    # last file checked is min_topic_distances; recompute for phi
    phi = np.asarray(m.get_phi())
    dp = np.sqrt(((phi[:, None, :] - phi[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(dp, np.inf)
    np.testing.assert_allclose(got, dp.min(1), rtol=2e-3)


def test_svmlight_exporter(logger, synthetic_corpus):
    """SvmLightExporter parity (tui/SvmLightExporter.java:62-90): the
    token-index corpus rows, the vocabulary file, and the svmlight rows
    all round-trip back to the loaded corpus exactly."""
    from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
    from ldagroupedgibbssampler_tpu.tui.svmlight_export import (
        doc_svmlight_string, doc_token_index_string, export_corpus,
        read_svmlight_corpus, read_token_index_corpus)

    # include an empty doc to exercise the <empty doc> / "0" branches
    docs = [list(synthetic_corpus.tokens[
        synthetic_corpus.doc_offsets[d]:synthetic_corpus.doc_offsets[d + 1]])
        for d in range(synthetic_corpus.num_docs)] + [[]]
    corpus = Corpus.from_token_lists(docs, synthetic_corpus.vocab)

    out = export_corpus(corpus, logger, "sub1", svmlight=True)
    assert read_token_index_corpus(out["corpus"]) == docs
    assert read_svmlight_corpus(out["svmlight"]) == docs
    with open(out["vocabulary"]) as f:
        assert [l.rstrip("\n") for l in f] == list(corpus.vocab)

    # exact string forms of the reference writers
    assert doc_token_index_string([]) == "<empty doc>"
    assert doc_svmlight_string([]) == "0"
    assert doc_token_index_string([3, 1, 3]) == "3, 1, 3"
    assert doc_svmlight_string([3, 1, 3]) == "3 3:1 1:1 3:1"
    # noWords truncation (instanceToSvmLightString's second arg)
    assert doc_svmlight_string([3, 1, 3], 2) == "2 3:1 1:1"
    assert doc_token_index_string([3, 1, 3], 2) == "3, 1"
