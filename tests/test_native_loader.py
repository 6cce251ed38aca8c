"""Native (C++) tokenizer parity tests: the ctypes fast path must produce
bit-identical corpora to the pure-Python pipeline (the executable spec)."""

import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.corpus import load_dataset
from ldagroupedgibbssampler_tpu.corpus.native_loader import (
    native_available, tokenize_corpus_native)
from ldagroupedgibbssampler_tpu.corpus.pipeline import build_corpus
from ldagroupedgibbssampler_tpu.corpus.tokenizer import tokenize
from ldagroupedgibbssampler_tpu.corpus.uci import RawDoc

CATS = "/root/reference/src/main/resources/datasets/cats.txt"

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ unavailable")

TEXTS = [
    "The Cat sat on the MAT. The cat!",
    "dogs-and_cats co-exist 123 a xy",
    "",
    "short a b cd ef ef ef",
]


def _python_ids(texts, stoplist=frozenset(), mode="simple", max_tokens=None):
    docs = [tokenize(t, stoplist, mode=mode, max_tokens=max_tokens)
            for t in texts]
    vocab, index = [], {}
    ids = []
    for doc in docs:
        row = []
        for t in doc:
            if t not in index:
                index[t] = len(vocab)
                vocab.append(t)
            row.append(index[t])
        ids.append(row)
    return ids, vocab


@pytest.mark.parametrize("mode", ["simple", "numeric", "connector"])
def test_tokenizer_parity_modes(mode):
    tokens, offsets, vocab = tokenize_corpus_native(TEXTS, mode=mode)
    py_ids, py_vocab = _python_ids(TEXTS, mode=mode)
    assert vocab == py_vocab
    flat = [t for doc in py_ids for t in doc]
    np.testing.assert_array_equal(tokens, flat)
    np.testing.assert_array_equal(np.diff(offsets),
                                  [len(d) for d in py_ids])


def test_stoplist_and_cap():
    stop = frozenset({"the", "cat"})
    tokens, offsets, vocab = tokenize_corpus_native(
        TEXTS, stoplist=stop, max_tokens=3)
    py_ids, py_vocab = _python_ids(TEXTS, stoplist=stop, max_tokens=3)
    assert vocab == py_vocab
    np.testing.assert_array_equal(np.diff(offsets),
                                  [len(d) for d in py_ids])
    assert max(np.diff(offsets)) <= 3


def test_full_pipeline_parity_on_cats():
    c_native = load_dataset(CATS, stoplist_path=None, rare_threshold=0)
    from ldagroupedgibbssampler_tpu.corpus.uci import read_uci_file
    c_python = build_corpus(read_uci_file(CATS), stoplist_path=None,
                            rare_threshold=0, native=False)
    assert c_native.vocab == c_python.vocab
    np.testing.assert_array_equal(c_native.tokens, c_python.tokens)
    np.testing.assert_array_equal(c_native.doc_offsets,
                                  c_python.doc_offsets)
    assert c_native.labels == c_python.labels
    assert c_native.doc_ids == c_python.doc_ids


def test_rare_prune_parity():
    raw = [RawDoc(doc_id=str(i), label="x", text=t)
           for i, t in enumerate(TEXTS)]
    for th in (0, 2, 3):
        cn = build_corpus(raw, rare_threshold=th, native=True,
                          stoplist_path=None)
        cp = build_corpus(raw, rare_threshold=th, native=False,
                          stoplist_path=None)
        assert cn.vocab == cp.vocab, th
        np.testing.assert_array_equal(cn.tokens, cp.tokens)
        np.testing.assert_array_equal(cn.doc_offsets, cp.doc_offsets)
        assert cn.labels == cp.labels


def test_native_is_used_by_default():
    # ensure the dispatch picks the native path when eligible
    from ldagroupedgibbssampler_tpu.corpus import native_loader
    assert native_loader.native_available()
