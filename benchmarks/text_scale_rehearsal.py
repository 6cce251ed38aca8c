"""End-to-end TEXT-at-scale rehearsal (round-2 VERDICT item 8).

The NYTimes-scale perf rows use pre-tokenised synthetic ids; this script
drives the whole ingestion pipeline on ~100M tokens of actual TEXT in
one artifact:

  1. synthesise a UCI-format text file at the NYTimes shape the
     reference quotes (datasets/README.txt: D=300k, V~102,660, N~100M):
     Zipf-distributed alphabetic pseudo-words, one `docno:<id>\t<label>
     \t<text>` line per document (~700 MB);
  2. `load_dataset` -> Corpus through the native C++ fast tokenizer
     (the LDAUtils.loadDataset path, util/LDAUtils.java:136-186);
  3. `add_instances` (cell-block build, native C++ builder);
  4. 5 full GGS sweeps on the TPU (HBM-streamed theta kernel),

recording tokenizer / block-build / sampling wall clock.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/text_scale_rehearsal.py [--docs 300000]
Writes TEXT_SCALE_REHEARSAL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

_LETTERS = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)


def make_vocab(v: int, seed: int = 0) -> np.ndarray:
    """`v` distinct alphabetic pseudo-words (len 3-12), as an object
    array for fast fancy-indexed joins."""
    rng = np.random.default_rng(seed)
    words, seen = [], set()
    while len(words) < v:
        need = v - len(words)
        lens = rng.integers(3, 13, need)
        for n in lens:
            w = bytes(_LETTERS[rng.integers(0, 26, n)]).decode()
            if w not in seen:
                seen.add(w)
                words.append(w)
    return np.array(words, dtype=object)


def synthesize_file(path: str, docs: int, vocab_size: int, mean_len: int,
                    seed: int = 1):
    rng = np.random.default_rng(seed)
    vocab = make_vocab(vocab_size)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()
    lengths = np.maximum(5, rng.poisson(mean_len, docs)).astype(np.int64)
    total = int(lengths.sum())
    t0 = time.time()
    with open(path, "w", encoding="utf-8") as f:
        done = 0
        chunk_docs = 20_000
        for s in range(0, docs, chunk_docs):
            e = min(s + chunk_docs, docs)
            n = int(lengths[s:e].sum())
            ids = rng.choice(vocab_size, size=n, p=probs)
            words = vocab[ids]
            off = 0
            lines = []
            for d in range(s, e):
                ln = int(lengths[d])
                text = " ".join(words[off: off + ln])
                off += ln
                lines.append(f"docno:{d}\tX\t{text}\n")
            f.write("".join(lines))
            done += n
    return total, time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--vocab", type=int, default=102_660)
    ap.add_argument("--mean_len", type=int, default=333)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--file", default="/tmp/text_scale_corpus.txt")
    ap.add_argument("--out", default="TEXT_SCALE_REHEARSAL.json")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from ldagroupedgibbssampler_tpu.config import LDAConfig
    from ldagroupedgibbssampler_tpu.corpus import load_dataset
    from ldagroupedgibbssampler_tpu.corpus import native_loader
    from ldagroupedgibbssampler_tpu.models.registry import create_model

    if not os.path.exists(args.file):
        print("synthesising text file ...")
        n_raw, t_synth = synthesize_file(args.file, args.docs, args.vocab,
                                         args.mean_len)
        print(f"  {n_raw} raw tokens in {t_synth:.0f}s "
              f"({os.path.getsize(args.file) / 2**20:.0f} MB)")
    fsize = os.path.getsize(args.file)

    t0 = time.time()
    corpus = load_dataset(args.file, stoplist_path=None, rare_threshold=0)
    t_load = time.time() - t0
    print(f"load_dataset: D={corpus.num_docs} V={corpus.num_types} "
          f"N={corpus.num_tokens} in {t_load:.1f}s "
          f"(native={native_loader.native_available()})")

    cfg = LDAConfig(scheme="ggs", topics=100, alpha=0.5, beta=0.01,
                    seed=2019, exec_time=-1, doc_span=1024,
                    topic_interval=0)
    model = create_model(cfg)
    t0 = time.time()
    model.add_instances(corpus)
    t_build = time.time() - t0
    print(f"add_instances (block build + init): {t_build:.1f}s")

    t0 = time.time()
    model.sample(1)               # compile + first sweep
    t_first = time.time() - t0
    t0 = time.time()
    model.sample(args.iters)
    t_iter = (time.time() - t0) / args.iters
    total = int(np.asarray(jax.jit(lambda s: jnp.sum(s.nkw))(model.state)))
    assert total == corpus.num_tokens, (total, corpus.num_tokens)

    report = {
        "platform": str(jax.devices()[0]),
        "text_file_bytes": fsize,
        "docs": corpus.num_docs, "vocab": corpus.num_types,
        "tokens": corpus.num_tokens,
        "tokenize_load_seconds": round(t_load, 1),
        "tokenize_tokens_per_sec": round(corpus.num_tokens / t_load, 1),
        "block_build_seconds": round(t_build, 1),
        "first_sweep_seconds_incl_compile": round(t_first, 1),
        "seconds_per_sweep": round(t_iter, 2),
        "sampling_tokens_per_sec": round(corpus.num_tokens / t_iter, 1),
        "count_conservation_ok": True,
        "native_tokenizer": bool(native_loader.native_available()),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
