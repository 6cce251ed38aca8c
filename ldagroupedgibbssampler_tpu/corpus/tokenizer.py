"""Tokenizers and stoplists.

Mirrors the behaviour of the reference's MALLET pipe tokenizers:
  - `mode="simple"`  — lowercase alphabetic runs
    (cc/mallet/pipe/SimpleTokenizerLarge.java:15-29)
  - `mode="numeric"` — also keeps digit runs / alphanumerics
    (cc/mallet/pipe/NumericAlsoTokenizer.java)
  - `mode="connector"` — keeps connector punctuation (-, _) inside words
    (cc/mallet/pipe/KeepConnectorPunctuationTokenizerLarge.java)

Stoplist files are one word per line (reference: stoplist.txt at repo root).
Tokens shorter than `min_len` are dropped like MALLET's tokenizer does for
single characters.
"""

from __future__ import annotations

import re
from typing import Iterable

_PATTERNS = {
    "simple": re.compile(r"[a-z]+"),
    "numeric": re.compile(r"[a-z0-9]+"),
    "connector": re.compile(r"[a-z](?:[a-z\-_]*[a-z])?"),
}


def load_stoplist(path: str | None) -> frozenset[str]:
    """Load a one-word-per-line stoplist; None/empty path -> empty set
    (reference ships stoplist-empty.txt for that case)."""
    if not path:
        return frozenset()
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return frozenset(line.strip().lower() for line in f if line.strip())


def tokenize(text: str, stoplist: frozenset[str] = frozenset(),
             mode: str = "simple", min_len: int = 2,
             max_tokens: int | None = None) -> list[str]:
    """Lowercase, extract token runs per `mode`, drop stopwords and short
    tokens. `max_tokens` mirrors `max_doc_buf_size` truncation
    (pipe/SimpleTokenizerLarge.java buffer limit)."""
    pattern = _PATTERNS[mode]
    out = []
    for tok in pattern.findall(text.lower()):
        if len(tok) < min_len or tok in stoplist:
            continue
        out.append(tok)
        if max_tokens is not None and len(out) >= max_tokens:
            break
    return out


def tokenize_docs(texts: Iterable[str], **kw) -> list[list[str]]:
    return [tokenize(t, **kw) for t in texts]
