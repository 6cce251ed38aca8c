"""Data ingestion (replaces reference L3: LDAUtils loaders + cc.mallet.pipe).

Plain Python/NumPy — no JAX needed here. Produces a `Corpus`: flat ragged
token-id arrays plus vocabulary, ready for static-shape padding on device.
"""

from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus  # noqa: F401
from ldagroupedgibbssampler_tpu.corpus.tokenizer import (  # noqa: F401
    tokenize, load_stoplist)
from ldagroupedgibbssampler_tpu.corpus.uci import (  # noqa: F401
    read_uci_file, read_directory)
from ldagroupedgibbssampler_tpu.corpus.pipeline import (  # noqa: F401
    load_dataset, build_corpus, prune_rare, keep_tfidf_top)
from ldagroupedgibbssampler_tpu.corpus.perplexity import (  # noqa: F401
    build_perplexity_split)
