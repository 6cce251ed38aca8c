"""Test harness config: force an 8-virtual-device CPU mesh (SURVEY.md §7.7)
so multi-chip sharding tests run without TPU hardware. Must run before jax
imports anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (baked into this image's sitecustomize) forces
# jax_platforms="axon,cpu" programmatically, overriding the env var — so the
# CPU override must go through jax.config before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

CATS_PATH = "/root/reference/src/main/resources/datasets/cats.txt"
SMALL_PATH = "/root/reference/src/main/resources/datasets/SmallTexts.txt"


@pytest.fixture(scope="session")
def cats_corpus():
    from ldagroupedgibbssampler_tpu.corpus import load_dataset
    return load_dataset(CATS_PATH, stoplist_path=None, rare_threshold=0)


@pytest.fixture(scope="session")
def small_corpus():
    from ldagroupedgibbssampler_tpu.corpus import load_dataset
    return load_dataset(SMALL_PATH, stoplist_path=None, rare_threshold=0)


@pytest.fixture()
def synthetic_corpus():
    """Planted-topic corpus: K ground-truth topics with disjoint vocab,
    mirroring the role of SmokeTest.java's known topic structure."""
    from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
    rng = np.random.default_rng(42)
    num_topics, types_per_topic, num_docs, doc_len = 3, 10, 60, 40
    vocab = [f"w{k}_{i}" for k in range(num_topics)
             for i in range(types_per_topic)]
    docs = []
    for d in range(num_docs):
        k = d % num_topics
        # 90% on-topic words, 10% noise from other topics
        main = rng.integers(0, types_per_topic, int(doc_len * 0.9)) \
            + k * types_per_topic
        noise = rng.integers(0, len(vocab), doc_len - len(main))
        docs.append(list(np.concatenate([main, noise])))
    return Corpus.from_token_lists(docs, vocab,
                                   labels=[str(d % num_topics)
                                           for d in range(num_docs)])


# Persistent XLA compile cache for the CPU test tier: the fast tier is
# compile-dominated (hundreds of distinct jitted step functions), and the
# cache turns every repeat edit-validate run warm. Cold-run behaviour is
# unchanged.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
