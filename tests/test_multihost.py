"""Multi-host bring-up test (VERDICT round-1 item 3/7): a real 2-process
`jax.distributed` run over loopback — the P8 codepath
(parallel/mesh.py::distributed_initialize, SURVEY.md §2.2 P8) — driving a
sharded GGS step on a mesh that spans both processes, with count
conservation and cross-process agreement checked. Runs on CPU only; no
TPU hardware needed."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from ldagroupedgibbssampler_tpu.parallel.mesh import (distributed_initialize,
                                                      make_mesh)
distributed_initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
assert len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp
from ldagroupedgibbssampler_tpu.corpus.ragged import Corpus
from ldagroupedgibbssampler_tpu.config import LDAConfig
from ldagroupedgibbssampler_tpu.models.registry import create_model

rng = np.random.default_rng(0)
docs = [list(rng.integers(0, 12, 20)) for _ in range(16)]
vocab = [f"w{i}" for i in range(12)]
corpus = Corpus.from_token_lists(docs, vocab)

cfg = LDAConfig(scheme="sharded_ggs", topics=4, alpha=0.5, beta=0.1,
                iterations=3, seed=11, exec_time=-1, topic_interval=999)
model = create_model(cfg)
model.add_instances(corpus)

model.sample(3)
state = model.state

# Count conservation across the 2-process mesh: the global N_kw psum must
# still hold every token (the ensureConsistentTopicTypeCounts invariant,
# UncollapsedParallelLDA.java:299-338, here guaranteed per-psum).
total = int(jax.jit(lambda s: jnp.sum(s.nkw))(state))
assert total == corpus.num_tokens, (total, corpus.num_tokens)

# nkw is replicated across shards -> every process can read it and the
# two processes must agree bit-for-bit (same keys, same collectives).
nkw = np.asarray(jax.jit(lambda s: s.nkw, out_shardings=None)(state))
print("OK", pid, total, int(nkw.sum()), float(np.abs(nkw).max()))
sys.stdout.flush()
"""


@pytest.mark.slow  # round-5 fast-tier budget: full coverage lives in the slow tier / on-chip revalidation
def test_two_process_distributed_ggs(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "OK" in out, out
    # both processes computed identical replicated counts
    lines = [o.splitlines()[-1].split() for _, o, _ in outs]
    assert lines[0][2:] == lines[1][2:], lines
