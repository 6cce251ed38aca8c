"""Device mesh construction and multi-host init.

Replaces the reference's removed Akka multi-machine layer
(configuration/LDARemoteConfiguration.java:4-23,
ParsedRemoteLDAConfiguration.java:95-170 — only its config surface survived
in the Java repo) with the JAX runtime: `jax.distributed.initialize` for
multi-host, a `jax.sharding.Mesh` over all addressable chips, collectives
over ICI/DCN instead of netty-tcp actor messages.

The samplers here only need a 1-D "data" axis (documents are the only
parallel axis of this model family — SURVEY.md §2.2); the mesh helper still
accepts arbitrary shapes for forward compatibility.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def distributed_initialize(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (the LDARemoteConfiguration equivalent): no-op if
    single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Mesh over `devices` (default: all). shape=None → 1-D mesh over all
    devices on the first axis name."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = (len(devices),)
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[: len(shape)])
