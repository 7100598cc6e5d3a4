"""Multi-host (DCN) initialization for the sharded mapper.

Reference: none — the reference is single-GPU (SURVEY.md §2.3); multi-host
spatial scale-out is this build's new capability (§5.8). The recipe is the
standard JAX multi-controller setup: every host calls
`jax.distributed.initialize`, after which `jax.devices()` spans all hosts
and a Mesh over it makes `shard_map`/`ppermute` collectives ride ICI
within a slice and DCN between hosts. The x-slab decomposition maps slabs
to hosts contiguously, so the ESDF halo exchange crosses DCN only at
host boundaries (one `band`-wide face per neighbor pair per update).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the multi-controller JAX runtime (call once per host, before
    any device computation)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_spatial_mesh(n_shards: Optional[int] = None) -> Mesh:
    """1-D "space" mesh over all devices of all processes, ordered so each
    process's devices are contiguous (slabs stay host-local except at the
    boundaries)."""
    devices = sorted(jax.devices(),
                     key=lambda d: (d.process_index, d.id))
    if n_shards is not None:
        devices = devices[:n_shards]
    return Mesh(np.asarray(devices), axis_names=("space",))


def put_sharded(tree, mesh: Mesh, spec) -> object:
    """device_put a (host-replicated, process-consistent) pytree onto a
    possibly multi-process sharding."""
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
