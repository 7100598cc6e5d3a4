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


def allgather_submaps(collection):
    """All-gather per-process submaps across hosts -> a global collection.

    Each process contributes its LOCAL submaps (fixed-size WorldGridState +
    TSDF channels + anchor poses); `process_allgather` moves them over DCN
    and every host reconstructs the full SubmapCollection, ready for
    pose-graph optimization + fusion (mapper/submaps.py). This is the
    multi-host leg of the north-star submap-fusion config: mapping is
    host-local and drift-free per window; global consistency is a
    service-rate collective.

    All processes must hold the same NUMBER of submaps with the same world
    config (pad with empty submaps if needed).
    """
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from isaac_ros_nvblox_tpu.mapper.submaps import SubmapCollection

    payload = {
        "anchors": jnp.stack([jnp.asarray(T) for T in collection.T_W_S_est]),
        "states": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[m.state for m in collection.mappers]),
        "tsdf_distance": jnp.stack(
            [m.channels["tsdf_distance"] for m in collection.mappers]),
        "tsdf_weight": jnp.stack(
            [m.channels["tsdf_weight"] for m in collection.mappers]),
    }
    g = multihost_utils.process_allgather(payload)  # leading axis: process

    out = SubmapCollection(collection.make_mapper, collection.params)
    n_proc = int(g["anchors"].shape[0])
    n_local = len(collection.mappers)
    for p in range(n_proc):
        for s in range(n_local):
            m = collection.make_mapper()
            m.state = jax.tree.map(lambda x, p=p, s=s: jnp.asarray(x[p, s]),
                                   g["states"])
            m.channels["tsdf_distance"] = jnp.asarray(
                g["tsdf_distance"][p, s])
            m.channels["tsdf_weight"] = jnp.asarray(g["tsdf_weight"][p, s])
            m._region_unknown = True
            out.mappers.append(m)
            anchor = np.asarray(g["anchors"][p, s], np.float32)
            out.T_W_S_est.append(anchor)
            out.T_W_S_opt.append(anchor.copy())
            out._first_cam.append(anchor.copy())
        # Reconstruct each process's intra-run odometry chain (the same
        # between-factors _spawn created locally are a pure function of the
        # gathered anchors), so the global collection is immediately
        # optimizable once cross-process loop closures are added.
        base = p * n_local
        for s in range(1, n_local):
            T_prev_this = np.linalg.inv(
                np.asarray(g["anchors"][p, s - 1], np.float64)) \
                @ np.asarray(g["anchors"][p, s], np.float64)
            out.graph.add_between(base + s - 1, base + s,
                                  T_prev_this.astype(np.float32),
                                  weight=collection.params.odometry_weight)
    return out
