"""Map (layer-cake) serialization: the `.nvblx`-equivalent checkpoint.

Reference: `Mapper::saveLayerCake` / `loadMap` writing the `.nvblx` format
(call-sites nvblox_node.cpp:1668,1703 in the save_map/load_map services).

TPU format (`.nvblx.npz`): a compressed npz holding, per allocated block,
the block indices plus every voxel channel compacted to `[n_allocated, ...]`,
along with metadata (voxel size, channel specs). The map *is* the state
(SURVEY.md §5.4) — save/load gives checkpoint/resume. Arrays are compacted
on save so file size scales with the map, not pool capacity.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def save_map(mapper, path) -> None:
    """Serialize a Mapper's layers (all channels + block table) to npz."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    table = mapper.table
    slots = table.allocated_slots()
    payload = {
        "block_indices": table.block_indices[slots],
    }
    specs = {}
    for name, arr in mapper.pool.channels.items():
        payload[f"channel__{name}"] = np.asarray(arr[jnp.asarray(slots)])
        trailing, dtype = mapper.pool.channel_specs[name]
        specs[name] = {"trailing": list(trailing), "dtype": np.dtype(dtype).name}
    meta = {
        "format_version": FORMAT_VERSION,
        "voxel_size_m": mapper.voxel_size_m,
        "projective_layer": mapper.projective_layer.value,
        "channel_specs": specs,
    }
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    # File handle: np.savez_compressed(path) appends ".npz" to other
    # suffixes, which would break .nvblx roundtrips.
    with open(path, "wb") as f:
        np.savez_compressed(f, **payload)


def load_map(mapper, path) -> int:
    """Load a saved map into an existing (compatible) Mapper.

    Clears current contents. Returns the number of blocks loaded. Raises
    ValueError on voxel-size or channel mismatch.
    """
    path = Path(path)
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta_json"].tobytes()).decode("utf-8"))
        if meta["format_version"] != FORMAT_VERSION:
            raise ValueError(f"unsupported map format {meta['format_version']}")
        if abs(meta["voxel_size_m"] - mapper.voxel_size_m) > 1e-9:
            raise ValueError(
                f"voxel size mismatch: map {meta['voxel_size_m']} vs mapper "
                f"{mapper.voxel_size_m}")
        missing = set(meta["channel_specs"]) - set(mapper.pool.channels)
        if missing:
            raise ValueError(f"mapper lacks channels {sorted(missing)}")
        block_indices = data["block_indices"]
        channels = {name: data[f"channel__{name}"]
                    for name in meta["channel_specs"]}

    # Clear existing map.
    old = mapper.table.allocated_block_indices()
    if old.size:
        slots_old = mapper.table.allocated_slots()
        mapper.table.free([tuple(k) for k in old.tolist()])
        mapper.pool.reset_slots(slots_old)
    mapper.mesh_layer.blocks.clear()
    mapper._mesh_dirty.clear()

    mapper.pool.ensure_capacity(needed_free=len(block_indices))
    slots, _ = mapper.table.allocate(block_indices)
    s = jnp.asarray(slots)
    for name, values in channels.items():
        mapper.pool[name] = mapper.pool[name].at[s].set(jnp.asarray(values))
    mapper._mark_mesh_dirty(slots)
    return int(len(block_indices))
