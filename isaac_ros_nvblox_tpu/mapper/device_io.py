"""Node-facing adapters for the DeviceMapper: slicing, dense-grid export,
map save/load, mesh-layer maintenance, removal log reads.

These are the cold/publish-cadence paths that cross device->host: the
reference does the same per-publish serialization (GPU->host) in
layer_publishing.cpp:702-826 and the conversions/*.cu kernels; the hot
mapping tick itself never calls anything here.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE, block_size_m
from isaac_ros_nvblox_tpu.ops.esdf_slicer import SliceSpec

B = VOXELS_PER_SIDE
FORMAT_VERSION = 2


# ---------------------------------------------------------------- removals
def take_removed_blocks(m) -> List[Tuple[int, int, int]]:
    """Drain new entries from the freed-block ring log (host sync; call at
    publish cadence — parity: getClearedBlocks, layer_publishing.cpp:715)."""
    count = int(m.removed_count)
    K = m.removed_log.shape[0]
    new = count - m._removed_read
    if new <= 0:
        return []
    new = min(new, K)  # ring overflow: older entries were overwritten
    log = np.asarray(m.removed_log)
    idx = (np.arange(count - new, count) % K)
    m._removed_read = count
    return [tuple(int(v) for v in row) for row in log[idx]]


# ------------------------------------------------------------------ slicing
@functools.partial(jax.jit,
                   static_argnames=("H", "W", "voxel_size_m",
                                    "max_distance_m", "unknown_value"))
def _slice_gather(state, sq, inside, observed, origin_vox_xy, gz, *,
                  H: int, W: int, voxel_size_m: float, max_distance_m: float,
                  unknown_value: float):
    """Per-pixel signed distance at global voxel height gz (device gather
    through the slot grid; no host-side slot table needed)."""
    cap = sq.shape[0]
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    gx = origin_vox_xy[0] + ix
    gy = origin_vox_xy[1] + iy
    bx = jnp.floor_divide(gx, B)
    by = jnp.floor_divide(gy, B)
    bz = jnp.floor_divide(gz, B)
    dims = jnp.asarray(state.slot_grid.shape, jnp.int32)
    cell = jnp.stack([bx - state.origin_block[0], by - state.origin_block[1],
                      jnp.broadcast_to(bz - state.origin_block[2], bx.shape)],
                     axis=-1)
    in_bounds = jnp.all((cell >= 0) & (cell < dims), axis=-1)
    safe = jnp.clip(cell, 0, dims - 1)
    slot = state.slot_grid[safe[..., 0], safe[..., 1], safe[..., 2]]
    have = in_bounds & (slot >= 0)
    slot_c = jnp.clip(slot, 0, cap - 1).reshape(-1)
    lx = gx - bx * B
    ly = gy - by * B
    lz = gz - bz * B
    vox = ((lx * B + ly) * B + lz).reshape(-1)
    sq_px = sq[slot_c, vox].reshape(H, W)
    in_px = inside[slot_c, vox].reshape(H, W)
    obs_px = observed[slot_c, vox].reshape(H, W)
    dist = jnp.sqrt(jnp.minimum(sq_px, 1e12)) * voxel_size_m
    dist = jnp.minimum(dist, max_distance_m)
    dist = jnp.where(in_px, -dist, dist)
    known = have & obs_px
    return jnp.where(known, dist, unknown_value)


def slice_esdf_device(m, *, slice_height_m: float, max_distance_m: float,
                      unknown_value: float = 1000.0,
                      spec: Optional[SliceSpec] = None,
                      padding_px: int = 0
                      ) -> Optional[Tuple[SliceSpec, np.ndarray]]:
    """Slice the DeviceMapper's 3D ESDF at a height -> (spec, f32[H, W]).

    Parity: EsdfSlicer::sliceLayerToDistanceImage
    (nvblox_node.cpp:135-137,841-844)."""
    if m._aabb_lo is None:
        if not m._refresh_region_from_device():
            return None
    if m._aabb_lo is None:
        return None
    vs = m.voxel_size_m
    if spec is None:
        lo_m = m._aabb_lo.astype(np.float64) * B * vs
        hi_m = (m._aabb_hi + 1).astype(np.float64) * B * vs
        width = int(round((hi_m[0] - lo_m[0]) / vs)) + 2 * padding_px
        height = int(round((hi_m[1] - lo_m[1]) / vs)) + 2 * padding_px
        spec = SliceSpec(origin_x_m=float(lo_m[0]) - padding_px * vs,
                         origin_y_m=float(lo_m[1]) - padding_px * vs,
                         width=width, height=height,
                         slice_height_m=slice_height_m, voxel_size_m=vs)
    ox = int(np.floor(spec.origin_x_m / vs + 0.5))
    oy = int(np.floor(spec.origin_y_m / vs + 0.5))
    gz = int(np.floor(slice_height_m / vs))
    img = np.asarray(_slice_gather(
        m.state, m.channels["esdf_sq_dist"], m.channels["esdf_is_inside"],
        m.channels["esdf_observed"], jnp.asarray([ox, oy], jnp.int32),
        jnp.int32(gz), H=spec.height, W=spec.width, voxel_size_m=vs,
        max_distance_m=float(max_distance_m),
        unknown_value=float(unknown_value)))
    # The spec covers the conservative frustum-union AABB; crop to the
    # known content for compact publishing (host, cheap).
    known = img < unknown_value
    if known.any():
        ys, xs = np.nonzero(known.any(axis=1))[0], \
            np.nonzero(known.any(axis=0))[0]
        y0, y1 = int(ys[0]), int(ys[-1]) + 1
        x0, x1 = int(xs[0]), int(xs[-1]) + 1
        img = img[y0:y1, x0:x1]
        spec = SliceSpec(origin_x_m=spec.origin_x_m + x0 * vs,
                         origin_y_m=spec.origin_y_m + y0 * vs,
                         width=x1 - x0, height=y1 - y0,
                         slice_height_m=slice_height_m, voxel_size_m=vs)
    return spec, img


def slice_esdf_2d_device(m, *, max_distance_m: float,
                         unknown_value: float = 1000.0,
                         spec: Optional[SliceSpec] = None
                         ) -> Optional[Tuple[SliceSpec, np.ndarray]]:
    """Slice from the 2D ESDF (EsdfMode 2d; see
    DeviceMapper.update_esdf_2d). The 2D field already encodes the
    min-over-band planar distances."""
    if getattr(m, "esdf_2d", None) is None:
        return None
    origin_b, sq2d, inside2d, observed2d = m.esdf_2d
    vs = m.voxel_size_m
    sq2d_np = np.asarray(sq2d)
    X, Y = sq2d_np.shape
    if spec is None:
        spec = SliceSpec(origin_x_m=float(origin_b[0]) * B * vs,
                         origin_y_m=float(origin_b[1]) * B * vs,
                         width=X, height=Y,
                         slice_height_m=0.0, voxel_size_m=vs)
    dist = np.minimum(np.sqrt(np.minimum(sq2d_np, 1e12)) * vs,
                      max_distance_m)
    dist = np.where(np.asarray(inside2d), -dist, dist)
    img = np.where(np.asarray(observed2d), dist, unknown_value) \
        .astype(np.float32)
    # Slice images are [H=y, W=x] (row-major y) like the camera slicer.
    return spec, img.T


# ----------------------------------------------------------- dense ESDF grid
def esdf_and_gradients_device(m, aabb_min_m, aabb_max_m,
                              default_value: float = 1000.0):
    """Dense f32 grid of signed ESDF + central-difference gradients over an
    AABB (parity: EsdfAndGradients service / Unified3DGrid,
    esdf_and_gradients_conversions.cu:50-125)."""
    from isaac_ros_nvblox_tpu.ops.dense_grid import central_gradients
    vs = m.voxel_size_m
    lo = np.floor(np.asarray(aabb_min_m, np.float64) / vs).astype(np.int64)
    hi = np.ceil(np.asarray(aabb_max_m, np.float64) / vs).astype(np.int64)
    dims = np.maximum(hi - lo, 1)
    grid = _dense_esdf_grid(
        m.state, m.channels["esdf_sq_dist"], m.channels["esdf_is_inside"],
        m.channels["esdf_observed"], jnp.asarray(lo, jnp.int32),
        dims=tuple(int(d) for d in dims), voxel_size_m=vs,
        default_value=float(default_value))
    grads = central_gradients(grid, vs)
    origin_m = lo.astype(np.float64) * vs
    return np.asarray(grid), np.asarray(grads), origin_m


@functools.partial(jax.jit, static_argnames=("dims", "voxel_size_m",
                                             "default_value"))
def _dense_esdf_grid(state, sq, inside, observed, lo_vox, *, dims,
                     voxel_size_m: float, default_value: float):
    cap = sq.shape[0]
    X, Y, Z = dims
    gx = lo_vox[0] + jax.lax.broadcasted_iota(jnp.int32, dims, 0)
    gy = lo_vox[1] + jax.lax.broadcasted_iota(jnp.int32, dims, 1)
    gz = lo_vox[2] + jax.lax.broadcasted_iota(jnp.int32, dims, 2)
    b = jnp.stack([jnp.floor_divide(gx, B), jnp.floor_divide(gy, B),
                   jnp.floor_divide(gz, B)], -1)
    cell = b - state.origin_block
    dims_g = jnp.asarray(state.slot_grid.shape, jnp.int32)
    in_bounds = jnp.all((cell >= 0) & (cell < dims_g), axis=-1)
    safe = jnp.clip(cell, 0, dims_g - 1)
    slot = state.slot_grid[safe[..., 0], safe[..., 1], safe[..., 2]]
    have = in_bounds & (slot >= 0)
    slot_c = jnp.clip(slot, 0, cap - 1).reshape(-1)
    vox = (((gx - b[..., 0] * B) * B + (gy - b[..., 1] * B)) * B
           + (gz - b[..., 2] * B)).reshape(-1)
    sq_v = sq[slot_c, vox].reshape(dims)
    in_v = inside[slot_c, vox].reshape(dims)
    obs_v = observed[slot_c, vox].reshape(dims)
    dist = jnp.sqrt(jnp.minimum(sq_v, 1e12)) * voxel_size_m
    dist = jnp.where(in_v, -dist, dist)
    return jnp.where(have & obs_v, dist, default_value)


# ------------------------------------------------------------------ mesh IO
def update_mesh_layer(m, max_blocks: int = 2048) -> List[Tuple[int, int, int]]:
    """Incremental device mesh -> host MeshLayer blocks; applies removals.

    Returns the list of re-meshed block keys (for budgeted streaming).
    Parity: updateColorMesh + serialized mesh blocks + cleared-block
    removals (layer_publishing.cpp:675-826)."""
    import jax
    use_pallas = jax.default_backend() == "tpu"
    cap = m.capacity
    meshed = []
    if use_pallas:
        from isaac_ros_nvblox_tpu.native import compact_mesh_blocks
        from isaac_ros_nvblox_tpu.ops.mesh_pallas import local_to_world_verts
        verts, colors, mask, bidx, slots = m.update_mesh_dirty_device(
            max_blocks=max_blocks, use_pallas=True, return_slots=True)
        # The dirty compaction puts live rows in a prefix; one scalar
        # readback bounds the device->host transfer to the live rows
        # instead of the full max_blocks padding (publish cadence: the
        # sync is fine, the bandwidth is the cost).
        n_live = int(jnp.sum((slots < m.capacity).astype(jnp.int32)))
        verts = verts[:n_live]
        mask = mask[:n_live]
        bidx = bidx[:n_live]
        slots = slots[:n_live]
        if colors is not None:
            colors = colors[:n_live]
        world, _ = local_to_world_verts(verts, bidx, m.voxel_size_m)
        world = np.asarray(world)          # [n,3,16,512]
        mask_np = np.asarray(mask)         # [n,16,512]
        cols = (np.asarray(colors.astype(jnp.float32))
                if colors is not None else None)
        bidx_np = np.asarray(bidx)
        slots_np = np.asarray(slots)
        # Native CSR compaction (one C call over the whole batch) replaces
        # the old per-block numpy mask-indexing loop — this runs at publish
        # cadence and the per-block Python cost dominated it.
        offsets, v_flat, c_flat = compact_mesh_blocks(world, cols, mask_np)
        for i in range(bidx_np.shape[0]):
            if slots_np[i] >= cap:
                continue  # padding row
            key = tuple(int(v) for v in bidx_np[i])
            a, b = int(offsets[i]), int(offsets[i + 1])
            v = v_flat[a:b].reshape(-1, 3, 3)
            if c_flat is not None and v.shape[0]:
                c = c_flat[a:b].reshape(-1, 3, 3)
            else:
                c = np.full_like(v, 190.0)
            m.mesh_layer.update_block(key, v, c)
            meshed.append(key)
        # Blocks whose batch rows had no surface crossing: drop stale
        # entries (the surface compaction stage no longer emits sentinel
        # rows for them; see _mesh_dirty_fused). They still carry fresh
        # voxel data (free-space carving, decay), so they join the
        # re-serialized list below for the voxel-layer publishers; the
        # mesh streamer filters them out via `& current`.
        cleared = m.take_mesh_clear_keys()
        # The clear log ACCUMULATES across fused mesh updates between
        # publishes; a stale no-crossing entry from an earlier update must
        # not pop a block that re-gained a crossing and was serialized in
        # THIS drain (within one update the clear set is disjoint from the
        # meshed set, so only stale cross-update entries are skipped).
        meshed_set = set(meshed)
        for key in cleared:
            if key not in meshed_set:
                m.mesh_layer.blocks.pop(key, None)
        meshed.extend(k for k in cleared if k not in meshed_set)
    else:
        # CPU backend: the XLA marching-cubes path (interpret-mode Pallas
        # is far too slow for tests/debugging).
        verts, colors, valid, bidx, slots = m.update_mesh_dirty_device(
            max_blocks=max_blocks, use_pallas=False, return_slots=True)
        verts = np.asarray(verts)          # [N,512,5,3,3] world meters
        colors = np.asarray(colors)
        valid = np.asarray(valid)          # [N,512,5]
        bidx_np = np.asarray(bidx)
        slots_np = np.asarray(slots)
        for i in range(bidx_np.shape[0]):
            if slots_np[i] >= cap:
                continue
            key = tuple(int(v) for v in bidx_np[i])
            mk = valid[i].reshape(-1)
            v = verts[i].reshape(-1, 3, 3)[mk]
            c = colors[i].reshape(-1, 3, 3)[mk]
            m.mesh_layer.update_block(key, v, c)
            meshed.append(key)
    removed = take_removed_blocks(m)
    if removed:
        m.mesh_layer.remove_blocks(removed)
    # The removal log is consume-once; record what THIS drain saw so other
    # consumers (the node's voxel-layer publisher) can forward it too.
    m.last_removed_keys = removed
    m.last_meshed_keys = meshed
    return meshed


# ------------------------------------------------------------------- map IO
def save_map_device(m, path) -> None:
    """Serialize the DeviceMapper's live blocks + channels (npz)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    live = np.asarray(wg.live_slot_mask(m.state))
    slots = np.nonzero(live)[0]
    bidx = np.asarray(m.state.block_index_of_slot)[slots]
    payload = {"block_indices": bidx}
    for name, arr in m.channels.items():
        payload[f"channel__{name}"] = np.asarray(arr)[slots]
    meta = {
        "format_version": FORMAT_VERSION,
        "voxel_size_m": m.voxel_size_m,
        "projective_layer": m.projective_layer.value,
        "channels": sorted(m.channels.keys()),
    }
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    # Write through a file handle: np.savez_compressed(path) silently
    # appends ".npz" to non-.npz paths, breaking the .nvblx save/load
    # roundtrip the node services expose (save_map service parity).
    with open(path, "wb") as f:
        np.savez_compressed(f, **payload)


def load_map_device(m, path) -> int:
    """Load a saved device map into a compatible DeviceMapper (clears the
    current contents). Returns the number of blocks loaded."""
    path = Path(path)
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta_json"].tobytes()).decode("utf-8"))
        if meta["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"unsupported map format {meta['format_version']}")
        if abs(meta["voxel_size_m"] - m.voxel_size_m) > 1e-9:
            raise ValueError("voxel size mismatch")
        if sorted(m.channels.keys()) != meta["channels"]:
            raise ValueError("channel mismatch")
        bidx = data["block_indices"].astype(np.int64)
        chans = {name: data[f"channel__{name}"] for name in meta["channels"]}
    cfg = m.world_config
    n = bidx.shape[0]
    if n > cfg.capacity:
        raise ValueError("map larger than pool capacity")
    # Rebuild allocator state on the host, then device_put.
    origin = np.asarray(cfg.origin_block, np.int64)
    cells = bidx - origin
    ok = np.all((cells >= 0) & (cells < np.asarray(cfg.dims)), axis=1)
    cells = cells[ok]
    bidx = bidx[ok]
    n = bidx.shape[0]
    slot_grid = np.full(cfg.dims, -1, np.int32)
    slot_grid[cells[:, 0], cells[:, 1], cells[:, 2]] = np.arange(n)
    bidx_full = np.zeros((cfg.capacity, 3), np.int32)
    bidx_full[:n] = bidx
    m.state = wg.WorldGridState(
        slot_grid=jnp.asarray(slot_grid),
        block_index_of_slot=jnp.asarray(bidx_full),
        alloc_count=jnp.asarray(n, jnp.int32),
        overflow_count=jnp.zeros((), jnp.int32),
        origin_block=jnp.asarray(cfg.origin_block, jnp.int32),
        free_stack=jnp.zeros((cfg.capacity,), jnp.int32),
        free_count=jnp.zeros((), jnp.int32))
    for name, host in chans.items():
        arr = np.zeros((cfg.capacity,) + host.shape[1:], host.dtype)
        arr[:n] = host[ok]
        m.channels[name] = jnp.asarray(arr)
    m.dirty = jnp.zeros((cfg.capacity,), jnp.bool_).at[:n].set(True)
    m.esdf_dirty = jnp.zeros((cfg.capacity,), jnp.bool_).at[:n].set(True)
    m._esdf_has_full = False
    m._aabb_lo = m._aabb_hi = None
    m._dirty_lo = m._dirty_hi = None
    m._region_unknown = True
    m._count_cache = n
    m.mesh_layer.blocks.clear()
    return n
