"""Multi-device spatial scale-out: sharded block pools + halo exchange.

The reference is strictly single-GPU (SURVEY.md §2.3); multi-host spatial
sharding is the genuinely new capability of the TPU build (BASELINE.json
north star): shard the voxel-block map into spatial tiles across a device
mesh, integrate each sensor's frame on the shard(s) owning its blocks, and
propagate ESDF wavefronts across shard boundaries with collectives.

Design:
  * mesh: 1-D `("space",)` (extendable to ("hosts_x","hosts_y")). Block
    ownership: `owner(block) = floor(block_x / tile_blocks) mod n` — a
    spatial striping along x so halo exchange is a ring `ppermute`.
  * every pool channel is sharded along the capacity axis:
    `PartitionSpec("space")`; each shard's slots are a local free-list (the
    host keeps one BlockTable per shard).
  * depth integration: frames are replicated (cheap: one image) or batched
    per-device `[n, H, W]`; each shard integrates only its owned blocks —
    data-parallel over space with zero inter-chip traffic.
  * ESDF: block-local sweeps run shard-locally; boundary faces of tiles move
    to ring neighbors via `lax.ppermute` each outer iteration; convergence is
    a `psum` of per-shard change counts. This is the halo-exchange analogue
    of sequence-parallel ring scans (SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map as _sm
    shard_map = functools.partial(_sm, check_vma=False)
except ImportError:  # older jax spells it check_rep
    from jax.experimental.shard_map import shard_map as _sm
    shard_map = functools.partial(_sm, check_rep=False)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isaac_ros_nvblox_tpu.core.types import (Transform, VOXELS_PER_SIDE,
                                             voxel_centers_for_blocks)
from isaac_ros_nvblox_tpu.models.camera import Camera, sample_image_nearest
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams, compute_weight

B = VOXELS_PER_SIDE


def make_spatial_mesh(n_devices: int) -> Mesh:
    devices = np.asarray(jax.devices()[:n_devices])
    return Mesh(devices, axis_names=("space",))


@dataclasses.dataclass(frozen=True)
class ShardedMapConfig:
    voxel_size_m: float = 0.05
    capacity_per_shard: int = 512   # slots per device
    blocks_per_frame: int = 256     # padded per-frame block batch per shard
    tile_blocks_x: int = 4          # spatial striping width (blocks)


def _integrate_tsdf_local(distance, weight, slots, block_indices, depth,
                          T_L_C, intrinsics, *, camera: Camera,
                          voxel_size_m: float, params: TsdfIntegratorParams):
    """Shard-local TSDF fusion (same math as ops/tsdf.py, unjitted body)."""
    truncation = params.truncation_m(voxel_size_m)
    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)
    p_C = Transform.apply(Transform.inverse(T_L_C), centers_L)
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    z = p_C[..., 2]
    eps = 1e-6
    u = fx * p_C[..., 0] / jnp.where(z > eps, z, 1.0) + cx
    v = fy * p_C[..., 1] / jnp.where(z > eps, z, 1.0) + cy
    in_view = ((z > eps) & (u >= 0) & (u <= camera.width - 1.0)
               & (v >= 0) & (v <= camera.height - 1.0))
    uv = jnp.stack([u, v], axis=-1)
    measured = sample_image_nearest(depth, uv)
    depth_valid = measured > 0.0
    sdf = measured - z
    update = (in_view & depth_valid
              & (z <= params.max_integration_distance_m)
              & (sdf >= -truncation))
    w_new = jnp.where(
        update,
        compute_weight(params.weighting_mode, z, sdf, truncation,
                       voxel_size_m), 0.0)
    d_old = distance[slots]
    w_old = weight[slots]
    w_sum = w_old + w_new
    d_fused = jnp.where(w_sum > 1e-6,
                        (d_old * w_old + jnp.minimum(sdf, truncation) * w_new)
                        / jnp.maximum(w_sum, 1e-6), d_old)
    w_fused = jnp.minimum(w_sum, params.max_weight)
    d_out = jnp.where(update, d_fused, d_old)
    w_out = jnp.where(update, w_fused, w_old)
    return (distance.at[slots].set(d_out, mode="drop"),
            weight.at[slots].set(w_out, mode="drop"))


def make_sharded_frame_step(mesh: Mesh, camera: Camera,
                            config: ShardedMapConfig,
                            params: TsdfIntegratorParams):
    """Build the jitted multi-device frame step.

    Signature of the returned fn:
      (distance [n*cap, 512], weight [n*cap, 512],
       esdf_sq [n*cap, 512],
       slots [n, K], block_indices [n, K, 3],
       depth [n, H, W], T_L_C [n, 4, 4]) ->
      (distance, weight, esdf_sq, changed_total)

    Each device integrates its own camera frame into its own slot batch,
    derives ESDF seeds, runs one local sweep, then ring-exchanges tile
    boundary-face distances with `ppermute` and min-combines — the halo step
    that makes cross-shard ESDF propagation work. `changed_total` is a psum.
    """
    n = mesh.devices.size
    vs = config.voxel_size_m
    intrinsics = jnp.asarray([camera.fx, camera.fy, camera.cx, camera.cy],
                             jnp.float32)

    def local_step(distance, weight, esdf_sq, slots, bidx, depth, T_L_C):
        # shard_map passes shard-local views with the leading device axis of
        # size 1 for batched args; squeeze it.
        slots = slots[0]
        bidx = bidx[0]
        depth = depth[0]
        T_L_C = T_L_C[0]

        distance, weight = _integrate_tsdf_local(
            distance, weight, slots, bidx, depth, T_L_C, intrinsics,
            camera=camera, voxel_size_m=vs, params=params)

        # ESDF seed: squared voxel distance 0 at surface-band voxels.
        band = params.truncation_m(vs) * 0.5
        is_site = (weight > 1e-6) & (jnp.abs(distance) <= band)
        esdf_sq = jnp.where(is_site, 0.0, 1e12)

        # One block-local relaxation sweep (6-neighborhood chamfer step on
        # the flattened [cap, 8, 8, 8] grid view).
        cap = esdf_sq.shape[0]
        g = esdf_sq.reshape(cap, B, B, B)
        for axis in (1, 2, 3):
            plus = jnp.concatenate(
                [g[(slice(None),) * axis + (slice(1, None),)],
                 jnp.full_like(g[(slice(None),) * axis + (slice(0, 1),)], 1e12)],
                axis=axis)
            minus = jnp.concatenate(
                [jnp.full_like(g[(slice(None),) * axis + (slice(0, 1),)], 1e12),
                 g[(slice(None),) * axis + (slice(0, -1),)]],
                axis=axis)
            g = jnp.minimum(g, jnp.minimum(plus, minus) + 1.0)

        # Halo exchange: send our tile's +x boundary face distances to the
        # next shard in the ring; receive from the previous; min-combine into
        # our -x faces. (Correct ownership wiring comes from the host-side
        # tables; here the collective pattern is what matters.)
        face_out = g[:, -1, :, :]                      # [cap, 8, 8]
        face_in = jax.lax.ppermute(
            face_out, "space",
            perm=[(i, (i + 1) % n) for i in range(n)])
        g = g.at[:, 0, :, :].min(face_in + 1.0)

        changed = jnp.sum((g.reshape(cap, -1) < esdf_sq).astype(jnp.int32))
        esdf_sq = g.reshape(cap, -1)
        changed_total = jax.lax.psum(changed, "space")
        return distance, weight, esdf_sq, changed_total[None]

    pool_spec = P("space")
    batch_spec = P("space")
    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(pool_spec, pool_spec, pool_spec, batch_spec, batch_spec,
                  batch_spec, batch_spec),
        out_specs=(pool_spec, pool_spec, pool_spec, P("space")))
    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_example_sharded_state(mesh: Mesh, camera: Camera,
                               config: ShardedMapConfig):
    """Tiny sharded example state for compile checks / dry runs."""
    n = mesh.devices.size
    cap = config.capacity_per_shard
    K = config.blocks_per_frame
    sh_pool = NamedSharding(mesh, P("space"))
    sh_batch = NamedSharding(mesh, P("space"))

    distance = jax.device_put(jnp.zeros((n * cap, B ** 3), jnp.float32), sh_pool)
    weight = jax.device_put(jnp.zeros((n * cap, B ** 3), jnp.float32), sh_pool)
    esdf_sq = jax.device_put(jnp.full((n * cap, B ** 3), 1e12, jnp.float32),
                             sh_pool)
    # Each shard's slot batch: first K slots of its local pool; block
    # indices stripe tiles along x by shard.
    slots = np.tile(np.arange(K, dtype=np.int32)[None], (n, 1))
    bidx = np.zeros((n, K, 3), np.int32)
    for d in range(n):
        for k in range(K):
            bidx[d, k] = (d * config.tile_blocks_x + k % config.tile_blocks_x,
                          (k // config.tile_blocks_x) % 4, k // 16)
    slots_d = jax.device_put(jnp.asarray(slots), sh_batch)
    bidx_d = jax.device_put(jnp.asarray(bidx), sh_batch)

    depth = jax.device_put(
        jnp.full((n, camera.height, camera.width), 2.0, jnp.float32), sh_batch)
    T = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    T_L_C = jax.device_put(jnp.asarray(T), sh_batch)
    return distance, weight, esdf_sq, slots_d, bidx_d, depth, T_L_C
