"""EsdfSlicer: ESDF layer -> 2D distance images and occupancy grids.

Reference: nvblox `EsdfSlicer` — `sliceLayerToDistanceImage`,
`sliceLayersToCombinedDistanceImage` (min-combine of static+dynamic layers),
and `occupancyGridFromSliceImage` trinarization
(call-sites nvblox_node.cpp:135-150, 836-844, 917-919; CUDA kernels in
nvblox_ros/src/lib/conversions/esdf_slice_conversions.cu:33-166).

TPU-native design: the slice is a dense 2D image over the AABB of allocated
blocks. For each output pixel we locate the containing block via a dense
(block-grid -> slot) lookup image built on the host from the BlockTable
(static shape per AABB bucket), then gather the voxel at the slice height —
one fused jit, no hash probes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE, block_size_m

B = VOXELS_PER_SIDE

# Occupancy grid trinarization values (Nav2/ROS convention, matching
# nvblox's occupancy grid output): -1 unknown, 0 free, 100 occupied.
OCC_UNKNOWN = -1
OCC_FREE = 0
OCC_OCCUPIED = 100


@dataclasses.dataclass(frozen=True)
class SliceSpec:
    """Geometry of a 2D slice: origin (meters), shape, height."""
    origin_x_m: float
    origin_y_m: float
    width: int   # pixels in x
    height: int  # pixels in y
    slice_height_m: float
    voxel_size_m: float


def compute_slice_spec(table, voxel_size_m: float, slice_height_m: float,
                       padding_px: int = 0) -> Optional[SliceSpec]:
    """Slice covering the AABB of allocated blocks (None if map empty)."""
    aabb = table.aabb_of_allocated_blocks(voxel_size_m)
    if aabb is None:
        return None
    lo, hi = aabb
    width = int(round((hi[0] - lo[0]) / voxel_size_m)) + 2 * padding_px
    height = int(round((hi[1] - lo[1]) / voxel_size_m)) + 2 * padding_px
    return SliceSpec(
        origin_x_m=float(lo[0]) - padding_px * voxel_size_m,
        origin_y_m=float(lo[1]) - padding_px * voxel_size_m,
        width=width, height=height,
        slice_height_m=slice_height_m, voxel_size_m=voxel_size_m)


def build_slot_image(table, spec: SliceSpec) -> np.ndarray:
    """Host: `i32[height, width]` slot of the block containing each pixel at
    the slice height (-1 if unallocated)."""
    bs = block_size_m(spec.voxel_size_m)
    bz = int(np.floor(spec.slice_height_m / bs))
    xs = spec.origin_x_m + (np.arange(spec.width) + 0.5) * spec.voxel_size_m
    ys = spec.origin_y_m + (np.arange(spec.height) + 0.5) * spec.voxel_size_m
    bxs = np.floor(xs / bs).astype(np.int64)
    bys = np.floor(ys / bs).astype(np.int64)
    ub_x, inv_x = np.unique(bxs, return_inverse=True)
    ub_y, inv_y = np.unique(bys, return_inverse=True)
    slot_of = np.full((ub_y.size, ub_x.size), -1, np.int32)
    for iy, by in enumerate(ub_y.tolist()):
        for ix, bx in enumerate(ub_x.tolist()):
            slot_of[iy, ix] = table.slot_of((bx, by, bz))
    return slot_of[np.ix_(inv_y, inv_x)]


@functools.partial(jax.jit, static_argnames=("unknown_value",))
def slice_distance_image(esdf_sq_dist, esdf_is_inside, esdf_observed,
                         slot_image, origin_voxel_xy_mod, voxel_z,
                         *, voxel_size_m, max_distance_m,
                         unknown_value: float = 1000.0):
    """Gather the signed metric distance at the slice height per pixel.

    Args:
      esdf_* : pool channels.
      slot_image: `i32[H, W]` from build_slot_image (-1 = no block).
      voxel_z: scalar i32 — local z voxel index at the slice height.

    Unknown (unallocated or unobserved) pixels get `unknown_value`
    (parity: DistanceMapSlice.unknown_value, esdf_slice_conversions.cu:81-109).
    """
    cap = esdf_sq_dist.shape[0]
    H, W = slot_image.shape
    # Local voxel x/y per pixel from pixel's world position mod block.
    # Pixel i maps to global voxel index origin_vox + i; local = mod 8.
    # The caller bakes origin offsets into these iotas:
    lx = jnp.mod(jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
                 + origin_voxel_xy_mod[0], B)
    ly = jnp.mod(jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
                 + origin_voxel_xy_mod[1], B)
    vox_lin = (lx * B + ly) * B + voxel_z

    slot = jnp.clip(slot_image, 0, cap - 1)
    sq = esdf_sq_dist[slot.reshape(-1), vox_lin.reshape(-1)].reshape(H, W)
    inside = esdf_is_inside[slot.reshape(-1), vox_lin.reshape(-1)].reshape(H, W)
    observed = esdf_observed[slot.reshape(-1), vox_lin.reshape(-1)].reshape(H, W)

    dist = jnp.sqrt(jnp.minimum(sq, 1e12)) * voxel_size_m
    dist = jnp.minimum(dist, max_distance_m)
    dist = jnp.where(inside, -dist, dist)
    known = (slot_image >= 0) & observed
    return jnp.where(known, dist, unknown_value)


def slice_esdf_layer(pool, table, *, voxel_size_m: float,
                     slice_height_m: float, max_distance_m: float,
                     unknown_value: float = 1000.0,
                     spec: Optional[SliceSpec] = None
                     ) -> Optional[Tuple[SliceSpec, np.ndarray]]:
    """Full pipeline: spec + slot image + device gather -> (spec, f32[H, W])."""
    if spec is None:
        spec = compute_slice_spec(table, voxel_size_m, slice_height_m)
    if spec is None:
        return None
    slot_image = build_slot_image(table, spec)
    gz = int(np.floor(spec.slice_height_m / voxel_size_m))
    vz = gz % B
    ox = int(np.floor(spec.origin_x_m / voxel_size_m + 0.5)) % B
    oy = int(np.floor(spec.origin_y_m / voxel_size_m + 0.5)) % B
    img = slice_distance_image(
        pool["esdf_sq_dist"], pool["esdf_is_inside"], pool["esdf_observed"],
        jnp.asarray(slot_image), jnp.asarray([ox, oy], jnp.int32),
        jnp.int32(vz), voxel_size_m=jnp.float32(voxel_size_m),
        max_distance_m=jnp.float32(max_distance_m),
        unknown_value=float(unknown_value))
    return spec, np.asarray(img)


def combine_distance_images(slices, unknown_value: float = 1000.0) -> np.ndarray:
    """Min-combine multiple aligned distance images (unknown propagates only
    if unknown in all) — parity: sliceLayersToCombinedDistanceImage."""
    out = None
    for img in slices:
        if out is None:
            out = img.copy()
        else:
            known_any = (out != unknown_value) | (img != unknown_value)
            combined = np.minimum(
                np.where(out == unknown_value, np.inf, out),
                np.where(img == unknown_value, np.inf, img))
            out = np.where(known_any, combined, unknown_value).astype(np.float32)
    return out


def occupancy_grid_from_slice(distance_img: np.ndarray,
                              free_threshold_m: float,
                              unknown_value: float = 1000.0) -> np.ndarray:
    """Trinarize a distance slice into a Nav2-style occupancy grid `i8[H, W]`.

    Parity: occupancyGridFromSliceImage (nvblox_node.cpp:917-919): distance
    >= threshold -> free, < threshold -> occupied, unknown stays unknown.
    """
    grid = np.full(distance_img.shape, OCC_UNKNOWN, np.int8)
    known = distance_img != unknown_value
    grid[known & (distance_img >= free_threshold_m)] = OCC_FREE
    grid[known & (distance_img < free_threshold_m)] = OCC_OCCUPIED
    return grid
