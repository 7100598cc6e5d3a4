"""ViewCalculator: which blocks does a sensor view touch?

Reference: nvblox's `ViewCalculator` raycasts subsampled depth pixels on the
GPU and inserts touched block indices into the hash set
(SURVEY.md §2.1 "ViewCalculator"; params `raycast_subsampling_factor`,
`workspace_bounds_*` at nvblox_ros/src/lib/mapper_initialization.cpp:186-196).

TPU-native design: instead of building a hash set, the touch criterion is
evaluated **densely per cell of a boolean grid** over the view's bounding
box (statically shaped from `max_integration_distance`): project each block
center, compare against a max-depth pyramid of the frame — reduce_windows
and gathers only, zero scatters (TPU scatters serialize). The device
allocator (core/world_grid.py) consumes the grid directly; the legacy host
path reads the ~50 KB bitmap instead.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import Transform, block_size_m
from isaac_ros_nvblox_tpu.models.camera import Camera


class WorkspaceBoundsType(enum.Enum):
    """Parity with mapper_initialization.cpp workspace-bounds enum."""
    UNBOUNDED = "unbounded"
    HEIGHT_BOUNDS = "height_bounds"
    BOUNDING_BOX = "bounding_box"


@dataclasses.dataclass(frozen=True)
class ViewCalculatorParams:
    raycast_subsampling_factor: int = 4
    workspace_bounds_type: WorkspaceBoundsType = WorkspaceBoundsType.UNBOUNDED
    workspace_bounds_min_corner_m: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    workspace_bounds_max_corner_m: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def _grid_radius_blocks(max_distance_m: float, voxel_size_m: float) -> int:
    bs = block_size_m(voxel_size_m)
    return int(np.ceil(max_distance_m / bs)) + 1


@functools.lru_cache(maxsize=None)
def _camera_grid_geometry(camera: Camera, voxel_size_m: float,
                          max_distance_m: float) -> Tuple[float, int]:
    """Static per-camera geometry of the touch test's support region.

    Everything touched_block_grid can mark lies in the camera frustum
    inflated laterally by half a block diagonal (the in_view half_diag
    slack), reaching max_distance + bs in depth, plus the 1.5*bs
    near-camera ball. That region's minimal enclosing sphere sits ON the
    optical axis — centering the G^3 cell grid there instead of on the
    camera origin shrinks G (the naive ball around the camera wastes the
    entire hemisphere behind the sensor).

    Returns (h_m, R_blocks): grid center = camera origin + h_m * optical
    axis; grid half-extent R_blocks cells.
    """
    bs = block_size_m(voxel_size_m)
    D = max_distance_m + bs
    m = bs * float(np.sqrt(3.0)) / 4.0   # lateral inflation (half_diag cap)
    tu = max(camera.cx, camera.width - 1.0 - camera.cx) / camera.fx
    tv = max(camera.cy, camera.height - 1.0 - camera.cy) / camera.fy
    b = 1.5 * bs   # near-camera ball (touched |= dist(center, cam) < 1.5*bs)
    pts = [(0.0, 0.0, -b), (b, 0.0, 0.0), (-b, 0.0, 0.0),
           (0.0, b, 0.0), (0.0, -b, 0.0)]
    for su in (-1.0, 1.0):
        for sv in (-1.0, 1.0):
            pts.append((su * (m + b), sv * (m + b), 0.0))
            pts.append((su * (D * tu + m), sv * (D * tv + m), D))
    pts = np.asarray(pts)

    def rad(h):
        return float(np.max(np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2
                                    + (pts[:, 2] - h) ** 2)))

    lo, hi = 0.0, D   # rad(h) is convex (max of convex) -> ternary search
    for _ in range(80):
        m1, m2 = lo + (hi - lo) / 3.0, hi - (hi - lo) / 3.0
        if rad(m1) < rad(m2):
            hi = m2
        else:
            lo = m1
    h = 0.5 * (lo + hi)
    return h, int(np.ceil(rad(h) / bs)) + 1


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "max_distance_m", "subsample",
                     "truncation_m"))
def touched_block_grid(depth, T_L_C, *, camera: Camera, voxel_size_m: float,
                       max_distance_m: float, truncation_m: float,
                       subsample: int = 1):
    """Mark blocks touched by the depth frame — dense, scatter-free.

    Returns (grid bool[G,G,G], origin_block i32[3]) where grid[i,j,k] marks
    block `origin_block + (i,j,k)`.

    TPU-native formulation: instead of raycasting pixels and scattering
    marks (the reference's GPU approach — hundreds of thousands of
    serializing scatter updates on TPU), evaluate the touch criterion
    **densely per grid cell**: a block is touched iff its center projects
    into the (footprint-inflated) image and its depth is in front of the
    maximum valid measured depth over the block's pixel footprint, plus the
    truncation band. The footprint max comes from a max-pool depth pyramid,
    so the whole thing is reduce_windows + one gather per pyramid level —
    zero scatters. Produces a slightly conservative superset of the raycast
    marking, which only affects allocation (harmless).

    `subsample` is accepted for API parity with the raycast version but
    unused (the dense test needs no subsampling).
    """
    del subsample  # unused in the dense formulation
    bs = block_size_m(voxel_size_m)
    h_m, R = _camera_grid_geometry(camera, voxel_size_m, max_distance_m)
    G = 2 * R + 1

    cam_origin = T_L_C[:3, 3]
    grid_center = cam_origin + T_L_C[:3, 2] * h_m
    origin_block = jnp.floor(grid_center / bs).astype(jnp.int32) - R

    # Max-valid-depth coarse images (invalid pixels carry 0, never raise
    # max). Only two coarse levels are needed: the touch test samples max
    # depth over a window covering the block footprint, and per-element
    # gathers are slow on TPU — so sampling is done as one-hot matmuls
    # against small flattened max-images (MXU-friendly, zero gathers).
    d_valid = jnp.where(jnp.isfinite(depth) & (depth > 0.0), depth, 0.0)
    lvl_a, lvl_b = 5, 6  # cell sizes 32 px and 64 px
    coarse = {}
    img = d_valid
    for lvl in range(lvl_b + 1):
        if lvl in (lvl_a, lvl_b):
            # Centered 3x3 overlap max: a sample at the containing cell
            # covers +- one full cell, guaranteeing footprint coverage for
            # footprints up to 2 * cell size regardless of alignment.
            coarse[lvl] = jax.lax.reduce_window(
                img, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
        img = jax.lax.reduce_window(
            img, -jnp.inf, jax.lax.max, (2, 2), (2, 2), "SAME")
    global_max = jnp.max(d_valid)

    # Dense cell centers in the layer frame -> camera frame.
    ii = jax.lax.broadcasted_iota(jnp.float32, (G, G, G), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (G, G, G), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (G, G, G), 2)
    centers = (jnp.stack([ii, jj, kk], -1)
               + origin_block.astype(jnp.float32) + 0.5) * bs
    p_C = Transform.apply(Transform.inverse(T_L_C), centers.reshape(-1, 3))
    z = p_C[:, 2]
    eps = 1e-6
    u = camera.fx * p_C[:, 0] / jnp.where(z > eps, z, 1.0) + camera.cx
    v = camera.fy * p_C[:, 1] / jnp.where(z > eps, z, 1.0) + camera.cy

    # Pixel footprint of a block at this depth; inflate the in-view check so
    # blocks partially inside the frustum are kept (inflation by the block's
    # projected *half diagonal* — anything farther out cannot intersect).
    f_max = max(camera.fx, camera.fy)
    footprint = f_max * bs / jnp.maximum(z, eps)
    half_diag = footprint * float(np.sqrt(3.0) / 2.0) * 0.5
    in_view = ((z > eps)
               & (u >= -half_diag) & (u <= camera.width - 1.0 + half_diag)
               & (v >= -half_diag) & (v <= camera.height - 1.0 + half_diag))

    # Sample the footprint's max depth via one-hot matmuls against the two
    # coarse max-images. Window coverage: level a (2x32 px) is valid for
    # footprints <= 32 px, level b (2x64) for <= 64 px; nearer blocks (huge
    # footprints) conservatively use the frame's global max depth.
    def onehot_sample(img_l, lvl):
        H_l, W_l = img_l.shape
        cu = jnp.clip((u / (2 ** lvl)).astype(jnp.int32), 0, W_l - 1)
        cv = jnp.clip((v / (2 ** lvl)).astype(jnp.int32), 0, H_l - 1)
        cell = cv * W_l + cu                               # [M]
        iota = jnp.arange(H_l * W_l, dtype=jnp.int32)      # [C]
        onehot = (cell[:, None] == iota[None, :]).astype(jnp.bfloat16)
        return (onehot @ img_l.reshape(-1).astype(jnp.bfloat16)) \
            .astype(jnp.float32)

    maxd_a = onehot_sample(coarse[lvl_a], lvl_a)
    maxd_b = onehot_sample(coarse[lvl_b], lvl_b)
    maxd = jnp.where(footprint <= 2.0 ** (lvl_a + 1), maxd_a,
                     jnp.where(footprint <= 2.0 ** (lvl_b + 1), maxd_b,
                               global_max))

    # Touched: in the (inflated) frustum, in front of the measured surface
    # plus truncation (with a half-block-diagonal safety margin), in range.
    margin = truncation_m + bs * float(np.sqrt(3.0) / 2.0)
    touched = in_view & (z <= max_distance_m + bs) \
        & (z <= maxd + margin) & (maxd > 0.0)
    # Blocks at the camera origin are always touched (rays start there, even
    # though their centers may sit behind the image plane).
    near_camera = jnp.linalg.norm(centers.reshape(-1, 3) - cam_origin,
                                  axis=-1) < 1.5 * bs
    touched = touched | near_camera
    return touched.reshape(G, G, G), origin_block


def footprint_depth_minmax(depth, u, v, footprint):
    """Per-block (min, max) valid measured depth over the projected pixel
    footprint — the zero-gather coarse-pyramid sampling of
    touched_block_grid, with a min pyramid added (invalid pixels never
    lower the min / raise the max). Conservative: the 3x3-overlap windows
    are supersets of the footprint, so min <= true min, max >= true max.
    Blocks whose footprint exceeds the largest window fall back to the
    frame's global min/max. Out-of-view samples clamp to the border
    (conservative for callers that also frustum-test).

    Returns (mind f32[N], maxd f32[N]); maxd == 0 where the window holds no
    valid pixel.
    """
    big = jnp.float32(1e6)
    d_max = jnp.where(jnp.isfinite(depth) & (depth > 0.0), depth, 0.0)
    d_min = jnp.where(jnp.isfinite(depth) & (depth > 0.0), depth, big)
    lvl_a, lvl_b = 5, 6
    coarse_max, coarse_min = {}, {}
    img_max, img_min = d_max, d_min
    for lvl in range(lvl_b + 1):
        if lvl in (lvl_a, lvl_b):
            coarse_max[lvl] = jax.lax.reduce_window(
                img_max, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
            coarse_min[lvl] = jax.lax.reduce_window(
                img_min, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME")
        img_max = jax.lax.reduce_window(
            img_max, -jnp.inf, jax.lax.max, (2, 2), (2, 2), "SAME")
        img_min = jax.lax.reduce_window(
            img_min, jnp.inf, jax.lax.min, (2, 2), (2, 2), "SAME")
    global_max = jnp.max(d_max)
    global_min = jnp.min(d_min)

    def onehot_sample(img_l, lvl):
        H_l, W_l = img_l.shape
        cu = jnp.clip((u / (2 ** lvl)).astype(jnp.int32), 0, W_l - 1)
        cv = jnp.clip((v / (2 ** lvl)).astype(jnp.int32), 0, H_l - 1)
        cell = cv * W_l + cu
        iota = jnp.arange(H_l * W_l, dtype=jnp.int32)
        onehot = (cell[:, None] == iota[None, :]).astype(jnp.bfloat16)
        return (onehot @ img_l.reshape(-1).astype(jnp.bfloat16)) \
            .astype(jnp.float32)

    maxd = jnp.where(footprint <= 2.0 ** (lvl_a + 1),
                     onehot_sample(coarse_max[lvl_a], lvl_a),
                     jnp.where(footprint <= 2.0 ** (lvl_b + 1),
                               onehot_sample(coarse_max[lvl_b], lvl_b),
                               global_max))
    mind = jnp.where(footprint <= 2.0 ** (lvl_a + 1),
                     onehot_sample(coarse_min[lvl_a], lvl_a),
                     jnp.where(footprint <= 2.0 ** (lvl_b + 1),
                               onehot_sample(coarse_min[lvl_b], lvl_b),
                               global_min))
    return mind, maxd


@functools.partial(
    jax.jit,
    static_argnames=("lidar", "voxel_size_m", "max_distance_m",
                     "truncation_m"))
def touched_block_grid_lidar(range_image, T_L_S, *, lidar,
                             voxel_size_m: float, max_distance_m: float,
                             truncation_m: float):
    """Lidar variant of touched_block_grid: dense, scatter-free.

    Same design as the camera version (evaluate the touch criterion per
    grid cell against max-range coarse images of the scan) with the
    spherical projection model (parity: the reference's lidar
    ViewCalculator path, pointcloud_conversions.cu:86-149).
    """
    bs = block_size_m(voxel_size_m)
    R = _grid_radius_blocks(max_distance_m, voxel_size_m)
    G = 2 * R + 1
    rows, cols = range_image.shape

    origin = T_L_S[:3, 3]
    origin_block = jnp.floor(origin / bs).astype(jnp.int32) - R

    r_valid = jnp.where(jnp.isfinite(range_image) & (range_image > 0.0),
                        range_image, 0.0)
    # Coarse max-range images at two (row, col) pool levels with a 3x3
    # overlap so a containing-cell sample covers +- one full cell.
    def coarse(pr, pc):
        pooled = jax.lax.reduce_window(r_valid, -jnp.inf, jax.lax.max,
                                       (pr, pc), (pr, pc), "SAME")
        return jax.lax.reduce_window(pooled, -jnp.inf, jax.lax.max,
                                     (3, 3), (1, 1), "SAME")
    lvl_a = (8, 32)
    lvl_b = (32, 128)
    coarse_a = coarse(*lvl_a)
    coarse_b = coarse(*lvl_b)
    global_max = jnp.max(r_valid)

    ii = jax.lax.broadcasted_iota(jnp.float32, (G, G, G), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (G, G, G), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (G, G, G), 2)
    centers = (jnp.stack([ii, jj, kk], -1)
               + origin_block.astype(jnp.float32) + 0.5) * bs
    p_S = Transform.apply(Transform.inverse(T_L_S),
                          centers.reshape(-1, 3))
    uv, r, valid = lidar.project(p_S)
    u = uv[..., 0]
    v = uv[..., 1]

    # Angular footprint of a block at range r, in pixels.
    eps = 1e-6
    ang = bs / jnp.maximum(r, eps)  # radians subtended (approx)
    px_per_rad_u = cols / (2.0 * np.pi)
    px_per_rad_v = (lidar.num_elevation_divisions - 1) \
        / max(lidar.elevation_range_rad, 1e-6)
    fp_u = ang * px_per_rad_u
    fp_v = ang * px_per_rad_v

    def onehot_sample(img_l, pr, pc):
        H_l, W_l = img_l.shape
        cu = jnp.clip((u / pc).astype(jnp.int32), 0, W_l - 1)
        cv = jnp.clip((v / pr).astype(jnp.int32), 0, H_l - 1)
        cell = cv * W_l + cu
        iota = jnp.arange(H_l * W_l, dtype=jnp.int32)
        onehot = (cell[:, None] == iota[None, :]).astype(jnp.bfloat16)
        return (onehot @ img_l.reshape(-1).astype(jnp.bfloat16)) \
            .astype(jnp.float32)

    max_a = onehot_sample(coarse_a, *lvl_a)
    max_b = onehot_sample(coarse_b, *lvl_b)
    fits_a = (fp_v <= 2.0 * lvl_a[0]) & (fp_u <= 2.0 * lvl_a[1])
    fits_b = (fp_v <= 2.0 * lvl_b[0]) & (fp_u <= 2.0 * lvl_b[1])
    maxr = jnp.where(fits_a, max_a, jnp.where(fits_b, max_b, global_max))

    margin = truncation_m + bs * float(np.sqrt(3.0) / 2.0)
    touched = valid & (r <= max_distance_m + bs) \
        & (r <= maxr + margin) & (maxr > 0.0)
    near_sensor = jnp.linalg.norm(centers.reshape(-1, 3) - origin,
                                  axis=-1) < 1.5 * bs
    touched = touched | near_sensor
    return touched.reshape(G, G, G), origin_block


def apply_workspace_bounds_to_grid(grid, origin_block, *, voxel_size_m: float,
                                   params: "ViewCalculatorParams"):
    """Mask a touched-block grid by the configured workspace bounds.

    Device-path equivalent of apply_workspace_bounds (the reference's
    ViewCalculator workspace bounds, mapper_initialization.cpp:330-358):
    blocks not intersecting the workspace are never allocated/integrated.
    """
    if params.workspace_bounds_type == WorkspaceBoundsType.UNBOUNDED:
        return grid
    bs = block_size_m(voxel_size_m)
    G = grid.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2)
    cells = jnp.stack([ii, jj, kk], -1) + origin_block
    lo_m = cells.astype(jnp.float32) * bs
    hi_m = lo_m + bs
    w_lo = jnp.asarray(params.workspace_bounds_min_corner_m, jnp.float32)
    w_hi = jnp.asarray(params.workspace_bounds_max_corner_m, jnp.float32)
    if params.workspace_bounds_type == WorkspaceBoundsType.HEIGHT_BOUNDS:
        keep = (hi_m[..., 2] > w_lo[2]) & (lo_m[..., 2] < w_hi[2])
    else:
        keep = jnp.all((hi_m > w_lo) & (lo_m < w_hi), axis=-1)
    return grid & keep


def frustum_block_aabb(T_L_C_np: np.ndarray, camera: Camera,
                       max_distance_m: float, voxel_size_m: float,
                       margin_blocks: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side conservative block AABB of a view (covers touched_block_grid).

    Pure numpy on the (host) pose — used to track dirty/allocated regions
    without any device->host sync (a tiny readback costs ~30 ms through a
    tunneled TPU relay, so the hot path must never depend on one).
    """
    bs = block_size_m(voxel_size_m)
    T = np.asarray(T_L_C_np, np.float64)
    # Frustum corner rays at the far plane + the camera origin.
    us = np.array([0.0, camera.width - 1.0])
    vs = np.array([0.0, camera.height - 1.0])
    corners = [T[:3, 3]]
    for u in us:
        for v in vs:
            ray = np.array([(u - camera.cx) / camera.fx,
                            (v - camera.cy) / camera.fy, 1.0])
            ray_l = T[:3, :3] @ ray
            corners.append(T[:3, 3] + ray_l * max_distance_m)
    corners = np.asarray(corners)
    lo = np.floor(corners.min(axis=0) / bs).astype(np.int64) - margin_blocks
    hi = np.floor(corners.max(axis=0) / bs).astype(np.int64) + margin_blocks
    return lo, hi


def blocks_in_view(depth, T_L_C, *, camera: Camera, voxel_size_m: float,
                   max_distance_m: float, truncation_m: float,
                   params: Optional[ViewCalculatorParams] = None) -> np.ndarray:
    """Block indices `i32[M, 3]` touched by this view (host-side result)."""
    params = params or ViewCalculatorParams()
    grid, origin = touched_block_grid(
        depth, T_L_C, camera=camera, voxel_size_m=voxel_size_m,
        max_distance_m=max_distance_m, truncation_m=truncation_m,
        subsample=int(params.raycast_subsampling_factor))
    grid = np.asarray(grid)
    origin = np.asarray(origin)
    idx = np.argwhere(grid).astype(np.int32) + origin
    return apply_workspace_bounds(idx, voxel_size_m, params)


def apply_workspace_bounds(block_indices: np.ndarray, voxel_size_m: float,
                           params: ViewCalculatorParams) -> np.ndarray:
    """Filter block indices by the configured workspace bounds.

    A block is kept if it intersects the workspace (reference semantics:
    blocks outside the workspace are never allocated)."""
    if params.workspace_bounds_type == WorkspaceBoundsType.UNBOUNDED:
        return block_indices
    bs = block_size_m(voxel_size_m)
    lo_m = np.asarray(params.workspace_bounds_min_corner_m, np.float64)
    hi_m = np.asarray(params.workspace_bounds_max_corner_m, np.float64)
    block_lo = block_indices.astype(np.float64) * bs
    block_hi = block_lo + bs
    if params.workspace_bounds_type == WorkspaceBoundsType.HEIGHT_BOUNDS:
        keep = (block_hi[:, 2] > lo_m[2]) & (block_lo[:, 2] < hi_m[2])
    else:
        keep = np.all((block_hi > lo_m) & (block_lo < hi_m), axis=1)
    return block_indices[keep]
