"""GroundPlaneEstimator: RANSAC plane fit over TSDF zero-crossings.

Reference: nvblox `GroundPlaneEstimator` —
`tsdf_zero_crossings_ground_candidates()` + `ground_plane()` feeding
ESDF slicing-above-plane (call-sites nvblox_node.cpp:1455-1474; params at
mapper_initialization.cpp:115-152).

TPU design: candidate extraction is one jitted pass over all blocks (find
voxels where the TSDF changes sign along +z within a block column, i.e. the
floor-facing zero crossing); RANSAC runs entirely on device with a fixed
hypothesis count via vmap (no data-dependent loops) — hypotheses are
3-point plane fits scored by inlier count, followed by a least-squares
refit on the best hypothesis' inliers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE

B = VOXELS_PER_SIDE


@dataclasses.dataclass(frozen=True)
class GroundPlaneEstimatorParams:
    """Mirrors ground_plane_estimator_* / ransac_plane_fitter_* params
    (mapper_initialization.cpp:115-152)."""
    ground_points_candidates_min_z_m: float = -0.2
    ground_points_candidates_max_z_m: float = 0.5
    ransac_distance_threshold_m: float = 0.05
    num_ransac_iterations: int = 128


@dataclasses.dataclass
class Plane:
    """z = a*x + b*y + c; normal points +z."""
    a: float
    b: float
    c: float

    def height_at(self, x, y):
        return self.a * x + self.b * y + self.c

    def normal(self) -> np.ndarray:
        n = np.asarray([-self.a, -self.b, 1.0])
        return n / np.linalg.norm(n)


@functools.partial(jax.jit, static_argnames=("voxel_size_m", "min_z_m",
                                             "max_z_m", "min_weight"))
def tsdf_zero_crossings_ground_candidates(tsdf_pad, weight_pad,
                                          block_indices, valid_blocks,
                                          *, voxel_size_m: float,
                                          min_z_m: float, max_z_m: float,
                                          min_weight: float = 1e-4):
    """Per block-column candidate points `f32[N, 64, 3]` + valid mask.

    A candidate is the sub-voxel z position where the TSDF crosses from
    negative (below floor) to positive (above) along +z, per (x, y) column.
    Inputs are +1-halo padded `[N, 9, 9, 9]` grids (gather_halo lo=0 hi=1)
    so crossings at block boundaries are found too (floors commonly sit on
    exact block boundaries, e.g. z = 0).
    """
    cap = tsdf_pad.shape[0]
    d = tsdf_pad[:, :8, :8, :]    # [N, 8, 8, 9] — z keeps the +1 halo
    w = weight_pad[:, :8, :8, :]
    below = d[:, :, :, :-1]
    above = d[:, :, :, 1:]
    wb = w[:, :, :, :-1]
    wa = w[:, :, :, 1:]
    crossing = (below < 0.0) & (above >= 0.0) & (wb >= min_weight) \
        & (wa >= min_weight)  # [N, 8, 8, 8]
    # Sub-voxel interpolation along z.
    t = below / jnp.where(jnp.abs(below - above) > 1e-9, below - above, 1e-9)
    zi = jax.lax.broadcasted_iota(jnp.float32, crossing.shape, 3)
    z_local = zi + jnp.clip(t, 0.0, 1.0)
    # Take the lowest crossing per column.
    first = jnp.argmax(crossing, axis=3)  # [N, 8, 8]
    any_cross = jnp.any(crossing, axis=3)
    z_sel = jnp.take_along_axis(z_local, first[..., None], axis=3)[..., 0]

    bx = block_indices[:, 0].astype(jnp.float32)
    by = block_indices[:, 1].astype(jnp.float32)
    bz = block_indices[:, 2].astype(jnp.float32)
    xi = jax.lax.broadcasted_iota(jnp.float32, (cap, B, B), 1)
    yi = jax.lax.broadcasted_iota(jnp.float32, (cap, B, B), 2)
    px = (bx[:, None, None] * B + xi + 0.5) * voxel_size_m
    py = (by[:, None, None] * B + yi + 0.5) * voxel_size_m
    pz = (bz[:, None, None] * B + z_sel + 0.5) * voxel_size_m
    pts = jnp.stack([px, py, pz], axis=-1).reshape(cap, B * B, 3)
    valid = (any_cross & valid_blocks[:, None, None]
             & (pz >= min_z_m) & (pz <= max_z_m)).reshape(cap, B * B)
    return pts, valid


@functools.partial(jax.jit, static_argnames=("params",))
def ransac_plane_fit(points, valid, key, *,
                     params: GroundPlaneEstimatorParams):
    """Fixed-iteration RANSAC plane fit on device.

    points f32[N, 3], valid bool[N]. Returns (coeffs f32[3] (a,b,c),
    inlier_count i32, ok bool).
    """
    N = points.shape[0]
    n_hyp = params.num_ransac_iterations
    # Hypotheses must sample *valid* candidates (they are typically a small
    # fraction of the slots): compact valid indices, draw modulo their count.
    max_cand = min(N, 16384)
    (cand_idx,) = jnp.nonzero(valid, size=max_cand, fill_value=0)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    draw = jax.random.randint(key, (n_hyp, 3), 0, max_cand) \
        % jnp.minimum(n_valid, max_cand)
    idx = cand_idx[draw]
    tri = points[idx]  # [H, 3, 3]
    tri_valid = jnp.all(valid[idx], axis=1)

    # Plane z = a x + b y + c through 3 points: solve [x y 1][a b c]^T = z.
    A = jnp.concatenate([tri[..., :2], jnp.ones((n_hyp, 3, 1))], axis=-1)
    z = tri[..., 2]
    det_ok = jnp.abs(jnp.linalg.det(A)) > 1e-9
    coeffs = jnp.linalg.solve(
        jnp.where(det_ok[:, None, None], A,
                  jnp.eye(3)[None]), z[..., None])[..., 0]  # [H, 3]

    # Score: inliers by vertical distance.
    pred_z = points[None, :, 0] * coeffs[:, 0:1] \
        + points[None, :, 1] * coeffs[:, 1:2] + coeffs[:, 2:3]
    resid = jnp.abs(points[None, :, 2] - pred_z)
    inliers = (resid <= params.ransac_distance_threshold_m) & valid[None, :]
    scores = jnp.where(tri_valid & det_ok, jnp.sum(inliers, axis=1), -1)
    best = jnp.argmax(scores)
    best_inliers = inliers[best]

    # Least-squares refit on the best inliers (weighted normal equations).
    wgt = best_inliers.astype(jnp.float32)
    X = jnp.concatenate([points[:, :2], jnp.ones((N, 1))], axis=-1)
    XtX = (X * wgt[:, None]).T @ X + 1e-6 * jnp.eye(3)
    Xtz = (X * wgt[:, None]).T @ points[:, 2]
    refit = jnp.linalg.solve(XtX, Xtz)
    ok = scores[best] > 10
    return refit, scores[best], ok


class GroundPlaneEstimator:
    """Host wrapper bundling candidate extraction + RANSAC (parity:
    multi_mapper.ground_plane_estimator())."""

    def __init__(self, params: Optional[GroundPlaneEstimatorParams] = None,
                 seed: int = 0):
        self.params = params or GroundPlaneEstimatorParams()
        self._key = jax.random.PRNGKey(seed)
        self.last_plane: Optional[Plane] = None
        self.last_candidates: Optional[np.ndarray] = None

    def estimate_device(self, m) -> Optional[Plane]:
        """Estimate from a DeviceMapper (device halo + candidates + RANSAC;
        one small host sync for the plane coefficients)."""
        if "tsdf_distance" not in m.channels:
            return None
        from isaac_ros_nvblox_tpu.core import world_grid as wgmod
        from isaac_ros_nvblox_tpu.ops.halo import gather_halo
        cap = m.capacity
        # Batch = all slots to the high-water mark (freed rows are inert).
        slots = jnp.arange(cap, dtype=jnp.int32)
        bidx = m.state.block_index_of_slot
        nbrs = wgmod.neighbor_slots_of(m.state, bidx)
        d_pad = gather_halo(m.channels["tsdf_distance"].reshape(cap, 8, 8, 8),
                            nbrs, lo=0, hi=1, fill=0.0)
        w_pad = gather_halo(m.channels["tsdf_weight"].reshape(cap, 8, 8, 8),
                            nbrs, lo=0, hi=1, fill=0.0)
        valid_blocks = wgmod.live_slot_mask(m.state)
        pts, valid = tsdf_zero_crossings_ground_candidates(
            d_pad, w_pad, bidx, valid_blocks,
            voxel_size_m=m.voxel_size_m,
            min_z_m=self.params.ground_points_candidates_min_z_m,
            max_z_m=self.params.ground_points_candidates_max_z_m)
        pts = pts.reshape(-1, 3)
        valid = valid.reshape(-1)
        self._key, sub = jax.random.split(self._key)
        coeffs, inliers, ok = ransac_plane_fit(pts, valid, sub,
                                               params=self.params)
        if not bool(ok):
            return None
        c = np.asarray(coeffs)
        self.last_plane = Plane(a=float(c[0]), b=float(c[1]), c=float(c[2]))
        return self.last_plane

    def estimate(self, mapper) -> Optional[Plane]:
        if "tsdf_distance" not in mapper.pool.channels:
            return None
        from isaac_ros_nvblox_tpu.ops.halo import gather_halo
        slots = mapper.table.allocated_slots()
        if slots.size == 0:
            return None
        nbrs = jnp.asarray(mapper.table.neighbors[slots])
        d_pad = gather_halo(mapper.pool.voxel_grid_view("tsdf_distance"),
                            nbrs, lo=0, hi=1, fill=0.0)
        w_pad = gather_halo(mapper.pool.voxel_grid_view("tsdf_weight"),
                            nbrs, lo=0, hi=1, fill=0.0)
        pts, valid = tsdf_zero_crossings_ground_candidates(
            d_pad, w_pad,
            jnp.asarray(mapper.table.block_indices[slots]),
            jnp.ones((slots.size,), jnp.bool_),
            voxel_size_m=mapper.voxel_size_m,
            min_z_m=self.params.ground_points_candidates_min_z_m,
            max_z_m=self.params.ground_points_candidates_max_z_m)
        pts = pts.reshape(-1, 3)
        valid = valid.reshape(-1)
        self._key, sub = jax.random.split(self._key)
        coeffs, inliers, ok = ransac_plane_fit(pts, valid, sub,
                                               params=self.params)
        if not bool(ok):
            return None
        c = np.asarray(coeffs)
        self.last_plane = Plane(a=float(c[0]), b=float(c[1]), c=float(c[2]))
        self.last_candidates = np.asarray(pts[np.asarray(valid)])
        return self.last_plane
