"""Core geometric types.

TPU-native analogue of nvblox `nvblox/core/types.h` (reconstructed surface,
see SURVEY.md §1 L0; reference call-sites e.g.
nvblox_ros/src/lib/nvblox_node.cpp:20-23). Where nvblox uses Eigen
`Vector3f`/`Transform` C++ objects, we use plain jnp arrays so everything is
traceable under jit:

  * a point/vector is `f32[3]` (batched: `f32[..., 3]`)
  * a rigid transform is a homogeneous `f32[4, 4]`
  * a block index is `i32[3]` (batched: `i32[..., 3]`)

Blocks are 8x8x8 voxels, matching the reference layout
(`layer_publishing.cpp:289`: voxel_size = block_size / 8). 512 voxels per
block flattens to 4 x 128 lanes — a natural TPU tile.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Voxels along each side of a cubic VoxelBlock (reference: kVoxelsPerSide == 8,
# nvblox_foxglove/src/index.ts:72 `voxel_size = block_size_m / 8`).
VOXELS_PER_SIDE: int = 8
VOXELS_PER_BLOCK: int = VOXELS_PER_SIDE ** 3  # 512


def block_size_m(voxel_size_m: float) -> float:
    return VOXELS_PER_SIDE * voxel_size_m


@dataclasses.dataclass(frozen=True)
class AABB:
    """Axis-aligned bounding box in meters (nvblox `AxisAlignedBoundingBox`)."""

    min_m: Tuple[float, float, float]
    max_m: Tuple[float, float, float]

    def contains(self, p) -> jnp.ndarray:
        lo = jnp.asarray(self.min_m, jnp.float32)
        hi = jnp.asarray(self.max_m, jnp.float32)
        return jnp.all((p >= lo) & (p <= hi), axis=-1)

    def size(self) -> np.ndarray:
        return np.asarray(self.max_m, np.float64) - np.asarray(self.min_m, np.float64)


class Transform:
    """Helpers for homogeneous 4x4 rigid transforms (f32[4,4] arrays).

    Convention matches the reference: `T_A_B` maps points in frame B to
    frame A: `p_A = T_A_B @ p_B`.
    """

    @staticmethod
    def identity() -> jnp.ndarray:
        return jnp.eye(4, dtype=jnp.float32)

    @staticmethod
    def from_rotation_translation(R, t) -> jnp.ndarray:
        T = jnp.eye(4, dtype=jnp.float32)
        T = T.at[:3, :3].set(jnp.asarray(R, jnp.float32))
        T = T.at[:3, 3].set(jnp.asarray(t, jnp.float32))
        return T

    @staticmethod
    def inverse(T) -> jnp.ndarray:
        R = T[:3, :3]
        t = T[:3, 3]
        Rinv = R.T
        Ti = jnp.eye(4, dtype=jnp.float32)
        Ti = Ti.at[:3, :3].set(Rinv)
        Ti = Ti.at[:3, 3].set(-Rinv @ t)
        return Ti

    @staticmethod
    def apply(T, points) -> jnp.ndarray:
        """Transform points `f32[..., 3]` by `T` (f32[4,4])."""
        return points @ T[:3, :3].T + T[:3, 3]

    @staticmethod
    def rotate(T, vectors) -> jnp.ndarray:
        return vectors @ T[:3, :3].T

    @staticmethod
    def interpolate(T0, T1, alpha) -> jnp.ndarray:
        """Pose interpolation (translation lerp + rotation via quaternion slerp-lite).

        Used by lidar motion compensation (reference plumbing at
        nvblox_node.cpp:1339-1384). For the small inter-scan rotations involved
        we use normalized quaternion lerp (nlerp), which is jit-friendly.
        """
        q0 = quaternion_from_matrix(T0[:3, :3])
        q1 = quaternion_from_matrix(T1[:3, :3])
        # Shortest arc.
        q1 = jnp.where(jnp.sum(q0 * q1) < 0.0, -q1, q1)
        q = q0 * (1.0 - alpha) + q1 * alpha
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
        R = matrix_from_quaternion(q)
        t = T0[:3, 3] * (1.0 - alpha) + T1[:3, 3] * alpha
        return Transform.from_rotation_translation(R, t)


def quaternion_from_matrix(R) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), branch-free for jit.

    Uses the numerically robust 4-candidate construction: compute all four
    quaternion candidates from the diagonal and pick the one with the largest
    pivot via `jnp.where` (no data-dependent control flow).
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate 0: trace pivot.
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0])
    # Candidate 1: m00 pivot.
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1])
    # Candidate 2: m11 pivot.
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2])
    # Candidate 3: m22 pivot.
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3])

    use0 = tr > 0.0
    use1 = (~use0) & (m00 > m11) & (m00 > m22)
    use2 = (~use0) & (~use1) & (m11 > m22)
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


def matrix_from_quaternion(q) -> jnp.ndarray:
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ]).astype(jnp.float32)


def local_voxel_offsets() -> np.ndarray:
    """`i32[512, 3]` local (x, y, z) voxel coordinates within a block.

    Flattening order is x-major ... z-fastest: index = (x*8 + y)*8 + z, so the
    flattened 512-vector reshapes to [8, 8, 8] as [x, y, z].
    """
    r = np.arange(VOXELS_PER_SIDE)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.int32)


def voxel_centers_for_blocks(block_indices, voxel_size_m: float) -> jnp.ndarray:
    """World-frame voxel centers `f32[N, 512, 3]` for blocks `i32[N, 3]`.

    Layer frame: block (i,j,k) spans [i*bs, (i+1)*bs) etc.; voxel centers are
    offset by half a voxel.
    """
    offs = jnp.asarray(local_voxel_offsets(), jnp.int32)  # [512, 3]
    vox = block_indices[:, None, :] * VOXELS_PER_SIDE + offs[None, :, :]
    return (vox.astype(jnp.float32) + 0.5) * jnp.float32(voxel_size_m)


def block_index_of_position(p_m, voxel_size_m: float) -> jnp.ndarray:
    """Position `f32[..., 3]` -> containing block index `i32[..., 3]`."""
    bs = block_size_m(voxel_size_m)
    return jnp.floor(p_m / bs).astype(jnp.int32)


def global_voxel_index_of_position(p_m, voxel_size_m: float) -> jnp.ndarray:
    return jnp.floor(p_m / voxel_size_m).astype(jnp.int32)
