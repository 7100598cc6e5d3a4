"""TPU-platform AOT lowering smoke tests for every Pallas kernel.

Building the Mosaic module happens at LOWERING time, so
`jax.jit(f).trace(...).lower(lowering_platforms=("tpu",))` verifies the
kernels against Mosaic's op/shape constraints on a CPU-only host — the
class of failure (unsupported dynamic roll, misaligned slices, bad block
shapes) that interpret-mode tests cannot catch. Machine-code compilation
still happens on real hardware, but verified IR rarely fails there.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
CAP, N = 256, 64


def _lower(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.fixture(scope="module")
def batch():
    z = jnp.zeros((CAP, 512), jnp.float32)
    slots = jnp.arange(N, dtype=jnp.int32)
    bidx = jnp.zeros((N, 3), jnp.int32)
    T = jnp.eye(4, dtype=jnp.float32)
    return z, slots, bidx, T


def test_tsdf_kernel_lowers_for_tpu(batch):
    from isaac_ros_nvblox_tpu.ops.tsdf_pallas import integrate_tsdf_pallas
    z, slots, bidx, T = batch
    depth = jnp.full((120, 160), 2.0, jnp.float32)

    def f(d, w):
        return integrate_tsdf_pallas(d, w, slots, bidx, depth, T,
                                     camera=CAM, voxel_size_m=0.05,
                                     params=TsdfIntegratorParams())
    _lower(f, z, z)


def test_color_kernel_lowers_for_tpu(batch):
    from isaac_ros_nvblox_tpu.ops.color_pallas import integrate_color_pallas
    z, slots, bidx, T = batch
    color = jnp.zeros((120, 160, 3), jnp.float32)
    depth = jnp.full((120, 160), 2.0, jnp.float32)

    def f(cr, cg, cb, cw):
        return integrate_color_pallas(cr, cg, cb, cw, z, z, slots, bidx,
                                      color, depth, T, camera=CAM,
                                      voxel_size_m=0.05,
                                      params=TsdfIntegratorParams())
    _lower(f, z, z, z, z)


def test_esdf_passes_lower_for_tpu():
    from isaac_ros_nvblox_tpu.ops.esdf_dense import (edt_pass_blockmajor,
                                                     line_rows)
    rows = jnp.full((4 * line_rows(16, 40), 512), 1e12, jnp.float32)

    def f_binary(r):
        return edt_pass_blockmajor(r, n_lines=4, Sb=16, band=40, axis=0,
                                   binary_input=True)

    def f_banded(r):
        return edt_pass_blockmajor(r, n_lines=4, Sb=16, band=40, axis=1)
    _lower(f_binary, rows)
    _lower(f_banded, rows)


def test_mesh_kernel_lowers_for_tpu(batch):
    from isaac_ros_nvblox_tpu.ops.mesh_pallas import marching_cubes_fused
    z, slots, bidx, T = batch
    nbr8 = jnp.full((N, 8), -1, jnp.int32)

    def f(d, w):
        return marching_cubes_fused(d, w, (z, z, z), nbr8,
                                    jnp.ones((N,), jnp.int32),
                                    min_weight=1e-4, with_color=True)
    _lower(f, z, z)


def test_detect_kernel_lowers_for_tpu(batch):
    from isaac_ros_nvblox_tpu.ops.detect_pallas import detect_dynamic_pallas
    z, slots, bidx, T = batch
    from isaac_ros_nvblox_tpu.core.world_grid import (WorldGridConfig,
                                                      create_world_grid)
    state = create_world_grid(WorldGridConfig(dims=(16, 16, 16), capacity=CAP,
                                              origin_block=(-8, -8, -4)))
    hc = jnp.zeros((CAP, 512), bool)
    depth = jnp.full((120, 160), 2.0, jnp.float32)

    def f(hc_in):
        return detect_dynamic_pallas(state, hc_in, depth, T, slots, bidx,
                                     camera=CAM, voxel_size_m=0.05,
                                     max_depth_m=5.0)
    _lower(f, hc)


def test_tsdf_color_fused_kernel_lowers_for_tpu(batch):
    from isaac_ros_nvblox_tpu.ops.tsdf_color_pallas import (
        integrate_tsdf_color_pallas)
    z, slots, bidx, T = batch
    color = jnp.zeros((120, 160, 3), jnp.float32)
    depth = jnp.full((120, 160), 2.0, jnp.float32)

    def f(d, w, cr, cg, cb, cw):
        return integrate_tsdf_color_pallas(
            d, w, cr, cg, cb, cw, slots, bidx, depth, color, T, camera=CAM,
            voxel_size_m=0.05, params=TsdfIntegratorParams())
    _lower(f, z, z, z, z, z, z)


def test_dilate_dense_grid_lowers_for_tpu():
    from isaac_ros_nvblox_tpu.ops.halo import dilate_dense_grid_pallas
    dense = jnp.zeros((4, 3, 5, 512), jnp.float32)

    def f(d):
        return dilate_dense_grid_pallas(d, dims_b=(4, 3, 5))
    _lower(f, dense)
