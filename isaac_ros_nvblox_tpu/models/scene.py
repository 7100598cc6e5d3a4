"""Synthetic scenes: analytic SDF primitives + depth rendering.

The reference's accuracy tests (in the nvblox core repo) fuse synthetic
scenes built from primitives and compare the reconstruction against the
ground-truth SDF; the wrapper's unit tests use deterministic hash-derived
layers (nvblox_ros/test/unit_tests/test_esdf_and_gradient_conversions.cpp).
This module gives us both: an analytic scene with an exact SDF, and a
sphere-traced depth-image renderer (jitted) so tests and benchmarks are
fully self-contained without dataset downloads.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import Transform
from isaac_ros_nvblox_tpu.models.camera import Camera


@dataclasses.dataclass(frozen=True)
class Sphere:
    center: Tuple[float, float, float]
    radius: float

    def sdf(self, p):
        c = jnp.asarray(self.center, jnp.float32)
        return jnp.linalg.norm(p - c, axis=-1) - self.radius


@dataclasses.dataclass(frozen=True)
class Box:
    center: Tuple[float, float, float]
    half_extents: Tuple[float, float, float]

    def sdf(self, p):
        c = jnp.asarray(self.center, jnp.float32)
        h = jnp.asarray(self.half_extents, jnp.float32)
        q = jnp.abs(p - c) - h
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside


@dataclasses.dataclass(frozen=True)
class Plane:
    """Half-space: sdf = dot(normal, p) - offset (positive on normal side)."""
    normal: Tuple[float, float, float]
    offset: float

    def sdf(self, p):
        n = jnp.asarray(self.normal, jnp.float32)
        n = n / jnp.linalg.norm(n)
        return p @ n - self.offset


@dataclasses.dataclass(frozen=True)
class RoomBox:
    """A hollow axis-aligned room: interior is free space, walls are surface.

    sdf > 0 inside the room (free), < 0 in the walls — i.e. the negated Box
    SDF, so cameras inside the room see the walls as surfaces.
    """
    center: Tuple[float, float, float]
    half_extents: Tuple[float, float, float]

    def sdf(self, p):
        return -Box(self.center, self.half_extents).sdf(p)


@dataclasses.dataclass(frozen=True)
class Scene:
    """Union of primitives; scene SDF = min over primitive SDFs."""
    primitives: Tuple[object, ...]

    def sdf(self, p):
        vals = jnp.stack([prim.sdf(p) for prim in self.primitives], axis=0)
        return jnp.min(vals, axis=0)

    def normal(self, p, eps: float = 1e-3):
        def f(q):
            return self.sdf(q)
        e = jnp.asarray([[eps, 0, 0], [0, eps, 0], [0, 0, eps]], jnp.float32)
        g = jnp.stack([f(p + e[i]) - f(p - e[i]) for i in range(3)], axis=-1)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)


def cluttered_multi_room_scene() -> Scene:
    """Two connected rooms with a doorway and furniture-scale clutter.

    The strongest analytic stand-in for a real multi-room Replica-style
    sequence (VERDICT r3 next #7): a 13 x 8.8 x 3.6 m envelope split by a
    partition wall with a 1 m doorway (two wall segments — the SDF stays
    an exact min-union), plus table/shelf/box/sphere clutter in both
    rooms (~10k allocated blocks at 0.05 m voxels under a two-room
    orbit). Everything is an exact SDF, so mesh/ESDF accuracy can be
    thresholded against ground truth.
    """
    wall_t = 0.1
    return Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.8), half_extents=(6.5, 4.4, 1.8)),
        # Partition wall at x = 0 with a doorway gap y in [-0.6, 0.4].
        Box(center=(0.0, -2.5, 1.8), half_extents=(wall_t, 1.9, 1.8)),
        Box(center=(0.0, 2.4, 1.8), half_extents=(wall_t, 2.0, 1.8)),
        # Room A (x < 0): table (top + leg block), shelf, clutter.
        Box(center=(-3.0, -1.2, 0.75), half_extents=(0.8, 0.5, 0.05)),
        Box(center=(-3.0, -1.2, 0.35), half_extents=(0.6, 0.35, 0.35)),
        Box(center=(-5.6, 1.5, 1.0), half_extents=(0.3, 1.0, 1.0)),
        Sphere(center=(-1.8, 1.2, 0.4), radius=0.4),
        Box(center=(-4.2, 2.4, 0.3), half_extents=(0.35, 0.3, 0.3)),
        # Room B (x > 0): sofa-ish slab, cabinet, clutter spheres.
        Box(center=(2.6, -2.4, 0.45), half_extents=(1.1, 0.5, 0.45)),
        Box(center=(5.2, 0.8, 0.9), half_extents=(0.4, 0.8, 0.9)),
        Sphere(center=(1.6, 1.6, 0.5), radius=0.5),
        Sphere(center=(3.8, 1.0, 0.3), radius=0.3),
        Box(center=(2.2, 2.8, 0.6), half_extents=(0.3, 0.3, 0.6)),
    ))


def default_test_scene() -> Scene:
    """A 10 x 8 x 3.5 m room with a sphere and a box obstacle.

    Mirrors the style of nvblox core's primitives test scene (room + objects).
    """
    return Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.75), half_extents=(5.0, 4.0, 1.75)),
        Sphere(center=(1.5, 1.0, 1.0), radius=0.6),
        Box(center=(-2.0, -1.5, 0.5), half_extents=(0.5, 0.5, 0.5)),
    ))


@functools.partial(jax.jit, static_argnames=("scene", "camera", "max_depth",
                                             "num_steps"))
def render_depth(scene: Scene, camera: Camera, T_L_C, *,
                 max_depth: float = 10.0, num_steps: int = 96) -> jnp.ndarray:
    """Sphere-trace a z-depth image `f32[H, W]` of the scene.

    Pixels that never hit a surface within `max_depth` get depth 0 (invalid),
    matching the sensor convention used by the integrators.
    """
    dirs_C = camera.ray_directions()  # [H, W, 3]
    dirs_L = Transform.rotate(T_L_C, dirs_C.reshape(-1, 3))
    origin = T_L_C[:3, 3]

    def step(_, t):
        p = origin[None, :] + dirs_L * t[:, None]
        d = scene.sdf(p)
        # Stop advancing once within the hit tolerance (prevents creeping
        # past the surface into the interior).
        advance = jnp.where(d > 1e-4, d, 0.0)
        return jnp.minimum(t + advance, max_depth * 2.0)

    t = jnp.full((dirs_L.shape[0],), 1e-3, jnp.float32)
    t = jax.lax.fori_loop(0, num_steps, step, t)
    p = origin[None, :] + dirs_L * t[:, None]
    hit = (scene.sdf(p) < 1e-3) & (t < max_depth)
    # Convert ray length to z-depth.
    z = t * dirs_C.reshape(-1, 3)[:, 2]
    depth = jnp.where(hit, z, 0.0)
    return depth.reshape(camera.height, camera.width)


@functools.partial(jax.jit, static_argnames=("scene", "camera", "max_depth",
                                             "num_steps"))
def render_color(scene: Scene, camera: Camera, T_L_C, *,
                 max_depth: float = 10.0, num_steps: int = 96) -> jnp.ndarray:
    """Render `u8[H, W, 3]` colors: position-derived RGB (deterministic)."""
    dirs_C = camera.ray_directions()
    dirs_L = Transform.rotate(T_L_C, dirs_C.reshape(-1, 3))
    origin = T_L_C[:3, 3]

    def step(_, t):
        p = origin[None, :] + dirs_L * t[:, None]
        d = scene.sdf(p)
        advance = jnp.where(d > 1e-4, d, 0.0)
        return jnp.minimum(t + advance, max_depth * 2.0)

    t = jnp.full((dirs_L.shape[0],), 1e-3, jnp.float32)
    t = jax.lax.fori_loop(0, num_steps, step, t)
    p = origin[None, :] + dirs_L * t[:, None]
    hit = (scene.sdf(p) < 1e-3) & (t < max_depth)
    rgb = jnp.mod(jnp.abs(p) * 64.0, 256.0)
    rgb = jnp.where(hit[:, None], rgb, 0.0).astype(jnp.uint8)
    return rgb.reshape(camera.height, camera.width, 3)


def look_at_pose(eye, target) -> np.ndarray:
    """Camera pose at `eye` looking at `target` (layer frame, z-up).

    Returns T_L_C f32[4,4] with camera convention x-right, y-down,
    z-forward."""
    target = np.asarray(target, np.float64)
    eye = np.asarray(eye, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    world_up = np.asarray([0.0, 0.0, 1.0])
    right = np.cross(fwd, world_up)
    nrm = np.linalg.norm(right)
    if nrm < 1e-6:
        right = np.asarray([1.0, 0.0, 0.0])
    else:
        right = right / nrm
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=1)  # columns: x, y, z axes
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = eye
    return T


def orbit_pose(t: float, radius: float = 2.0, height: float = 1.5,
               target=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera pose orbiting (circle about the layer origin) and looking
    at `target`."""
    return look_at_pose([radius * np.cos(t), radius * np.sin(t), height],
                        target)
