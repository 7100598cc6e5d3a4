"""Write a Replica-format RGB-D sequence from the synthetic renderer.

Produces the exact on-disk layout `datasets/replica.py` consumes
(traj.txt + results/depth{i:06d}.png + frame{i:06d}.jpg + cam_params.json
— the NICE-SLAM/vMAP export the reference's replica loader reads,
fuser_node.cpp:48-65). Used by the dataset-replay validation tests and the
example pipeline: it exercises the real file loaders + Fuser end-to-end
with analytic ground truth available for surface-error checks.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, orbit_pose,
                                               render_color, render_depth)

DEPTH_SCALE = 6553.5  # Replica convention: depth_m = png_u16 / scale


def write_replica_sequence(root, scene: Scene, camera: Camera,
                           n_frames: int = 16, orbit_radius: float = 1.5,
                           orbit_height: float = 1.5,
                           target=(0.0, 0.0, 1.0)) -> Path:
    """Render an orbit through `scene` and write it Replica-style."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    root = Path(root)
    (root / "results").mkdir(parents=True, exist_ok=True)
    cam = {"fx": camera.fx, "fy": camera.fy, "cx": camera.cx,
           "cy": camera.cy, "w": camera.width, "h": camera.height,
           "scale": DEPTH_SCALE}
    (root / "cam_params.json").write_text(json.dumps({"camera": cam}))

    poses = []
    for i in range(n_frames):
        T = orbit_pose(2 * np.pi * i / n_frames, radius=orbit_radius,
                       height=orbit_height, target=target)
        poses.append(np.asarray(T, np.float64).reshape(-1))
        T_j = jnp.asarray(T)
        depth = np.asarray(render_depth(scene, camera, T_j))
        color = np.asarray(render_color(scene, camera, T_j))
        depth_u16 = np.clip(depth * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        imageio.imwrite(root / "results" / f"depth{i:06d}.png", depth_u16)
        imageio.imwrite(root / "results" / f"frame{i:06d}.jpg",
                        np.clip(color, 0, 255).astype(np.uint8))
    np.savetxt(root / "traj.txt", np.stack(poses))
    return root
