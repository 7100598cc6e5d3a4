"""isaac_ros_nvblox_tpu — a TPU-native dense 3D reconstruction & mapping framework.

A from-scratch re-design of the capabilities of NVIDIA's isaac_ros_nvblox
(nvblox core + ROS runtime) for TPU hardware: JAX/XLA/Pallas compute path,
block-pool map representation (dense, statically-shaped tensors instead of a
GPU hash table), pjit/shard_map spatial scale-out over device meshes.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  core/     — types, block pool (the TPU replacement for the GPU voxel hash)
  models/   — sensor models (pinhole Camera, spherical Lidar), synthetic scenes
  ops/      — jitted integrators & kernels (TSDF, color, occupancy, ESDF,
              marching cubes, decay, freespace, slicing, back-projection)
  mapper/   — Mapper / MultiMapper orchestration + parameter tree
  parallel/ — multi-device spatial sharding (shard_map, halo exchange)
  runtime/  — tick scheduler, queues, pose transformer, services, messages
  io/       — PLY / .nvblx-equivalent / occupancy-grid export
  datasets/ — Replica/Redwood/3DMatch loaders, synthetic dataset, Fuser
  utils/    — Timing/Rates/Delays registries, param descriptions
"""

__version__ = "0.1.0"

from isaac_ros_nvblox_tpu.core.types import AABB, Transform  # noqa: F401
