#!/usr/bin/env python
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
"""Example pipeline bring-up: the launch-file analogue.

Reference parity: nvblox_examples_bringup composes sensor -> nvblox ->
costmap -> visualization graphs from layered YAML
(launch/perception/nvblox.launch.py). This script wires the same graph
without ROS: a synthetic (or recorded/Replica) sensor source feeds the
NvbloxNode; the costmap layer and mesh adapter subscribe on the bus; the
final mesh is exported to PLY + a standalone HTML viewer.

Usage:
  python examples/run_pipeline.py --frames 16 --out /tmp/pipeline_out
  python examples/run_pipeline.py --config examples/config/nvblox/nvblox_base.yaml \
      --mode dynamic --frames 24
"""

import argparse
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, nargs="*",
                    help="YAML layers (later wins)")
    ap.add_argument("--mode", default=None,
                    choices=[None, "static", "dynamic", "people_segmentation"])
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "replica", "recorded"])
    ap.add_argument("--path", default=None)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", default="/tmp/nvblox_tpu_pipeline")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from isaac_ros_nvblox_tpu.mapper.params import make_params
    from isaac_ros_nvblox_tpu.runtime.adapters import MeshLayerAdapter
    from isaac_ros_nvblox_tpu.runtime.config_loader import load_config
    from isaac_ros_nvblox_tpu.runtime.costmap import NvbloxCostmapLayer
    from isaac_ros_nvblox_tpu.runtime.node import NodeParams, NvbloxNode

    if args.config:
        node_params, mapper_params = load_config(args.config)
    else:
        node_params = NodeParams()
        mapper_params = make_params(mode=args.mode)

    node = NvbloxNode(node_params, mapper_params)
    costmap = NvbloxCostmapLayer(node.bus)
    adapter = MeshLayerAdapter(node.bus)
    stats = {"mesh": 0, "slice": 0, "mesh_serialized": 0}
    node.bus.subscribe("~/mesh", lambda m: stats.__setitem__(
        "mesh", stats["mesh"] + 1))
    node.bus.subscribe("~/static_map_slice", lambda m: stats.__setitem__(
        "slice", stats["slice"] + 1))
    node.bus.subscribe("~/mesh_serialized", lambda m: stats.__setitem__(
        "mesh_serialized", stats["mesh_serialized"] + 1))

    # Sensor source.
    if args.dataset == "synthetic":
        from isaac_ros_nvblox_tpu.datasets.synthetic import SyntheticDataLoader
        loader = SyntheticDataLoader(num_frames=args.frames)
    elif args.dataset == "replica":
        from isaac_ros_nvblox_tpu.datasets.replica import ReplicaDataLoader
        loader = ReplicaDataLoader(args.path, max_frames=args.frames)
    else:
        from isaac_ros_nvblox_tpu.datasets.recorded import RecordedDataLoader
        loader = RecordedDataLoader(args.path)

    t = [0.0]
    node.clock = lambda: t[0]
    t0 = time.time()
    n = 0
    for frame in loader:
        stamp = frame.timestamp_s
        node.add_pose("camera", stamp, frame.T_L_C)
        node.add_depth_image(np.asarray(frame.depth), frame.camera,
                             "camera", stamp)
        if frame.color is not None:
            node.add_color_image(np.asarray(frame.color), frame.camera,
                                 "camera", stamp)
        t[0] = stamp + 0.001
        node.tick()
        t[0] = stamp + 0.101  # second tick past the esdf/mesh rate gates
        node.tick()
        n += 1
    wall = time.time() - t0

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    node.save_ply(out)
    node.shutdown(out)

    # Standalone viewer of the final mesh.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "mesh_viewer", Path(__file__).resolve().parents[1]
        / "tools" / "mesh_viewer.py")
    mv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mv)
    v, c, tri = mv.read_ply(out / "mesh.ply")
    mv.write_html(out / "mesh.html", v, c, tri)

    print(f"frames: {n} in {wall:.1f}s | "
          f"blocks: {node.multi_mapper.static_mapper.block_count()} | "
          f"published: {stats} | "
          f"costmap has data: {costmap.has_data}")
    print(f"outputs in {out}: mesh.ply, tsdf.ply, esdf.ply, map.png, "
          f"map.yaml, mesh.html")


if __name__ == "__main__":
    main()
