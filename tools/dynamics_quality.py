"""Quantify dynamic-detection quality: Pallas voxel-direction detector and
the device CC filter vs the exact per-pixel path vs geometric ground truth.

VERDICT r3 weak #7: the Pallas detector marks decimated-pixel footprints
and the CC filter counts components at 4x-downsampled granularity — both
documented trade-offs, but with no quantified false-positive/negative
rates on a realistic moving-object scene. This tool builds confident
freespace from a static orbit, then flies an intruder sphere through the
room and reports per-frame pixel rates:

  * GT dynamic pixels: intruder-occluded pixels (depth_with_intruder <
    static_depth - 2 voxels) within detection range;
  * exact path: multi_mapper._detect_dynamic_fused at subsample=1;
  * pallas path: ops.detect_pallas.detect_dynamic_fused_pallas;
  * pallas+CC: after remove_small_connected_components_device.

Writes DYNAMICS_QUALITY.json.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E401,E702

import dataclasses
import json

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.multi_mapper import (
        MultiMapper, _detect_dynamic_fused)
    from isaac_ros_nvblox_tpu.mapper.params import (MapperParams,
                                                    MappingType,
                                                    MultiMapperParams)
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene,
                                                   Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    vox = 0.05
    static_prims = (
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    )
    scene = Scene(primitives=static_prims)
    n_build = 16
    depths, poses = [], []
    for k in range(n_build):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / n_build, radius=1.5))
        depths.append(render_depth(scene, camera, T))
        poses.append(T)
    depths_r = jnp.stack(depths * 4)
    poses_r = jnp.stack(poses * 4)

    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))
    mm = MultiMapper(
        MultiMapperParams(mapping_type=MappingType.DYNAMIC,
                          block_capacity=16384,
                          static_mapper=dataclasses.replace(
                              params,
                              remove_small_connected_components=False)),
        world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                              origin_block=(-32, -32, -8)))
    times = jnp.asarray(300.0 * np.arange(64), jnp.float32)
    mm.replay_frames_dynamic(depths_r, poses_r, times, camera)
    hc = mm.static_mapper.channels["freespace_high_confidence"]
    n_hc = int(jnp.sum(hc.astype(jnp.int32)))
    print(f"high-confidence freespace voxels: {n_hc}", flush=True)

    sm = mm.static_mapper
    max_depth = float(params.projective.max_integration_distance_m)
    use_pallas = jax.default_backend() == "tpu"

    frames = []
    for k in range(8):
        # Intruder flies across the room through confident freespace.
        t = k / 7.0
        center = (-1.6 + 3.2 * t, 1.4 - 2.2 * t, 1.0)
        intr_scene = Scene(primitives=static_prims
                           + (Sphere(center=center, radius=0.25),))
        T = jnp.asarray(orbit_pose(2 * np.pi * (k % n_build) / n_build,
                                   radius=1.5))
        d_static = render_depth(scene, camera, T)
        d_intr = render_depth(intr_scene, camera, T)
        gt = np.asarray((d_intr < d_static - 2 * vox)
                        & (d_intr > 0) & (d_intr <= max_depth))

        exact, _ = _detect_dynamic_fused(
            sm.state, hc, d_intr, T, camera=camera, voxel_size_m=vox,
            max_depth_m=max_depth, subsample=1)
        exact = np.asarray(exact)
        row = {"frame": k, "gt_pixels": int(gt.sum()),
               "exact_detected": int(exact.sum())}
        if use_pallas:
            from isaac_ros_nvblox_tpu.ops.detect_pallas import (
                detect_dynamic_fused_pallas)
            from isaac_ros_nvblox_tpu.ops.masking import (
                remove_small_connected_components_device)
            pal = detect_dynamic_fused_pallas(
                sm.state, hc, d_intr, T, camera=camera, voxel_size_m=vox,
                max_depth_m=max_depth, max_blocks=2048)
            cc = remove_small_connected_components_device(
                pal, size_threshold=100)
            pal = np.asarray(pal)
            cc = np.asarray(cc)
        else:
            pal = cc = None

        def rates(mask, name):
            tp = int((mask & gt).sum())
            fp = int((mask & ~gt).sum())
            fn = int((~mask & gt).sum())
            n_gt = max(int(gt.sum()), 1)
            n_neg = max(int((~gt).sum()), 1)
            row[f"{name}_tpr"] = round(tp / n_gt, 4)
            row[f"{name}_fnr"] = round(fn / n_gt, 4)
            row[f"{name}_fpr"] = round(fp / n_neg, 5)
            row[f"{name}_fp_pixels"] = fp

        rates(exact, "exact")
        if pal is not None:
            rates(pal, "pallas")
            rates(cc, "pallas_cc")
        frames.append(row)
        print(row, flush=True)

    def mean(key):
        vals = [f[key] for f in frames if key in f]
        return round(float(np.mean(vals)), 4) if vals else None

    doc = {
        "note": ("GT = intruder-occluded pixels; detection requires the "
                 "occluded point to sit in already-confident freespace, so "
                 "TPR < 1 near walls/entry frames is expected (the "
                 "reference's freespace-driven dynamics has the same "
                 "semantics, dynamics.cpp). FPR quantifies the decimated-"
                 "footprint dilation of the Pallas detector and the 4x CC "
                 "granularity."),
        "high_confidence_voxels": n_hc,
        "frames": frames,
        "summary": {k: mean(k) for k in
                    ("exact_tpr", "exact_fpr", "pallas_tpr", "pallas_fpr",
                     "pallas_cc_tpr", "pallas_cc_fpr")},
        "device": "tpu" if use_pallas else "cpu",
    }
    pathlib.Path("/root/repo/DYNAMICS_QUALITY.json").write_text(
        json.dumps(doc, indent=2))
    print("wrote DYNAMICS_QUALITY.json", flush=True)


if __name__ == "__main__":
    main()
