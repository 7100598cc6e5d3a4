"""Ablate the dynamic-pipeline scan: per-stage cost on real hardware.

Runs the bench scene through `_dynamic_replay_scan`-equivalent scans with
stages toggled (detect / masked TSDF / masked occupancy / freespace), each
as one lax.scan over 64 steps, and prints the differenced per-stage ms.
Methodology matches bench.py: device-resident frames, scan-amortized
dispatch, scalar-readback barrier, empty-scan baseline included.
"""

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E702

import dataclasses
import functools
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper import device_mapper as dm
    from isaac_ros_nvblox_tpu.mapper.multi_mapper import (MultiMapper,
                                                          _detect_dynamic_fused)
    from isaac_ros_nvblox_tpu.mapper.params import (MappingType,
                                                    MapperParams,
                                                    MultiMapperParams)
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene,
                                                   Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    n_frames = 16
    depths, poses = [], []
    for k in range(n_frames):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / n_frames, radius=1.5))
        depths.append(render_depth(scene, camera, T))
        poses.append(T)
    depths_r = jnp.concatenate([jnp.stack(depths)] * 4)
    poses_r = jnp.concatenate([jnp.stack(poses)] * 4)
    n_steps = int(depths_r.shape[0])
    depths_r.block_until_ready()

    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))
    world = WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                            origin_block=(-32, -32, -8))
    mm = MultiMapper(
        MultiMapperParams(mapping_type=MappingType.DYNAMIC,
                          block_capacity=16384,
                          static_mapper=dataclasses.replace(
                              params,
                              remove_small_connected_components=False)),
        world=world)
    sm, dmap = mm.static_mapper, mm.dynamic_mapper
    use_pallas = jax.default_backend() == "tpu"

    # Build the map + freespace once so detection has real hc content.
    times0 = jnp.asarray(25.0 * np.arange(n_steps), jnp.float32)
    mm.replay_frames_dynamic(depths_r, poses_r, times0, camera)
    region = sm.esdf_region(margin_blocks=0)
    free_origin_b = jnp.asarray(region[0], jnp.int32)
    free_dims_b = tuple(int(d) for d in region[1])

    snap = (sm.state, dict(sm.channels), sm.dirty, sm.esdf_dirty,
            dmap.state, dict(dmap.channels), dmap.dirty, dmap.esdf_dirty)

    @functools.partial(
        jax.jit,
        static_argnames=("stages",))
    def ablate_scan(s_state, s_ch, s_dirty, s_edirty, d_state, d_ch,
                    d_dirty, d_edirty, depths, T_L_Cs, times_ms, *,
                    stages: str):
        static_params = sm.params.projective
        occ_params = dmap.params.occupancy
        free_params = sm.params.freespace
        max_blocks = sm.max_blocks_per_frame
        vs = sm.voxel_size_m
        maxd = float(static_params.max_integration_distance_m)

        def step(carry, inp):
            ss, sch, sd, sed, ds, dch, dd, ded, last_ms, _acc = carry
            depth, T, t_ms = inp
            if "detp" in stages:
                from isaac_ros_nvblox_tpu.ops.detect_pallas import (
                    detect_dynamic_fused_pallas)
                mask = detect_dynamic_fused_pallas(
                    ss, sch["freespace_high_confidence"], depth, T,
                    camera=camera, voxel_size_m=vs, max_depth_m=maxd,
                    max_blocks=max_blocks)
                mask_u8 = mask.astype(jnp.uint8)
            elif "det2" in stages or "detect" in stages:
                sub = 2 if "det2" in stages else 1
                mask, _ = _detect_dynamic_fused(
                    ss, sch["freespace_high_confidence"], depth, T,
                    camera=camera, voxel_size_m=vs, max_depth_m=maxd,
                    subsample=sub)
                mask_u8 = mask.astype(jnp.uint8)
            else:
                mask_u8 = jnp.zeros(depth.shape, jnp.uint8)
            # Anti-DCE: the mask must feed the carried accumulator even when
            # no downstream stage consumes it.
            acc = carry[-1] + jnp.sum(mask_u8.astype(jnp.int32))
            if "tsdf" in stages:
                ss, d, w, sd, sed = dm._integrate_frame_fused(
                    ss, sch["tsdf_distance"], sch["tsdf_weight"], sd, sed,
                    depth, T, mask_u8, camera=camera, voxel_size_m=vs,
                    params=static_params, max_blocks=max_blocks,
                    use_pallas=use_pallas, mask_mode=1)
                sch = dict(sch, tsdf_distance=d, tsdf_weight=w)
            if "occ" in stages:
                ds, lo, ob, dd, ded = dm._integrate_occupancy_fused(
                    ds, dch["occupancy_log_odds"], dch["occupancy_observed"],
                    dd, ded, depth, T, mask_u8, camera=camera,
                    voxel_size_m=vs, params=occ_params,
                    proj_max_distance_m=float(
                        occ_params.max_integration_distance_m),
                    truncation_m=float(
                        occ_params.occupied_region_half_width_m),
                    max_blocks=dmap.max_blocks_per_frame, mask_mode=2,
                    use_pallas=use_pallas)
                dch = dict(dch, occupancy_log_odds=lo, occupancy_observed=ob)
            if "free" in stages:
                fparams = (dataclasses.replace(free_params,
                                               check_neighborhood=False)
                           if "nonbr" in stages else free_params)
                dims = None if "slow" in stages else free_dims_b
                org = None if "slow" in stages else free_origin_b
                cons, last, hc = dm._freespace_fused(
                    sch["freespace_consecutive_ms"],
                    sch["freespace_last_occupied_ms"],
                    sch["freespace_high_confidence"], ss,
                    sch["tsdf_distance"], sch["tsdf_weight"], T, t_ms,
                    last_ms, org, camera=camera, voxel_size_m=vs,
                    params=fparams, view_distance_m=maxd,
                    max_blocks=max_blocks, dims_b=dims)
                sch = dict(sch, freespace_consecutive_ms=cons,
                           freespace_last_occupied_ms=last,
                           freespace_high_confidence=hc)
            # Return the mutated channels (anti-DCE: reduced accumulator
            # alone would let XLA delete unused stages).
            return (ss, sch, sd, sed, ds, dch, dd, ded, t_ms, acc), None

        carry0 = (s_state, s_ch, s_dirty, s_edirty, d_state, d_ch,
                  d_dirty, d_edirty, jnp.float32(0.0), jnp.int32(0))
        carry, _ = jax.lax.scan(step, carry0, (depths, T_L_Cs, times_ms))
        return carry

    def _barrier(c):
        out = 0.0
        sch, dch = c[1], c[5]
        for a in (sch["tsdf_distance"], sch["freespace_consecutive_ms"],
                  dch["occupancy_log_odds"]):
            out += float(jnp.sum(a[..., :1]))
        return out + float(c[-1])

    def timed(stages, reps=3):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            c = ablate_scan(*snap, depths_r, poses_r, times0, stages=stages)
            _barrier(c)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / n_steps

    variants = ["", "detp", "tsdf", "free", "free_slow", "occ",
                # Interaction bisection (r5): full-stack cost exceeds the
                # sum of single-stage marginals by ~1.1 ms — find which
                # pairing carries it.
                "detp+tsdf", "detp+occ", "tsdf+occ", "tsdf+free",
                "detp+tsdf+occ", "detp+tsdf+occ+free"]
    out = {}
    for v in variants:
        timed(v, reps=1)  # compile
    for v in variants:
        out[v or "empty"] = round(timed(v), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
