"""Pose-graph submap layer: keyframing, SE(3) optimization, global fusion.

North-star capability beyond reference parity (BASELINE.json config #5).
"""

import numpy as np
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
from isaac_ros_nvblox_tpu.mapper.submaps import (PoseGraph, SubmapCollection,
                                                 SubmapParams, se3_exp,
                                                 se3_log)
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                               render_depth)

CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
SCENE = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))


def _make_mapper():
    return DeviceMapper(
        voxel_size_m=0.05,
        world=WorldGridConfig(dims=(24, 24, 16), capacity=4096,
                              origin_block=(-12, -12, -4)),
        enable_color=False, enable_esdf=False, max_blocks_per_frame=1024)


def test_se3_log_exp_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        xi = jnp.asarray(rng.randn(6) * 0.3, jnp.float32)
        back = se3_log(se3_exp(xi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   atol=2e-2)  # first-order v-convention


def test_pose_graph_closes_loop():
    """A drifted 4-node chain with a ground-truth loop closure: optimization
    drives the closure residual down ~arbitrarily, odometry bends a bit."""
    # Ground truth: square loop in x-y.
    gt = []
    for k, (x, y, th) in enumerate([(0, 0, 0), (2, 0, np.pi / 2),
                                    (2, 2, np.pi), (0, 2, -np.pi / 2)]):
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(th), np.sin(th)
        T[:2, :2] = [[c, -s], [s, c]]
        T[0, 3], T[1, 3] = x, y
        gt.append(T)
    # Drifted estimates: each hop's translation stretched 10%.
    est = [gt[0]]
    for k in range(1, 4):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        rel = rel.copy()
        rel[:3, 3] *= 1.10
        est.append((est[-1] @ rel).astype(np.float32))

    g = PoseGraph()
    for k in range(1, 4):
        g.add_between(k - 1, k, np.linalg.inv(est[k - 1]) @ est[k],
                      weight=1.0)
    # Loop closure: node 3 truly sits at inv(gt0) @ gt3 relative to node 0.
    g.add_between(0, 3, np.linalg.inv(gt[0]) @ gt[3], weight=100.0)

    before = g.residual_norm(est)
    opt = g.optimize(est, iters=30)
    after = g.residual_norm(opt)
    assert after < before * 0.05
    # The closure should pull node 3 near its true pose.
    err3 = np.linalg.norm(opt[3][:3, 3] - gt[3][:3, 3])
    est_err3 = np.linalg.norm(est[3][:3, 3] - gt[3][:3, 3])
    assert err3 < 0.25 * est_err3


def test_keyframe_policy_spawns_submaps():
    col = SubmapCollection(_make_mapper,
                           SubmapParams(max_translation_m=0.5))
    T = np.eye(4, dtype=np.float32)
    depth = np.asarray(render_depth(SCENE, CAM, jnp.asarray(orbit_pose(0.0))))
    for k in range(4):
        Tk = np.asarray(orbit_pose(0.0)).astype(np.float32)
        Tk[0, 3] += 0.3 * k  # walk in x: new submap every ~2 frames
        col.integrate_depth(depth, Tk, CAM)
    assert col.num_submaps >= 2
    # Consecutive submaps got odometry between-factors.
    assert len(col.graph.factors) == col.num_submaps - 1


def test_submap_fusion_corrects_drift():
    """Two submaps of the same sphere; the second submap's odometry anchor
    drifts by 12 cm. Fusing with the loop-closure-optimized anchors gives a
    tighter TSDF at the true surface than fusing the drifted estimates."""
    # Slow orbit (~7.5 deg/frame) so both windows observe the same sphere
    # face; a 0.5 rad rotation threshold splits the 8 frames into two
    # 4-frame submaps.
    col = SubmapCollection(_make_mapper,
                           SubmapParams(max_translation_m=10.0,
                                        max_rotation_rad=0.5))
    n_frames = 8
    drift = np.eye(4, dtype=np.float32)
    drift[0, 3] = 0.15  # injected odometry error after the first window
    for k in range(n_frames):
        T_true = np.asarray(orbit_pose(2 * np.pi * k / 48)).astype(
            np.float32)
        T_est = T_true if k < 4 else (drift @ T_true).astype(np.float32)
        depth = np.asarray(render_depth(SCENE, CAM, jnp.asarray(T_true)))
        col.integrate_depth(depth, T_est, CAM)
    assert col.num_submaps == 2

    # Loop closure from ground truth: the true relative anchor transform.
    T0, T1e = col.T_W_S_est
    T1_true = np.linalg.inv(drift) @ T1e  # undo the injected drift
    col.add_loop_closure(0, 1, np.linalg.inv(T0) @ T1_true, weight=100.0)
    col.optimize(iters=25)

    # Optimization recovers the injected drift at the anchor.
    anchor_err_opt = np.linalg.norm(
        col.T_W_S_opt[1][:3, 3]
        - (np.linalg.inv(drift) @ col.T_W_S_est[1])[:3, 3])
    assert anchor_err_opt < 0.02  # from 0.15 m of drift

    # Cross-submap CONSISTENCY in the overlap: splat each submap alone
    # into the same world grid and compare the TSDFs where both observed.
    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    world = WorldGridConfig(dims=(24, 24, 16), capacity=4096,
                            origin_block=(-12, -12, -4))

    def rows(use_optimized, k):
        f = col.fuse(world=world, use_optimized=use_optimized, indices=[k])
        sg = np.asarray(f.state.slot_grid)
        d = np.asarray(f.channels["tsdf_distance"])
        w = np.asarray(f.channels["tsdf_weight"])
        # Dense (X, Y, Z) views keyed by world cell.
        n = f.block_count()
        dd = np.zeros((24, 24, 16, 512), np.float32)
        ww = np.zeros((24, 24, 16, 512), np.float32)
        cells = np.argwhere(sg >= 0)
        slots = sg[cells[:, 0], cells[:, 1], cells[:, 2]]
        dd[cells[:, 0], cells[:, 1], cells[:, 2]] = d[slots]
        ww[cells[:, 0], cells[:, 1], cells[:, 2]] = w[slots]
        return dd, ww

    def consistency(use_optimized):
        d0, w0 = rows(use_optimized, 0)
        d1, w1 = rows(use_optimized, 1)
        overlap = (w0 > 0.5) & (w1 > 0.5)
        assert overlap.sum() > 500  # the windows genuinely overlap
        return float(np.mean(np.abs(d0[overlap] - d1[overlap])))

    c_bad = consistency(False)
    c_good = consistency(True)
    assert c_good < 0.4 * c_bad, (c_good, c_bad)
    assert c_good < 0.05  # sub-voxel agreement after optimization

    # The fused mapper is a full citizen: meshing works on it.
    fused_good = col.fuse(use_optimized=True)
    from isaac_ros_nvblox_tpu.mapper import device_io
    device_io.update_mesh_layer(fused_good)
    v, c, t = fused_good.mesh_layer.as_arrays()
    assert len(t) > 50


def test_allgather_submaps_single_process_identity():
    """allgather_submaps on one process must reproduce the collection:
    same anchors, same TSDF mass, and the odometry chain reconstructed
    from the gathered anchors (the multi-process path is exercised for
    real in tests/test_distributed.py)."""
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.parallel.distributed import allgather_submaps

    col = SubmapCollection(_make_mapper, SubmapParams(max_translation_m=0.4,
                                                      max_rotation_rad=3.0))
    for k in range(3):
        T = orbit_pose(2 * np.pi * k / 6, radius=1.0, height=1.0)
        depth = render_depth(SCENE, CAM, jnp.asarray(T))
        col.integrate_depth(np.asarray(depth), np.asarray(T), CAM)
    assert col.num_submaps >= 2
    n = col.num_submaps
    w_before = [float(jnp.sum(m.channels["tsdf_weight"]))
                for m in col.mappers]

    g = allgather_submaps(col)
    assert g.num_submaps == n
    assert len(g.graph.factors) == n - 1   # odometry chain reconstructed
    for k in range(n):
        np.testing.assert_allclose(g.T_W_S_est[k], col.T_W_S_est[k],
                                   atol=1e-6)
        assert abs(float(jnp.sum(g.mappers[k].channels["tsdf_weight"]))
                   - w_before[k]) < 1e-3
        assert g.mappers[k].block_count() == col.mappers[k].block_count()
    for k, f in enumerate(g.graph.factors):
        ref = np.linalg.inv(np.asarray(col.T_W_S_est[k], np.float64)) \
            @ np.asarray(col.T_W_S_est[k + 1], np.float64)
        np.testing.assert_allclose(f.T_i_j, ref.astype(np.float32),
                                   atol=1e-5)
    # The gathered collection optimizes and fuses like the original.
    g.optimize(iters=3)
    fused = g.fuse()
    assert fused.block_count() > 0
