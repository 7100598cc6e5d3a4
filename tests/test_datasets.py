"""Dataset loader tests: synthetic, recorded sequences, Replica format."""

import json

import numpy as np

from isaac_ros_nvblox_tpu.datasets.base import DataLoadResult
from isaac_ros_nvblox_tpu.datasets.recorded import (RecordedDataLoader,
                                                    SequenceRecorder)
from isaac_ros_nvblox_tpu.datasets.replica import ReplicaDataLoader
from isaac_ros_nvblox_tpu.datasets.synthetic import SyntheticDataLoader
from isaac_ros_nvblox_tpu.models.camera import Camera


def test_synthetic_loader_iterates():
    loader = SyntheticDataLoader(
        num_frames=3, with_color=True,
        camera=Camera(fx=40., fy=40., cx=19.5, cy=14.5, width=40, height=30))
    frames = list(loader)
    assert len(frames) == 3
    f = frames[0]
    assert f.depth.shape == (30, 40)
    assert f.color.shape == (30, 40, 3)
    assert f.T_L_C.shape == (4, 4)
    assert (f.depth > 0).any()


def test_recorded_sequence_roundtrip(tmp_path):
    cam = Camera(fx=50., fy=50., cx=15.5, cy=11.5, width=32, height=24)
    rec = SequenceRecorder(tmp_path / "seq", cam)
    rng = np.random.RandomState(0)
    for i in range(4):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = i * 0.1
        rec.add_pose(i * 0.5, T)
        rec.add_frame(i * 0.5 + 0.01, rng.rand(24, 32).astype(np.float32),
                      (rng.rand(24, 32, 3) * 255).astype(np.uint8))
    rec.finish()

    loader = RecordedDataLoader(tmp_path / "seq")
    frames = list(loader)
    assert len(frames) == 4
    np.testing.assert_allclose(frames[2].T_L_C[0, 3], 0.2, atol=1e-5)
    assert frames[0].color is not None


def test_recorded_sequence_pose_gap_gives_bad_frame(tmp_path):
    cam = Camera(fx=50., fy=50., cx=15.5, cy=11.5, width=32, height=24)
    rec = SequenceRecorder(tmp_path / "seq", cam)
    rec.add_pose(0.0, np.eye(4, dtype=np.float32))
    rec.add_frame(0.0, np.ones((24, 32), np.float32))
    rec.add_frame(99.0, np.ones((24, 32), np.float32))  # no pose near t=99
    rec.finish()
    loader = RecordedDataLoader(tmp_path / "seq")
    results = []
    while True:
        r, f = loader.load_next()
        if r == DataLoadResult.NO_MORE_DATA:
            break
        results.append(r)
    assert results == [DataLoadResult.SUCCESS, DataLoadResult.BAD_FRAME]


def test_recorded_tf_lead_time_streams_poses_ahead(tmp_path):
    """Bag-replay parity: poses are streamed tf_lead_time_s ahead of the
    image stream (rosbag_data_loader.cpp:83-150). A frame needing a pose
    that only exists later in the stream fails with lead 0 but succeeds
    when the lead covers it."""
    cam = Camera(fx=50., fy=50., cx=15.5, cy=11.5, width=32, height=24)
    rec = SequenceRecorder(tmp_path / "seq", cam)
    # Frame at t=1.0; its bracketing poses are at t=0.9 and t=1.4.
    rec.add_pose(0.9, np.eye(4, dtype=np.float32))
    T2 = np.eye(4, dtype=np.float32)
    T2[0, 3] = 1.0
    rec.add_pose(1.4, T2)
    rec.add_frame(1.0, np.ones((24, 32), np.float32))
    rec.finish()

    strict = RecordedDataLoader(tmp_path / "seq", tf_lead_time_s=0.0,
                                timestamp_tolerance_s=0.05)
    r, _ = strict.load_next()
    # Only the t=0.9 pose streamed; 1.0 is outside the 0.05 tolerance and
    # there is no bracketing later pose yet.
    assert r == DataLoadResult.BAD_FRAME

    lead = RecordedDataLoader(tmp_path / "seq", tf_lead_time_s=0.5,
                              timestamp_tolerance_s=0.05)
    r, f = lead.load_next()
    assert r == DataLoadResult.SUCCESS
    assert 0.0 < f.T_L_C[0, 3] < 1.0  # interpolated between the brackets


def test_replica_loader_format(tmp_path):
    """Build a tiny on-disk Replica-format dataset and load it."""
    import imageio.v2 as imageio
    root = tmp_path / "office_tiny"
    (root / "results").mkdir(parents=True)
    scale = 6553.5
    cam = {"fx": 30.0, "fy": 30.0, "cx": 15.5, "cy": 11.5,
           "w": 32, "h": 24, "scale": scale}
    (root / "cam_params.json").write_text(json.dumps({"camera": cam}))
    poses = []
    rng = np.random.RandomState(1)
    for i in range(3):
        depth_m = 1.0 + rng.rand(24, 32).astype(np.float32)
        imageio.imwrite(root / "results" / f"depth{i:06d}.png",
                        (depth_m * scale).astype(np.uint16))
        imageio.imwrite(root / "results" / f"frame{i:06d}.jpg",
                        (rng.rand(24, 32, 3) * 255).astype(np.uint8))
        T = np.eye(4)
        T[1, 3] = i
        poses.append(T.reshape(-1))
    np.savetxt(root / "traj.txt", np.stack(poses))

    loader = ReplicaDataLoader(root)
    frames = list(loader)
    assert len(frames) == 3
    assert frames[0].camera.width == 32
    # 16-bit depth decodes back to meters.
    assert 0.99 < frames[0].depth.min() and frames[0].depth.max() < 2.01
    np.testing.assert_allclose(frames[2].T_L_C[1, 3], 2.0, atol=1e-6)
