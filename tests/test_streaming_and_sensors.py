"""Layer streaming budget/exclusion + sensor helper tests."""

import numpy as np

from isaac_ros_nvblox_tpu.runtime.layer_streaming import (BlockExclusionParams,
                                                          LayerStreamer,
                                                          StreamingParams)
from isaac_ros_nvblox_tpu.runtime.msgs import MessageBus
from isaac_ros_nvblox_tpu.runtime.sensor_helpers import (EmitterPhaseSynchronizer,
                                                         EmitterSyncParams,
                                                         FrameMeta,
                                                         FrameSplitter)


def test_streamer_respects_bandwidth_budget():
    t = [0.0]
    streamer = LayerStreamer(
        block_size_m=0.4,
        params=StreamingParams(bandwidth_mbps=8.0, bytes_per_block=100_000),
        clock=lambda: t[0])
    streamer.mark_dirty([(i, 0, 0) for i in range(100)])
    t[0] = 0.1  # 8 Mbps * 0.1 s / 8 = 100 KB -> 1 block... first call uses
    # the default 0.1 s window as well.
    first = streamer.select_blocks()
    assert len(first) == 1
    assert streamer.num_pending == 99
    # A long gap accrues a bigger budget.
    t[0] = 2.0
    more = streamer.select_blocks()
    assert len(more) > 10


def test_streamer_prioritizes_near_and_excludes_far():
    t = [0.0]
    streamer = LayerStreamer(
        block_size_m=1.0,
        params=StreamingParams(bandwidth_mbps=1000.0),
        exclusion=BlockExclusionParams(exclusion_center_m=(0.0, 0.0),
                                       exclusion_radius_m=5.0,
                                       exclusion_height_m=2.0),
        clock=lambda: t[0])
    streamer.mark_dirty([(0, 0, 0), (3, 0, 0), (10, 0, 0), (0, 0, 5)])
    t[0] = 1.0
    out = streamer.select_blocks()
    # Far (10,0,0) and high (0,0,5) are excluded; near-first ordering.
    assert out == [(0, 0, 0), (3, 0, 0)]
    assert streamer.num_pending == 0


def test_frame_splitter_requires_alternation():
    bus = MessageBus()
    got = {"on": 0, "off": 0}
    bus.subscribe("~/splitter/emitter_on/frame",
                  lambda f: got.__setitem__("on", got["on"] + 1))
    bus.subscribe("~/splitter/emitter_off/frame",
                  lambda f: got.__setitem__("off", got["off"] + 1))
    sp = FrameSplitter(bus)
    # Constant mode: nothing forwarded.
    for i in range(3):
        sp.callback(FrameMeta(data=i, stamp_s=i * 0.03, emitter_on=True))
    assert got == {"on": 0, "off": 0}
    # Alternation starts -> frames flow to their branches.
    sp.callback(FrameMeta(data=3, stamp_s=0.09, emitter_on=False))
    sp.callback(FrameMeta(data=4, stamp_s=0.12, emitter_on=True))
    sp.callback(FrameMeta(data=5, stamp_s=0.15, emitter_on=False))
    assert got["on"] == 1 and got["off"] == 2


def test_emitter_synchronizer_separates_phases():
    params = EmitterSyncParams(frame_period_s=0.1, correction_gain=1.0)
    sync = EmitterPhaseSynchronizer(["cam0", "cam1"], params)
    # Both cameras currently fire at phase 0 -> cam1 must shift by half a
    # period (its target phase is 0.05).
    sync.observe_frame("cam0", 10.0, emitter_on=True)
    sync.observe_frame("cam1", 10.0, emitter_on=True)
    corr = sync.update()
    assert abs(corr["cam0"]) < 1e-9
    assert abs(abs(corr["cam1"]) - 0.05) < 1e-9
    # After applying, cam1 at phase 0.05 -> no further correction.
    sync.observe_frame("cam1", 10.25, emitter_on=True)  # phase 0.05
    corr2 = sync.update()
    assert abs(corr2["cam1"]) < 1e-9
