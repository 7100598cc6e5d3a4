"""Tests for runtime components: transformer, queues, rates, costmap,
adapters, params, timing."""

import concurrent.futures
import time

import numpy as np
import pytest

from isaac_ros_nvblox_tpu.mapper.params import (MappingType, make_params,
                                                param_tree_string,
                                                projective_layer_type,
                                                ProjectiveLayerType)
from isaac_ros_nvblox_tpu.ops.tsdf import WeightingFunctionType
from isaac_ros_nvblox_tpu.runtime.costmap import (CostmapLayerParams,
                                                  FREE_SPACE, LETHAL_OBSTACLE,
                                                  INSCRIBED_INFLATED_OBSTACLE,
                                                  NO_INFORMATION,
                                                  NvbloxCostmapLayer,
                                                  distance_to_cost)
from isaac_ros_nvblox_tpu.runtime.msgs import (DistanceMapSlice, Header,
                                               Index3D, MeshBlockMsg, MeshMsg,
                                               MessageBus)
from isaac_ros_nvblox_tpu.runtime.adapters import MeshLayerAdapter
from isaac_ros_nvblox_tpu.runtime.queues import (DropOldestQueue,
                                                 ServiceRequestQueue)
from isaac_ros_nvblox_tpu.runtime.transformer import Transformer
from isaac_ros_nvblox_tpu.utils.timing import (DelaysRegistry, RatesRegistry,
                                               TimingRegistry)


# ------------------------------------------------------------- transformer
def _pose(x):
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = x
    return T


def test_transformer_nearest_and_tolerance():
    tf = Transformer(timestamp_tolerance_s=0.05, use_interpolation=False)
    tf.add_pose("cam", 1.0, _pose(1.0))
    tf.add_pose("cam", 2.0, _pose(2.0))
    T = tf.lookup_transform_to_global_frame("cam", 1.01)
    assert T is not None and T[0, 3] == 1.0
    assert tf.lookup_transform_to_global_frame("cam", 1.5) is None
    assert not tf.can_transform("cam", 3.0)
    assert not tf.can_transform("other", 1.0)


def test_transformer_interpolation():
    tf = Transformer(timestamp_tolerance_s=0.01, use_interpolation=True)
    tf.add_pose("cam", 0.0, _pose(0.0))
    tf.add_pose("cam", 1.0, _pose(1.0))
    T = tf.lookup_transform_to_global_frame("cam", 0.5)
    assert T is not None
    np.testing.assert_allclose(T[0, 3], 0.5, atol=1e-5)


def test_transformer_static_chain():
    tf = Transformer()
    tf.add_static_transform("base", "cam", _pose(0.1))
    tf.add_pose("base", 1.0, _pose(5.0))
    T = tf.lookup_transform_to_global_frame("cam", 1.0)
    np.testing.assert_allclose(T[0, 3], 5.1, atol=1e-6)


# ------------------------------------------------------------------ queues
def test_drop_oldest_queue():
    q = DropOldestQueue("test", max_length=3)
    for i in range(5):
        q.push(i)
    assert q.dropped_count == 2
    items = q.extract_ready(lambda x: x % 2 == 0)
    assert items == [2, 4]
    assert len(q) == 1  # 3 stays queued


def test_service_queue_runs_on_processing_thread():
    sq = ServiceRequestQueue()
    fut = sq.submit(lambda: 42)
    assert not fut.done()
    assert sq.process_all() == 1
    assert fut.result(timeout=1) == 42
    # Exceptions propagate to the caller.
    fut2 = sq.submit(lambda: 1 / 0)
    sq.process_all()
    with pytest.raises(ZeroDivisionError):
        fut2.result(timeout=1)


# ----------------------------------------------------------------- timing
def test_timing_and_rates_registries():
    t = TimingRegistry()
    t.record("a/b", 0.01)
    t.record("a/b", 0.03)
    assert t.get("a/b").count == 2
    assert abs(t.get("a/b").mean - 0.02) < 1e-9
    assert "a/b" in t.to_string()

    r = RatesRegistry()
    fake = [0.0]
    r.set_clock(lambda: fake[0])
    for _ in range(5):
        r.tick("x")
        fake[0] += 0.1
    assert abs(r.rate_hz("x") - 10.0) < 1e-6

    d = DelaysRegistry()
    d.record("y", 0.25)
    assert d.mean_s("y") == 0.25


# ----------------------------------------------------------------- costmap
def test_distance_to_cost_mapping():
    p = CostmapLayerParams(inflation_distance_m=0.5,
                           max_obstacle_distance_m=1.0, min_distance_m=0.0)
    d = np.asarray([[-0.1, 0.2, 0.7, 2.0, 1000.0]], np.float32)
    cost = distance_to_cost(d, unknown_value=1000.0, params=p)
    assert cost[0, 0] == LETHAL_OBSTACLE
    assert cost[0, 1] == INSCRIBED_INFLATED_OBSTACLE
    assert 0 < cost[0, 2] < INSCRIBED_INFLATED_OBSTACLE
    assert cost[0, 3] == FREE_SPACE
    assert cost[0, 4] == NO_INFORMATION


def test_costmap_layer_bus_integration():
    bus = MessageBus()
    layer = NvbloxCostmapLayer(bus)
    data = np.full((10, 10), 2.0, np.float32)
    data[5, 5] = -0.1
    msg = DistanceMapSlice(header=Header(), origin_x_m=0.0, origin_y_m=0.0,
                           resolution_m=0.1, width=10, height=10,
                           unknown_value=1000.0, data=data)
    bus.publish("~/static_map_slice", msg)
    assert layer.has_data
    assert layer.cost_at(0.55, 0.55) == LETHAL_OBSTACLE
    assert layer.cost_at(0.05, 0.05) == FREE_SPACE
    assert layer.cost_at(-1.0, 0.0) == NO_INFORMATION
    master = np.zeros((20, 20), np.uint8)
    layer.update_costs(master, 0.0, 0.0, 0.05)
    assert master.max() == LETHAL_OBSTACLE


# ---------------------------------------------------------------- adapters
def test_mesh_adapter_flattens_and_removes():
    bus = MessageBus()
    out = []
    adapter = MeshLayerAdapter(bus)
    bus.subscribe("~/mesh_serialized", out.append)

    def block(idx, n):
        return MeshBlockMsg(index=Index3D(*idx),
                            vertices=np.zeros((3 * n, 3), np.float32),
                            colors=np.zeros((3 * n, 3), np.uint8),
                            triangles=np.arange(3 * n).reshape(n, 3))

    bus.publish("~/mesh", MeshMsg(header=Header(), block_size_m=0.4,
                                  blocks=[block((0, 0, 0), 2),
                                          block((1, 0, 0), 3)],
                                  removed_blocks=[]))
    assert out[-1].triangles.shape[0] == 5
    # Triangle indices must be re-indexed into the flat vertex buffer.
    assert out[-1].triangles.max() == out[-1].vertices.shape[0] - 1
    bus.publish("~/mesh", MeshMsg(header=Header(), block_size_m=0.4,
                                  blocks=[],
                                  removed_blocks=[Index3D(0, 0, 0)]))
    assert out[-1].triangles.shape[0] == 3


# ------------------------------------------------------------------ params
def test_params_overlay_and_enum_parsing():
    p = make_params(mode="dynamic", overlay={
        "voxel_size_m": 0.1,
        "static_mapper.projective.max_weight": 20.0,
        "static_mapper": {"projective": {"weighting_mode": "constant"}},
    })
    assert p.mapping_type == MappingType.DYNAMIC
    assert p.voxel_size_m == 0.1
    assert p.static_mapper.projective.max_weight == 20.0
    assert p.static_mapper.projective.weighting_mode == \
        WeightingFunctionType.CONSTANT


def test_params_unknown_keys_warn_not_raise():
    p = make_params(overlay={"definitely_not_a_param": 1})
    assert p.voxel_size_m == 0.05  # defaults intact


def test_params_bad_enum_warns_and_defaults():
    p = make_params(overlay={"esdf_mode": "4d"})
    assert p.esdf_mode.value == "2d"


def test_projective_layer_type_mapping():
    assert projective_layer_type(MappingType.STATIC_TSDF) \
        == ProjectiveLayerType.TSDF
    assert projective_layer_type(MappingType.STATIC_OCCUPANCY) \
        == ProjectiveLayerType.OCCUPANCY


def test_param_tree_string():
    s = param_tree_string(make_params())
    assert "voxel_size_m: 0.05" in s
    assert "max_integration_distance_m" in s
