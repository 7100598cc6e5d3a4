"""YAML layered-config tests (parity: launch-file YAML merging)."""

from pathlib import Path

from isaac_ros_nvblox_tpu.mapper.params import MappingType
from isaac_ros_nvblox_tpu.runtime.config_loader import load_config

ROOT = Path(__file__).resolve().parents[1]
CFG = ROOT / "examples" / "config" / "nvblox"


def test_base_config_loads():
    node, mapper = load_config([CFG / "nvblox_base.yaml"])
    assert node.tick_period_ms == 10.0
    assert node.update_esdf_rate_hz == 10.0
    assert mapper.voxel_size_m == 0.05
    assert mapper.mapping_type == MappingType.STATIC_TSDF
    assert mapper.static_mapper.projective.max_integration_distance_m == 7.0


def test_specialization_overrides_base():
    node, mapper = load_config([
        CFG / "nvblox_base.yaml",
        CFG / "specializations" / "nvblox_dynamics.yaml",
    ])
    assert mapper.mapping_type == MappingType.DYNAMIC
    # Base values survive where not overridden.
    assert mapper.static_mapper.projective.max_integration_distance_m == 7.0
    assert mapper.dynamic_mapper.projective.max_integration_distance_m == 4.0


def test_segmentation_specialization():
    _, mapper = load_config([
        CFG / "nvblox_base.yaml",
        CFG / "specializations" / "nvblox_segmentation.yaml",
    ])
    assert mapper.mapping_type == MappingType.HUMAN_WITH_STATIC_TSDF
    assert mapper.static_mapper.connected_mask_component_size_threshold == 2000
