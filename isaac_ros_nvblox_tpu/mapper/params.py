"""Mapper parameter tree — the three-tier config system.

Reference: nvblox's `MapperParams` + string->enum parsing with
warn-and-default (nvblox_ros/src/lib/mapper_initialization.cpp:27-109), the
`Param<T>::Description` system (node_params.hpp:37-300), and layered YAML
overlays (base + mode + camera, nvblox.launch.py:113-179).

TPU build keeps the same three tiers:
  (a) defaults in code — the dataclass field defaults below;
  (b) mode overlays — dicts in `MODE_OVERLAYS` (static / dynamic / people);
  (c) scene/user overlays — arbitrary nested dicts applied last.
Overlays are applied with `apply_overlay` (later-wins, dotted paths),
unknown keys warn-and-ignore, enum strings parse with warn-and-default —
matching the reference's tolerant parsing behavior.
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Any, Dict, Mapping, Optional

from isaac_ros_nvblox_tpu.ops.decay import OccupancyDecayParams, TsdfDecayParams
from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams
from isaac_ros_nvblox_tpu.ops.freespace import FreespaceIntegratorParams
from isaac_ros_nvblox_tpu.ops.mesh import MeshIntegratorParams
from isaac_ros_nvblox_tpu.ops.occupancy import OccupancyIntegratorParams
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams, WeightingFunctionType
from isaac_ros_nvblox_tpu.ops.view import ViewCalculatorParams, WorkspaceBoundsType

log = logging.getLogger(__name__)


class MappingType(enum.Enum):
    """Parity: nvblox MappingType (mapper_initialization.cpp string parse)."""
    STATIC_TSDF = "static_tsdf"
    STATIC_OCCUPANCY = "static_occupancy"
    DYNAMIC = "dynamic"
    HUMAN_WITH_STATIC_TSDF = "human_with_static_tsdf"
    HUMAN_WITH_STATIC_OCCUPANCY = "human_with_static_occupancy"


class EsdfMode(enum.Enum):
    """Parity: nvblox EsdfMode (2d slicing vs full 3d)."""
    K2D = "2d"
    K3D = "3d"


class ProjectiveLayerType(enum.Enum):
    TSDF = "tsdf"
    OCCUPANCY = "occupancy"


@dataclasses.dataclass
class EsdfSliceParams:
    """Slice heights (esdf_slice_* params, mapper_initialization.cpp:255-260,
    nvblox_node.cpp:1509-1513)."""
    esdf_slice_min_height: float = 0.1
    esdf_slice_max_height: float = 0.3
    esdf_slice_height: float = 0.3
    slice_height_above_plane_m: float = 0.1
    slice_height_thickness_m: float = 0.2


@dataclasses.dataclass
class MapperParams:
    """All per-mapper parameters (static_mapper.* / dynamic_mapper.* tier)."""
    projective: TsdfIntegratorParams = dataclasses.field(
        default_factory=TsdfIntegratorParams)
    occupancy: OccupancyIntegratorParams = dataclasses.field(
        default_factory=OccupancyIntegratorParams)
    view: ViewCalculatorParams = dataclasses.field(
        default_factory=ViewCalculatorParams)
    esdf: EsdfIntegratorParams = dataclasses.field(
        default_factory=EsdfIntegratorParams)
    esdf_slice: EsdfSliceParams = dataclasses.field(
        default_factory=EsdfSliceParams)
    mesh: MeshIntegratorParams = dataclasses.field(
        default_factory=MeshIntegratorParams)
    tsdf_decay: TsdfDecayParams = dataclasses.field(
        default_factory=TsdfDecayParams)
    occupancy_decay: OccupancyDecayParams = dataclasses.field(
        default_factory=OccupancyDecayParams)
    freespace: FreespaceIntegratorParams = dataclasses.field(
        default_factory=FreespaceIntegratorParams)
    # Depth preprocessing (mapper_initialization.cpp:160-161,239-244).
    do_depth_preprocessing: bool = False
    depth_preprocessing_num_dilations: int = 3
    # Mask preprocessing (mapper_initialization.cpp:113-133).
    remove_small_connected_components: bool = True
    connected_mask_component_size_threshold: int = 2000


@dataclasses.dataclass
class MultiMapperParams:
    """Top-level mapping configuration (multi_mapper.* + node-level tier)."""
    voxel_size_m: float = 0.05
    mapping_type: MappingType = MappingType.STATIC_TSDF
    esdf_mode: EsdfMode = EsdfMode.K2D
    block_capacity: int = 16384
    static_mapper: MapperParams = dataclasses.field(default_factory=MapperParams)
    # Dynamic-detection pixel stride (TPU-specific: the per-pixel freespace
    # lookup is gather-bound; 2 = 4x cheaper at 2x2 mask granularity).
    dynamic_detection_subsample: int = 1
    dynamic_mapper: MapperParams = dataclasses.field(
        default_factory=lambda: MapperParams(
            projective=TsdfIntegratorParams(max_integration_distance_m=4.0)))
    # Per-frame block budget of the foreground occupancy mapper: dynamic
    # objects cover a small masked footprint, so its integration batch (and
    # kernel grid) can be much smaller than the background mapper's.
    dynamic_max_blocks_per_frame: int = 512
    # Per-frame view-batch budget of the background (static) mapper; the
    # fusion kernel's fixed cost scales with this static batch, so size it
    # to the sensor/scene (overflow is counted, never silent).
    max_blocks_per_frame: int = 2048


# ---------------------------------------------------------------- overlays
MODE_OVERLAYS: Dict[str, Dict[str, Any]] = {
    # Parity with config/nvblox/specializations: dynamics + segmentation.
    "static": {"mapping_type": "static_tsdf"},
    "static_occupancy": {"mapping_type": "static_occupancy"},
    "dynamic": {"mapping_type": "dynamic"},
    "people_segmentation": {"mapping_type": "human_with_static_tsdf"},
}

_ENUM_FIELDS = {
    "mapping_type": MappingType,
    "esdf_mode": EsdfMode,
    "weighting_mode": WeightingFunctionType,
    "workspace_bounds_type": WorkspaceBoundsType,
}


def _parse_enum(cls, value, default):
    if isinstance(value, cls):
        return value
    try:
        return cls(value)
    except ValueError:
        log.warning("Unknown %s value %r; using default %r",
                    cls.__name__, value, default)
        return default


def apply_overlay(params: Any, overlay: Mapping[str, Any]) -> Any:
    """Apply a nested/dotted dict overlay to a (possibly frozen) dataclass
    tree, returning a new tree. Unknown keys warn and are ignored."""
    updates: Dict[str, Any] = {}
    for key, value in overlay.items():
        head, _, rest = key.partition(".")
        if not hasattr(params, head):
            log.warning("Unknown parameter %r (on %s); ignored",
                        key, type(params).__name__)
            continue
        # Merge successive overlays touching the same subtree (dotted and
        # nested forms may both address one field).
        current = updates.get(head, getattr(params, head))
        if rest:
            updates[head] = apply_overlay(current, {rest: value})
        elif dataclasses.is_dataclass(current) and isinstance(value, Mapping):
            updates[head] = apply_overlay(current, value)
        elif head in _ENUM_FIELDS:
            updates[head] = _parse_enum(_ENUM_FIELDS[head], value, current)
        else:
            updates[head] = value
    return dataclasses.replace(params, **updates)


def make_params(mode: Optional[str] = None,
                overlay: Optional[Mapping[str, Any]] = None
                ) -> MultiMapperParams:
    """Build the parameter tree: defaults + mode overlay + user overlay."""
    params = MultiMapperParams()
    if mode is not None:
        mode_overlay = MODE_OVERLAYS.get(mode)
        if mode_overlay is None:
            log.warning("Unknown mode %r; using defaults", mode)
        else:
            params = apply_overlay(params, mode_overlay)
    if overlay:
        params = apply_overlay(params, overlay)
    return params


def projective_layer_type(mapping_type: MappingType) -> ProjectiveLayerType:
    """Which projective layer the static mapper maintains
    (parity: Mapper::projective_layer_type, layer_publishing.cpp:747)."""
    if mapping_type in (MappingType.STATIC_OCCUPANCY,
                        MappingType.HUMAN_WITH_STATIC_OCCUPANCY):
        return ProjectiveLayerType.OCCUPANCY
    return ProjectiveLayerType.TSDF


def param_tree_string(params: Any, indent: int = 0) -> str:
    """Pretty-print the parameter tree (parity:
    parameters::parameterTreeToString, nvblox_node.cpp:119-124)."""
    lines = []
    pad = "  " * indent
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            lines.append(f"{pad}{f.name}:")
            lines.append(param_tree_string(v, indent + 1))
        else:
            v_str = v.value if isinstance(v, enum.Enum) else v
            lines.append(f"{pad}{f.name}: {v_str}")
    return "\n".join(lines)
