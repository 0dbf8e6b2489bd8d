from .control import CONTROL_SCHEMA, filter_control
from .partition_spec import PartitionSpec, parse_partition_config

__all__ = [
    "CONTROL_SCHEMA",
    "filter_control",
    "PartitionSpec",
    "parse_partition_config",
]
