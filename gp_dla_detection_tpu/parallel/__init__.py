"""Parallel execution: device meshes, sharded inference, multi-host."""

from .mesh import (
    DATA_AXIS,
    SAMPLE_AXIS,
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
)
from .sharded_inference import ShardedRunConfig, process_spectra_sharded
from .sharded_multi import process_spectra_multi_sharded

__all__ = [
    "process_spectra_multi_sharded",
    "DATA_AXIS",
    "SAMPLE_AXIS",
    "make_mesh",
    "data_sharding",
    "replicated",
    "initialize_distributed",
    "ShardedRunConfig",
    "process_spectra_sharded",
]
