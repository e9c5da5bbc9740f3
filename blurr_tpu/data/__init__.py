"""Training data pipeline: sharded mmap datasets, deterministic resumable
loading, host/device prefetch, and deployment-exact preprocessing.

Net-new TPU-side capability — the reference ships no training pipeline
(SURVEY.md §0)."""

from .loader import ShardedBatchLoader, device_prefetch
from .shards import (
    MANIFEST_NAME,
    ShardedDataset,
    ShardWriter,
    is_sharded_dataset,
    write_dataset,
)
from .transform import Pi0TrainTransform, transform_for_config

__all__ = [
    "MANIFEST_NAME",
    "Pi0TrainTransform",
    "ShardedBatchLoader",
    "ShardedDataset",
    "ShardWriter",
    "device_prefetch",
    "is_sharded_dataset",
    "transform_for_config",
    "write_dataset",
]
