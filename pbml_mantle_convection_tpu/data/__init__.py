from .dataset import (  # noqa: F401
    ConvAEDataset, SnapshotDataset, SnapshotStore, TimePairDataset,
    UnstructuredDataset, select_snapshot_indices)
from .synthetic import synthetic_store  # noqa: F401
