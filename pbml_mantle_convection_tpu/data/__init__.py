from .dataset import (  # noqa: F401
    SnapshotDataset, SnapshotStore, TimePairDataset,
    select_snapshot_indices)
from .synthetic import synthetic_store  # noqa: F401
