from .dataset import (  # noqa: F401
    ConvAEDataset, SnapshotDataset, SnapshotStore, TimePairDataset,
    UnstructuredDataset, select_snapshot_indices)
from .prefetch import prefetch_iter  # noqa: F401
from .synthetic import synthetic_store, synthetic_store_memmap  # noqa: F401
