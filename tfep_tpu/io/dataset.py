"""Host-side datasets feeding device batches.

The data layer is deliberately host-side numpy: trajectory frames are loaded,
selected and batched on the host and shipped to the device as whole sharded
batches (frames axis), so nothing here ever traces. Samples are dicts of
arrays keyed like the reference's datasets
(/root/reference/tfep/io/dataset/dict.py:29-75,
/root/reference/tfep/io/dataset/merged.py:27-80,
/root/reference/tfep/io/dataset/traj.py:382-460).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = ['Dataset', 'DictDataset', 'MergedDataset', 'Subset',
           'TrajectorySubset']


class Dataset:
    """Map-style dataset: ``__len__`` + ``__getitem__`` -> dict of arrays."""

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Stack the samples at ``indices`` into a batch dict (host-side)."""
        samples = [self[int(i)] for i in indices]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DictDataset(Dataset):
    """In-memory dataset over a dict of equal-length arrays."""

    def __init__(self, data: Dict[str, Sequence]):
        self._data = {k: np.asarray(v) for k, v in data.items()}
        lengths = {k: len(v) for k, v in self._data.items()}
        if len(set(lengths.values())) > 1:
            raise ValueError(f'All arrays must have equal length: {lengths}')

    @property
    def keys(self) -> List[str]:
        return list(self._data)

    def __len__(self):
        return len(next(iter(self._data.values())))

    def __getitem__(self, index):
        if isinstance(index, str):
            return self._data[index]
        return {k: v[index] for k, v in self._data.items()}

    def get_batch(self, indices):
        indices = np.asarray(indices)
        return {k: v[indices] for k, v in self._data.items()}


class MergedDataset(Dataset):
    """Zip-merge datasets with disjoint keys and equal lengths."""

    def __init__(self, *datasets: Dataset):
        if len(datasets) == 0:
            raise ValueError('At least one dataset is required.')
        lengths = {len(d) for d in datasets}
        if len(lengths) > 1:
            raise ValueError('All merged datasets must have equal length.')
        # Verify key disjointness using the first sample.
        seen = set()
        for d in datasets:
            keys = set(d[0].keys())
            overlap = seen & keys
            if overlap:
                raise ValueError(f'Duplicate keys across datasets: {overlap}')
            seen |= keys
        self._datasets = datasets

    def __len__(self):
        return len(self._datasets[0])

    def __getitem__(self, index):
        out = {}
        for d in self._datasets:
            out.update(d[index])
        return out

    def get_batch(self, indices):
        out = {}
        for d in self._datasets:
            out.update(d.get_batch(indices))
        return out


class Subset(Dataset):
    """Arbitrary-index subset of a dataset (the reference's TrajectorySubset)."""

    def __init__(self, dataset: Dataset, indices: Sequence[int]):
        self._dataset = dataset
        self._indices = np.asarray(indices)

    @property
    def dataset(self):
        return self._dataset

    @property
    def indices(self):
        return self._indices

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, index):
        return self._dataset[int(self._indices[index])]

    def get_batch(self, indices):
        return self._dataset.get_batch(self._indices[np.asarray(indices)])


#: Reference-API alias (the reference names this TrajectorySubset).
TrajectorySubset = Subset
