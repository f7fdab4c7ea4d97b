"""TFEP logger: per-sample scalar store feeding the free-energy estimator.

Stores per-sample quantities (target potentials, log_det_J, sample indices,
CVs) during training/evaluation as compressed ``.npz`` archives:
``train/epoch-X.npz`` (arrays of length ``n_samples_per_epoch``, entry
``i`` = sample ``i % batch_size`` of batch ``i // batch_size``, with a
``__mask`` array marking written entries) and ``eval/step-X.npz``, plus a
``metadata.json`` holding batch/epoch sizes — the presence of which makes a
re-created logger resume from disk. This data is the input to
:func:`tfep_tpu.analysis.fep_estimator`. Reference behavior:
/root/reference/tfep/io/log.py:34-643.

Like the reference, a single logger instance is not multi-process safe; for
multi-host sharded training use one logger per host with the host's global
sample indices (the addressing scheme is position-independent).
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Dict, List, Optional

import numpy as np

__all__ = ['TFEPLogger']


def _to_numpy(value):
    return np.asarray(value)


class TFEPLogger:
    """Store and retrieve per-sample quantities by epoch, batch, or step."""

    VERSION = '0.1'
    METADATA_FILE_NAME = 'metadata.json'
    INDEX_NAMES = ['trajectory_sample_index', 'dataset_sample_index']
    MASK_NAME = '__mask'

    def __init__(self, save_dir_path='tfep_logs', batch_size: Optional[int] = None,
                 n_samples_per_epoch: Optional[int] = None,
                 data_loader=None,
                 train_subdir_name='train', eval_subdir_name='eval'):
        """Create or resume a logger.

        Either pass ``batch_size`` + ``n_samples_per_epoch`` directly, or a
        ``data_loader``-like object exposing ``batch_size``, ``drop_last`` and
        ``dataset`` (the reference's constructor path, log.py:590-605). When
        ``save_dir_path`` already holds a ``metadata.json`` these are ignored
        and the logger resumes from disk.
        """
        self._save_dir_path = os.path.realpath(save_dir_path)
        self._train_dir_path = os.path.join(save_dir_path, train_subdir_name)
        self._eval_dir_path = os.path.join(save_dir_path, eval_subdir_name)

        self._loaded_train_idx = None
        self._loaded_train_data: Optional[Dict[str, np.ndarray]] = None
        self._loaded_eval_idx = None
        self._loaded_eval_data: Optional[Dict[str, np.ndarray]] = None

        metadata_file_path = os.path.join(save_dir_path,
                                          self.METADATA_FILE_NAME)
        resume = os.path.isfile(metadata_file_path)

        if resume:
            with open(metadata_file_path) as f:
                metadata = json.load(f)
            self._batch_size = metadata['batch_size']
            self._n_samples_per_epoch = metadata['n_samples_per_epoch']
        elif data_loader is not None:
            self._batch_size = data_loader.batch_size
            n = len(data_loader.dataset)
            if getattr(data_loader, 'drop_last', False):
                n -= n % self._batch_size
            self._n_samples_per_epoch = n
        elif batch_size is not None and n_samples_per_epoch is not None:
            self._batch_size = int(batch_size)
            self._n_samples_per_epoch = int(n_samples_per_epoch)
        else:
            raise ValueError(
                'When creating a new logger, pass batch_size and '
                'n_samples_per_epoch (or a data_loader).')

        os.makedirs(save_dir_path, exist_ok=True)
        for dir_path in (self._train_dir_path, self._eval_dir_path):
            os.makedirs(dir_path, exist_ok=True)

        if not resume:
            with open(metadata_file_path, 'w') as f:
                json.dump({'batch_size': self._batch_size,
                           'n_samples_per_epoch': self._n_samples_per_epoch,
                           'version': self.VERSION}, f)

    # ------------------------------------------------------------------ #
    @property
    def batch_size(self) -> int:
        return self._batch_size

    @property
    def n_samples_per_epoch(self) -> int:
        return self._n_samples_per_epoch

    @property
    def n_batches_per_epoch(self) -> int:
        return int(np.ceil(self._n_samples_per_epoch / self._batch_size))

    @property
    def save_dir_path(self) -> str:
        return self._save_dir_path

    # ------------------------------------------------------------------ #
    def save_train_tensors(self, tensors: Dict, step_idx=None, epoch_idx=None,
                           batch_idx=None):
        """Save per-sample arrays for a training batch (or a whole epoch)."""
        self._warn_if_no_indices(tensors)
        _, epoch_idx, batch_idx = self._validate_indices(
            step_idx, epoch_idx, batch_idx, need_batch=False)
        self._load_data(epoch_idx, 'train')

        mask = self._loaded_train_data[self.MASK_NAME]
        for name, value in tensors.items():
            value = _to_numpy(value)
            if batch_idx is None:
                self._loaded_train_data[name] = value
                mask[:] = True
            else:
                if name not in self._loaded_train_data:
                    self._loaded_train_data[name] = np.empty(
                        self._n_samples_per_epoch, dtype=value.dtype)
                first = self._batch_size * batch_idx
                self._loaded_train_data[name][first:first + len(value)] = value
                mask[first:first + len(value)] = True

        self._dump_data('train')

    def read_train_tensors(self, names: Optional[List[str]] = None,
                           step_idx=None, epoch_idx=None, batch_idx=None,
                           remove_nans=False) -> Dict[str, np.ndarray]:
        """Read saved training arrays; only written (masked-in) entries."""
        _, epoch_idx, batch_idx = self._validate_indices(
            step_idx, epoch_idx, batch_idx, need_batch=False)
        self._load_data(epoch_idx, 'train')

        if names is None:
            names = [k for k in self._loaded_train_data
                     if k != self.MASK_NAME]
        mask = self._build_mask(remove_nans, 'train')

        tensors = {}
        for name in names:
            if batch_idx is None:
                tensors[name] = self._loaded_train_data[name][mask]
            else:
                first = self._batch_size * batch_idx
                last = first + self._batch_size
                tensors[name] = self._loaded_train_data[name][first:last][
                    mask[first:last]]
        return tensors

    def save_eval_tensors(self, tensors: Dict, step_idx=None, epoch_idx=None,
                          batch_idx=None, update=False):
        """Append (or update by sample index) per-sample evaluation arrays."""
        self._warn_if_no_indices(tensors)
        step_idx, _, _ = self._validate_indices(
            step_idx, epoch_idx, batch_idx, need_batch=True)
        self._load_data(step_idx, 'eval')

        if len(self._loaded_eval_data) == 0:
            names = list(tensors.keys())
        else:
            names = list(self._loaded_eval_data.keys())

        try:
            tensors = {n: _to_numpy(tensors[n]) for n in names}
        except KeyError:
            raise KeyError("'tensors' must include all the following arrays: "
                           + str(names))

        if update:
            for index_name in self.INDEX_NAMES:
                if index_name not in tensors:
                    continue
                _, tensor_indices, loaded_indices = np.intersect1d(
                    tensors[index_name], self._loaded_eval_data[index_name],
                    assume_unique=True, return_indices=True)
                if len(tensor_indices) == 0:
                    break
                for name in names:
                    self._loaded_eval_data[name][loaded_indices] = (
                        tensors[name][tensor_indices])
                    tensors[name] = np.delete(tensors[name], tensor_indices)
                break

        for name in names:
            value = tensors[name]
            if name in self._loaded_eval_data:
                self._loaded_eval_data[name] = np.concatenate(
                    (self._loaded_eval_data[name], value))
            else:
                self._loaded_eval_data[name] = value

        self._dump_data('eval')

    def read_eval_tensors(self, names: Optional[List[str]] = None,
                          step_idx=None, epoch_idx=None, batch_idx=None,
                          remove_nans=False,
                          sort_by: Optional[str] = None) -> Dict[str, np.ndarray]:
        """Read saved evaluation arrays for a given step."""
        step_idx, _, _ = self._validate_indices(
            step_idx, epoch_idx, batch_idx, need_batch=True)
        self._load_data(step_idx, 'eval')

        if sort_by is not None:
            order = np.argsort(self._loaded_eval_data[sort_by])
            self._loaded_eval_data = {
                k: v[order] for k, v in self._loaded_eval_data.items()}
            self._dump_data('eval')

        if names is None:
            data = dict(self._loaded_eval_data)
        else:
            data = {name: self._loaded_eval_data[name] for name in names}

        mask = self._build_mask(remove_nans, 'eval')
        if mask is not None:
            data = {k: v[mask] for k, v in data.items()}
        return data

    # ------------------------------------------------------------------ #
    @classmethod
    def _warn_if_no_indices(cls, tensors):
        for index_name in cls.INDEX_NAMES:
            if index_name in tensors:
                return
        warnings.warn(
            'tensors does not contain any sample indices among: '
            f'{cls.INDEX_NAMES}. Without it, matching configurations to their '
            'reference potential may be difficult.')

    def _build_mask(self, remove_nans, data_type):
        loaded = getattr(self, f'_loaded_{data_type}_data')
        is_eval = data_type == 'eval'
        if remove_nans is False:
            return None if is_eval else loaded[self.MASK_NAME]
        if remove_nans is True:
            mask = None
            for name, value in loaded.items():
                if name != self.MASK_NAME and np.issubdtype(
                        value.dtype, np.floating):
                    m = ~np.isnan(value)
                    mask = m if mask is None else (mask & m)
            if mask is None:
                mask = np.ones(len(next(iter(loaded.values()))), dtype=bool)
        else:
            mask = ~np.isnan(loaded[remove_nans])
        if not is_eval:
            mask = mask & loaded[self.MASK_NAME]
        return mask

    def _dump_data(self, data_type):
        np.savez_compressed(self._get_data_file_path(data_type),
                            **getattr(self, f'_loaded_{data_type}_data'))

    def _get_data_file_path(self, data_type):
        idx = getattr(self, f'_loaded_{data_type}_idx')
        if data_type == 'eval':
            return os.path.join(self._eval_dir_path, f'step-{idx}.npz')
        return os.path.join(self._train_dir_path, f'epoch-{idx}.npz')

    def _load_data(self, idx, data_type):
        idx_attr = f'_loaded_{data_type}_idx'
        if getattr(self, idx_attr) == idx:
            return
        setattr(self, idx_attr, idx)
        data_attr = f'_loaded_{data_type}_data'
        file_path = self._get_data_file_path(data_type)
        if os.path.isfile(file_path):
            with np.load(file_path) as npz:
                setattr(self, data_attr, {k: npz[k] for k in npz.files})
        elif data_type == 'eval':
            setattr(self, data_attr, {})
        else:
            setattr(self, data_attr, {
                self.MASK_NAME: np.zeros(self._n_samples_per_epoch,
                                         dtype=bool)})

    def _validate_indices(self, step_idx, epoch_idx, batch_idx, need_batch):
        n = self.n_batches_per_epoch
        if step_idx is not None:
            epoch_idx, batch_idx = divmod(step_idx, n)
        elif epoch_idx is None:
            raise ValueError('Either step_idx or epoch_idx must be passed.')
        elif batch_idx is None:
            if need_batch:
                raise ValueError(
                    "Either 'step_idx' or both 'epoch_idx' and 'batch_idx' "
                    'must be passed.')
        else:
            step_idx = epoch_idx * n + batch_idx
        return step_idx, epoch_idx, batch_idx
