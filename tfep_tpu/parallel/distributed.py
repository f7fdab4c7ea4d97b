"""Multi-host distributed training support.

The reference scaffolds but does not support data-parallel training (its
logger is single-process, SURVEY §2.5). Here multi-host runs are first
class: ``initialize()`` wires ``jax.distributed``, the global mesh spans all
hosts' devices over ICI/DCN, each host feeds its own shard of trajectory
frames (``host_frame_indices``), and per-sample TFEP logging goes to a
per-host logger directory keyed by process index — the npz addressing
scheme is position-independent, so analysis concatenates the hosts' rows.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

__all__ = ['initialize', 'is_distributed', 'process_index', 'process_count',
           'host_frame_indices', 'host_logger_dir', 'all_hosts_work_values',
           'global_rows_from_local', 'make_global_batch']


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize jax.distributed (no-op when single-process).

    With no arguments, relies on the cluster environment (TPU pod slices
    auto-discover); explicit arguments support manual bring-up.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        # Already initialized, or single-host environment.
        pass


def is_distributed() -> bool:
    import jax
    return jax.process_count() > 1


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def host_frame_indices(n_frames: int, process_id: Optional[int] = None,
                       n_processes: Optional[int] = None) -> np.ndarray:
    """This host's contiguous shard of trajectory-frame indices.

    Frames split as evenly as possible; earlier hosts take the remainder.
    Used to build a per-host ``Subset`` of the dataset so each host's
    dataloader + engine pool works on disjoint frames.
    """
    if process_id is None:
        process_id = process_index()
    if n_processes is None:
        n_processes = process_count()
    counts = np.full(n_processes, n_frames // n_processes)
    counts[:n_frames % n_processes] += 1
    starts = np.concatenate([[0], np.cumsum(counts)])
    return np.arange(starts[process_id], starts[process_id + 1])


def global_rows_from_local(local_rows, sharding):
    """This host's rows -> a device array with the given (frames-axis)
    sharding; global assembly across processes under multi-host.

    The single place encoding the 'make_array_from_process_local_data when
    multi-process, device_put otherwise' rule — the trainer's batch feed
    and engine-result reassembly both route through it.
    """
    import jax

    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(local_rows))
    return jax.device_put(local_rows, sharding)


def make_global_batch(batch: dict, mesh, axis_name: str = 'dp') -> dict:
    """Assemble each host's local batch shard into global sharded arrays.

    Every process passes its own rows; the returned arrays are global
    (leading axis = sum of the hosts' rows) with the frame axis sharded
    over the mesh. Single-process meshes fall back to a plain
    ``device_put``.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return {name: global_rows_from_local(value, sharding)
            for name, value in batch.items()}


def host_logger_dir(base_dir: str, process_id: Optional[int] = None) -> str:
    """Per-host TFEP logger directory (the logger is single-process)."""
    if process_id is None:
        process_id = process_index()
    return os.path.join(base_dir, f'host-{process_id}')


def all_hosts_work_values(base_dir: str, epoch_idx: int,
                          n_hosts: Optional[int] = None,
                          names: Sequence[str] = ('potential', 'log_det_J',
                                                  'dataset_sample_index')):
    """Concatenate per-host train tensors for an epoch (host-side analysis).

    Returns a dict of concatenated arrays across ``host-*/train`` logs.
    """
    from tfep_tpu.io.log import TFEPLogger

    if n_hosts is None:
        n_hosts = len([d for d in os.listdir(base_dir)
                       if d.startswith('host-')])
    collected = {name: [] for name in names}
    for host in range(n_hosts):
        logger = TFEPLogger(save_dir_path=host_logger_dir(base_dir, host))
        data = logger.read_train_tensors(names=list(names),
                                         epoch_idx=epoch_idx)
        for name in names:
            collected[name].append(data[name])
    return {name: np.concatenate(values)
            for name, values in collected.items()}
