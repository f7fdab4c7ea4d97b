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
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as error:
        # Only the double-initialization case is benign.
        if 'already initialized' not in str(error).lower():
            raise
    except ValueError:
        # Auto-detection outside a cluster environment: a single-host
        # no-op. With explicit arguments a ValueError means the launch is
        # misconfigured — swallowing it would silently run every host as
        # an independent single-process job.
        if explicit:
            raise


def is_distributed() -> bool:
    """Whether this run spans more than one jax process (host)."""
    import jax
    return jax.process_count() > 1


def process_index() -> int:
    """This host's process index (0 on single-process runs)."""
    import jax
    return jax.process_index()


def process_count() -> int:
    """Total number of jax processes (hosts) in the run."""
    import jax
    return jax.process_count()


def host_frame_indices(n_frames: int, process_id: Optional[int] = None,
                       n_processes: Optional[int] = None) -> np.ndarray:
    """This host's contiguous shard of trajectory-frame indices.

    Shards are exactly equal-sized: every host must run the same number
    of same-sized batches per epoch, or the hosts' collective steps
    desynchronize (one host enters a jitted step the others never join)
    and the global batch assembly
    (``jax.make_array_from_process_local_data``) infers inconsistent
    global shapes. The trailing ``n_frames % n_processes`` frames are
    therefore dropped, with a warning, rather than dealt unevenly.
    """
    if process_id is None:
        process_id = process_index()
    if n_processes is None:
        n_processes = process_count()
    per_host, remainder = divmod(n_frames, n_processes)
    if per_host == 0:
        raise ValueError(
            f'Cannot shard {n_frames} frames over {n_processes} hosts: '
            'every host needs at least one frame.')
    if remainder:
        import warnings
        warnings.warn(
            f'host_frame_indices: dropping the trailing {remainder} of '
            f'{n_frames} frames so all {n_processes} hosts hold equal '
            'shards (unequal shards desynchronize the hosts\' batch '
            'counts).', stacklevel=2)
    return np.arange(process_id * per_host, (process_id + 1) * per_host)


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
