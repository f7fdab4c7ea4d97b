"""Real 2-process distributed training (jax.distributed over CPU+Gloo).

Unlike the virtual-mesh tests, this launches two OS processes that
initialize a jax.distributed cluster (one CPU device each), train the same
map over the *global* mesh with per-host frame shards, and log to per-host
TFEP loggers — the full multi-host story the reference scaffolds but does
not support (its logger is documented multi-process unsafe).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_distributed_training(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    worker = os.path.join(repo_root, 'tests', 'parallel',
                          'multihost_worker.py')
    coordinator = f'127.0.0.1:{_free_port()}'

    env = dict(os.environ, PYTHONPATH=repo_root, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)  # one CPU device per process

    workers = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid), '2',
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outputs = []
    try:
        for proc in workers:
            out, _ = proc.communicate(timeout=240)
            outputs.append(out)
    finally:
        for proc in workers:
            if proc.poll() is None:
                proc.kill()
    for proc, out in zip(workers, outputs):
        assert proc.returncode == 0, out[-3000:]

    results = {}
    for pid in range(2):
        with open(tmp_path / f'result-{pid}.json') as f:
            results[pid] = json.load(f)

    # Both hosts ran the same number of (global) steps with identical,
    # finite losses — the GSPMD computation is the same on every process.
    assert results[0]['global_step'] == results[1]['global_step'] == 4
    assert results[0]['loss_history'] == results[1]['loss_history']
    assert all(v == v for v in results[0]['loss_history'])  # no NaNs

    # The hosts fed disjoint shards covering all frames.
    frames = results[0]['host_frames'] + results[1]['host_frames']
    assert sorted(frames) == list(range(16))

    # Host 0 merged every host's logged work values for the epoch.
    assert results[0]['merged_trajectory_indices'] == list(range(16))
    assert results[0]['merged_finite'] is True
