"""Parallelization strategies for per-sample engine fan-out (host side).

Each batch of mapped coordinates reaching an external-engine potential is
split into per-frame single-point calculations; a strategy decides how they
are distributed: in-process (serial), over a process pool, or over a
thread pool (right for engines that release the GIL or subprocess-based
engines, and composes with the TPU async dispatch without pickling).
Reference behavior: /root/reference/tfep/utils/parallel.py:37-132.
"""

from __future__ import annotations

import abc
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, List

__all__ = ['ParallelizationStrategy', 'SerialStrategy',
           'ProcessPoolStrategy', 'ThreadPoolStrategy']


class ParallelizationStrategy(abc.ABC):
    """Contract: ``run(func, args) -> [func(*args[i]) for i]``."""

    @abc.abstractmethod
    def run(self, func: Callable, args: Iterable) -> List:
        """Distribute ``func`` over the argument tuples and collect results."""


class SerialStrategy(ParallelizationStrategy):
    """In-process loop (the default everywhere)."""

    def run(self, func, args):
        return [func(*arg) for arg in args]


class ProcessPoolStrategy(ParallelizationStrategy):
    """Fan out over a ``multiprocessing.Pool`` via ``starmap``.

    The pool is owned by the caller (engines like psi4 need custom pool
    initializers because their handles are not picklable, cf.
    /root/reference/tfep/potentials/psi4.py:369-375).
    """

    def __init__(self, pool):
        self.pool = pool

    def run(self, func, args):
        return self.pool.starmap(func, args)


class ThreadPoolStrategy(ParallelizationStrategy):
    """Fan out over threads.

    Appropriate for subprocess-launching engines (GROMACS, CPMD) and
    GIL-releasing bindings: no pickling, shares engine caches, and overlaps
    naturally with the device stream while the host waits on I/O.
    """

    def __init__(self, max_workers: int = None):
        self._executor = ThreadPoolExecutor(max_workers=max_workers)

    def run(self, func, args):
        futures = [self._executor.submit(func, *arg) for arg in args]
        return [f.result() for f in futures]

    def shutdown(self):
        self._executor.shutdown()
