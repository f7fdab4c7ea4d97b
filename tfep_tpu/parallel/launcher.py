"""Subprocess launchers: concurrent local execution and SLURM ``srun``.

``Launcher.run`` starts N commands concurrently via ``subprocess.Popen``
with per-command stdin/stdout/stderr/cwd and ``subprocess.run``-style
timeout/check semantics — the mechanism behind file-based engines (GROMACS)
and the coupled CPMD+GROMACS MPMD pair (MiMiC). ``SRunLauncher`` prepends
SLURM ``srun``, including the ``--multi-prog`` mode that runs several
programs under one srun with contiguous task-rank ranges. Reference
behavior: /root/reference/tfep/utils/cli/launcher.py:35-492.

Example
-------
>>> launcher = Launcher()
>>> result = launcher.run(['echo', 'print this'], capture_output=True,
...                       text=True)
>>> print(result.stdout.strip())
print this
"""

from __future__ import annotations

import contextlib
import subprocess
from typing import List, Optional, Union

from tfep_tpu.parallel.cli import CLITool, KeyValueOption
from tfep_tpu.utils.misc import temporary_cd

__all__ = ['Launcher', 'SRunTool', 'SRunLauncher']


def _ensure_lists(n: int, values: list) -> list:
    """Broadcast per-command options to lists of length n."""
    out = []
    for value in values:
        if isinstance(value, list):
            if len(value) != n:
                raise ValueError(
                    f'Expected {n} values, got {len(value)}: {value}')
            out.append(list(value))
        else:
            out.append([value] * n)
    return out


class Launcher:
    """Run one or more commands as concurrent subprocesses."""

    def run(self, *commands, capture_output: bool = False,
            timeout: Optional[float] = None, check: bool = False,
            stdin=None, stdout=None, stderr=None, cwd=None, **kwargs):
        """Start all commands, wait for completion, collect results.

        ``stdin``/``stdout``/``stderr``/``cwd`` accept either a single value
        or one value per command. Returns a ``subprocess.CompletedProcess``
        (or a list of them for multiple commands); raises
        ``CalledProcessError`` with ``check`` and ``TimeoutExpired`` with
        ``timeout``, mirroring ``subprocess.run``.
        """
        stdin, stdout, stderr, cwd = _ensure_lists(
            len(commands), [stdin, stdout, stderr, cwd])

        if capture_output:
            stdout = [subprocess.PIPE] * len(commands)
            stderr = [subprocess.PIPE] * len(commands)

        with contextlib.ExitStack() as stack:
            processes = []
            for idx, cmd in enumerate(commands):
                if isinstance(cmd, CLITool):
                    cmd = cmd.to_subprocess()
                processes.append(stack.enter_context(subprocess.Popen(
                    cmd, stdin=stdin[idx], stdout=stdout[idx],
                    stderr=stderr[idx], cwd=cwd[idx], **kwargs)))

            results = []
            for process in processes:
                out, err, retcode = self._handle_process(process, timeout)
                if check and retcode:
                    raise subprocess.CalledProcessError(
                        retcode, process.args, output=out, stderr=err)
                results.append(subprocess.CompletedProcess(
                    process.args, retcode, out, err))

        if len(commands) == 1:
            return results[0]
        return results

    def _handle_process(self, process, timeout):
        try:
            out, err = process.communicate(timeout=timeout)
        except subprocess.TimeoutExpired as exception:
            process.kill()
            exception.stdout, exception.stderr = process.communicate()
            raise exception
        except BaseException:
            process.kill()
            process.wait()
            raise
        return out, err, process.poll()


class SRunTool(CLITool):
    """SLURM ``srun`` wrapper."""

    EXECUTABLE_PATH = 'srun'
    time = KeyValueOption('--time')
    n_nodes = KeyValueOption('--nodes')
    n_tasks = KeyValueOption('--ntasks')
    n_tasks_per_node = KeyValueOption('--ntasks-per-node')
    n_cpus_per_task = KeyValueOption('--cpus-per-task')
    relative_node_idx = KeyValueOption('--relative')
    cpu_bind = KeyValueOption('--cpu-bind')
    distribution = KeyValueOption('--distribution')
    multiprog_config_file_path = KeyValueOption('--multi-prog')

    def to_subprocess(self):
        # srun requires --multi-prog to be the last option.
        cmd = super().to_subprocess()
        if self.multiprog_config_file_path is not None:
            idx = cmd.index('--multi-prog')
            if idx != len(cmd) - 2:
                cmd = cmd[:idx] + cmd[idx + 2:] + cmd[idx:idx + 2]
        return cmd


class SRunLauncher(Launcher):
    """Launch commands through SLURM ``srun``, optionally MPMD (--multi-prog).

    Without ``multiprog``, each command gets its own srun (options may be
    per-command lists). With ``multiprog=True``, one srun runs all commands
    with ``n_tasks`` (a list) defining each command's contiguous task-rank
    range, written to a generated config file — this is how MiMiC's
    CPMD+GROMACS pair runs on a cluster.
    """

    GLOBAL_SRUN_OPTIONS: dict = {}

    def __init__(self, n_tasks: Optional[Union[int, List[int]]] = None,
                 multiprog: bool = False,
                 multiprog_config_file_path: str = 'srun-job.conf',
                 **kwargs):
        super().__init__()
        self.n_tasks = n_tasks
        self.multiprog = multiprog
        self.multiprog_config_file_path = multiprog_config_file_path
        self.srun_kwargs = kwargs

    def run(self, *commands, **kwargs):
        n_commands = len(commands)

        run_with_multiprog = n_commands > 1 and self.multiprog
        if run_with_multiprog:
            if not isinstance(self.n_tasks, list):
                raise ValueError(
                    'With multiprog execution, "n_tasks" must be a list.')
            for name, value in self.srun_kwargs.items():
                if isinstance(value, list):
                    raise ValueError(
                        f'With multiprog execution, "{name}" cannot be a '
                        'list.')

        if isinstance(self.n_tasks, list) and \
                len(self.n_tasks) != n_commands:
            raise ValueError(
                f'Passed {n_commands} commands but {len(self.n_tasks)} '
                f'n_tasks: {self.n_tasks}')
        for name, value in self.srun_kwargs.items():
            if isinstance(value, list) and len(value) != n_commands:
                raise ValueError(
                    f'Passed {n_commands} commands but {len(value)} '
                    f'{name}: {value}')

        srun_commands = self._create_srun_commands(commands)

        if run_with_multiprog:
            # Config file path is relative to the working directory.
            with temporary_cd(kwargs.get('cwd', None)):
                self._create_multiprog_config_file(commands)

        return super().run(*srun_commands, **kwargs)

    # ------------------------------------------------------------------ #
    def _create_srun_commands(self, commands):
        commands = [cmd.to_subprocess() if isinstance(cmd, CLITool) else cmd
                    for cmd in commands]
        if len(commands) > 1 and self.multiprog:
            return self._create_srun_multiprog_command(commands)
        return self._create_srun_standard_commands(commands)

    def _create_srun_standard_commands(self, commands):
        n = len(commands)
        kwargs_lists = {name: _ensure_lists(n, [val])[0]
                        for name, val in self.srun_kwargs.items()}
        kwargs_lists['n_tasks'] = _ensure_lists(n, [self.n_tasks])[0]

        srun_commands = []
        for idx, cmd in enumerate(commands):
            kw = {name: vals[idx] for name, vals in kwargs_lists.items()}
            for k, v in self.GLOBAL_SRUN_OPTIONS.items():
                if kw.get(k) is None:
                    kw[k] = v
            srun_commands.append(SRunTool(**kw).to_subprocess() + cmd)
        return srun_commands

    def _create_srun_multiprog_command(self, commands):
        kw = {name: val for name, val in self.srun_kwargs.items()
              if name != 'n_tasks_per_node'}
        for k, v in self.GLOBAL_SRUN_OPTIONS.items():
            if kw.get(k) is None:
                kw[k] = v
        srun = SRunTool(
            n_tasks=sum(self.n_tasks),
            multiprog_config_file_path=self.multiprog_config_file_path,
            **kw)
        return [srun.to_subprocess()]

    def _create_multiprog_config_file(self, commands):
        commands = [cmd.to_subprocess() if isinstance(cmd, CLITool) else cmd
                    for cmd in commands]
        task_ranks = []
        current = 0
        for n_tasks in self.n_tasks:
            ranks = str(current)
            if n_tasks > 1:
                ranks += '-' + str(current + n_tasks - 1)
            task_ranks.append(ranks)
            current += n_tasks

        with open(self.multiprog_config_file_path, 'w') as f:
            for idx, cmd in enumerate(commands):
                f.write(' '.join([task_ranks[idx], *cmd]) + '\n')
