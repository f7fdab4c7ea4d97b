"""Tests for strategies, CLI tools, and launchers (echo-substitution style).

The reference tests CLI correctness by substituting ``echo`` for the real
executable (tests/utils/cli/test_launcher.py:42-58); same approach here.
"""

import multiprocessing
import os
import subprocess

import pytest

from tfep_tpu.parallel import (
    AbsolutePathOption, CLITool, FlagOption, KeyValueOption, Launcher,
    ProcessPoolStrategy, SerialStrategy, SRunLauncher, SRunTool,
    ThreadPoolStrategy,
)


def _square(x):
    return x * x


def _add(x, y):
    return x + y


class TestStrategies:
    args = [(1, 2), (3, 4), (5, 6)]

    def test_serial(self):
        assert SerialStrategy().run(_add, self.args) == [3, 7, 11]

    def test_thread_pool(self):
        s = ThreadPoolStrategy(max_workers=2)
        assert s.run(_add, self.args) == [3, 7, 11]
        s.shutdown()

    def test_process_pool(self):
        with multiprocessing.Pool(2) as pool:
            s = ProcessPoolStrategy(pool)
            assert s.run(_add, self.args) == [3, 7, 11]


class MyGrep(CLITool):
    EXECUTABLE_PATH = 'grep'
    patterns_file_path = KeyValueOption('-f')
    max_count = KeyValueOption('-m')
    print_version = FlagOption('-v')
    absolute = AbsolutePathOption('-p')
    toggled = FlagOption('-t', prepend_to_false='no')


class TestCLITool:
    def test_flag(self):
        assert MyGrep(print_version=True).to_subprocess() == ['grep', '-v']
        assert MyGrep(print_version=False).to_subprocess() == ['grep']
        assert MyGrep().to_subprocess() == ['grep']

    def test_key_value_and_args(self):
        cmd = MyGrep('input.txt', patterns_file_path='pat.txt', max_count=3)
        out = cmd.to_subprocess()
        assert out[0] == 'grep'
        assert out[-1] == 'input.txt'
        assert ('-m' in out) and ('3' in out) and ('-f' in out)

    def test_absolute_path(self):
        cmd = MyGrep(absolute='rel/path.txt')
        out = cmd.to_subprocess()
        assert os.path.isabs(out[out.index('-p') + 1])

    def test_no_prefix_flag(self):
        assert MyGrep(toggled=False).to_subprocess() == ['grep', '-not']
        assert MyGrep(toggled=True).to_subprocess() == ['grep', '-t']

    def test_undefined_option(self):
        with pytest.raises(AttributeError, match='Undefined'):
            MyGrep(bogus=2)

    def test_executable_path_override(self):
        cmd = MyGrep(executable_path='/usr/bin/grep')
        assert cmd.to_subprocess()[0] == '/usr/bin/grep'

    def test_subprogram(self):
        class Sub(CLITool):
            EXECUTABLE_PATH = 'tool'
            SUBPROGRAM = 'sub'
        assert Sub('x').to_subprocess() == ['tool', 'sub', 'x']


class Echo(CLITool):
    EXECUTABLE_PATH = 'echo'


class TestLauncher:
    def test_single_command(self):
        result = Launcher().run(['echo', 'hello'], capture_output=True,
                                text=True)
        assert result.stdout.strip() == 'hello'
        assert result.returncode == 0

    def test_clitool_command(self):
        result = Launcher().run(Echo('print this'), capture_output=True,
                                text=True)
        assert result.stdout.strip() == 'print this'

    def test_parallel_commands(self):
        results = Launcher().run(Echo('a'), Echo('b'), capture_output=True,
                                 text=True)
        assert [r.stdout.strip() for r in results] == ['a', 'b']

    def test_check_raises(self):
        with pytest.raises(subprocess.CalledProcessError):
            Launcher().run(['false'], check=True)

    def test_per_command_cwd(self, tmp_path):
        d1 = tmp_path / 'a'
        d2 = tmp_path / 'b'
        d1.mkdir()
        d2.mkdir()
        results = Launcher().run(['pwd'], ['pwd'], capture_output=True,
                                 text=True, cwd=[str(d1), str(d2)])
        assert results[0].stdout.strip().endswith('/a')
        assert results[1].stdout.strip().endswith('/b')

    def test_timeout(self):
        with pytest.raises(subprocess.TimeoutExpired):
            Launcher().run(['sleep', '5'], timeout=0.2)


class TestSRunLauncher:
    def test_standard_commands(self):
        launcher = SRunLauncher(n_tasks=4, n_nodes=2)
        cmds = launcher._plan_srun_argvs([['prog', 'arg']])
        assert cmds == [['srun', '--nodes', '2', '--ntasks', '4', 'prog',
                         'arg']]

    def test_per_command_options(self):
        launcher = SRunLauncher(n_tasks=[2, 3], n_nodes=[1, 4])
        cmds = launcher._plan_srun_argvs([['a'], ['b']])
        assert cmds[0] == ['srun', '--nodes', '1', '--ntasks', '2', 'a']
        assert cmds[1] == ['srun', '--nodes', '4', '--ntasks', '3', 'b']

    def test_multiprog_command_and_config(self, tmp_path):
        config = tmp_path / 'job.conf'
        launcher = SRunLauncher(n_tasks=[2, 3, 2], multiprog=True,
                                multiprog_config_file_path=str(config),
                                n_nodes=4)
        cmds = launcher._plan_srun_argvs([['a'], ['b', 'x'], ['c']])
        # One srun for all commands; --multi-prog last.
        assert len(cmds) == 1
        assert cmds[0][-2:] == ['--multi-prog', str(config)]
        assert '--ntasks' in cmds[0]
        assert cmds[0][cmds[0].index('--ntasks') + 1] == '7'

        launcher._write_multiprog_plan([['a'], ['b', 'x'], ['c']])
        lines = config.read_text().splitlines()
        assert lines == ['0-1 a', '2-4 b x', '5-6 c']

    def test_multiprog_requires_list(self):
        launcher = SRunLauncher(n_tasks=3, multiprog=True)
        with pytest.raises(ValueError, match='must be a list'):
            launcher.run(['a'], ['b'])
