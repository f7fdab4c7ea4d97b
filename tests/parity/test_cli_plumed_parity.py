"""CLI-tool and PLUMED table I/O parity against the PyTorch reference.

The CLI descriptors render the exact argv lists fed to external engines
(gmx/cpmd/srun); the PLUMED table I/O is the bias-potential ingestion path
for biased-simulation reweighting.  Reference:
``/root/reference/tfep/utils/cli/{tool,launcher}.py`` and
``/root/reference/tfep/utils/plumed/io.py``.
"""

import numpy as np
import pytest

from refbridge import to_numpy

from tfep_tpu.parallel.cli import (
    AbsolutePathOption, CLITool, FlagOption, KeyValueOption)
from tfep_tpu.utils import plumed as our_plumed


def _tool_pair(ref):
    refcli = ref.utils.cli.tool

    class RefGrep(refcli.CLITool):
        EXECUTABLE_PATH = 'grep'
        patterns_file_path = refcli.KeyValueOption('-f')
        max_count = refcli.KeyValueOption('-m')
        data_path = refcli.AbsolutePathOption('-d')
        quiet = refcli.FlagOption('-q')
        colorize = refcli.FlagOption('--color', prepend_to_false='no')

    class OurGrep(CLITool):
        EXECUTABLE_PATH = 'grep'
        patterns_file_path = KeyValueOption('-f')
        max_count = KeyValueOption('-m')
        data_path = AbsolutePathOption('-d')
        quiet = FlagOption('-q')
        colorize = FlagOption('--color', prepend_to_false='no')

    return RefGrep, OurGrep


CLI_CASES = [
    dict(kwargs=dict(quiet=True)),
    dict(args=('input.txt',),
         kwargs=dict(patterns_file_path='my_patterns.txt', max_count=3)),
    dict(args=('a.txt', 'b.txt'), kwargs=dict(quiet=False)),
    dict(kwargs=dict(colorize=False)),
    dict(kwargs=dict(colorize=True, max_count=7)),
    dict(kwargs=dict(data_path='rel/path.dat')),
]


@pytest.mark.parametrize('case', CLI_CASES)
def test_clitool_to_subprocess_parity(ref, case):
    """Same declarative tool -> identical argv (order included)."""
    RefGrep, OurGrep = _tool_pair(ref)
    args = case.get('args', ())
    kwargs = case.get('kwargs', {})
    ref_argv = RefGrep(*args, **kwargs).to_subprocess()
    our_argv = OurGrep(*args, **kwargs).to_subprocess()
    assert our_argv == list(map(str, ref_argv))


def test_clitool_subprogram_parity(ref):
    refcli = ref.utils.cli.tool

    class RefGmxMdrun(refcli.CLITool):
        EXECUTABLE_PATH = 'gmx'
        SUBPROGRAM = 'mdrun'
        tpr_input_file_path = refcli.KeyValueOption('-s')

    class OurGmxMdrun(CLITool):
        EXECUTABLE_PATH = 'gmx'
        SUBPROGRAM = 'mdrun'
        tpr_input_file_path = KeyValueOption('-s')

    ref_argv = RefGmxMdrun(tpr_input_file_path='topol.tpr').to_subprocess()
    our_argv = OurGmxMdrun(tpr_input_file_path='topol.tpr').to_subprocess()
    assert our_argv == list(map(str, ref_argv))


def test_clitool_rejects_unknown_option_parity(ref):
    RefGrep, OurGrep = _tool_pair(ref)
    with pytest.raises(AttributeError):
        RefGrep(bogus=1)
    with pytest.raises(AttributeError):
        OurGrep(bogus=1)


# A realistic PLUMED COLVAR file (metadynamics on two CVs + bias), as
# `plumed driver`/PRINT emit it: `#! FIELDS ...` header then rows.
COLVAR_TEXT = """\
#! FIELDS time d1 phi metad.bias
 0.000000 0.298572 -1.042317 0.000000
 1.000000 0.301234 -0.998211 0.120943
 2.000000 0.287654 -1.150932 0.284712
 3.000000 0.310987 -0.912345 0.401122
"""


def test_plumed_read_table_field_names_parity(ref, tmp_path):
    path = tmp_path / 'COLVAR'
    path.write_text(COLVAR_TEXT)
    ref_names = ref.utils.plumed.io.read_table_field_names(str(path))
    our_names = our_plumed.read_table_field_names(str(path))
    assert list(our_names) == list(ref_names)
    assert ref.utils.plumed.io.read_table_n_rows(str(path)) == \
        our_plumed.read_table_n_rows(str(path)) == 4


def test_plumed_read_table_parity(ref, tmp_path):
    path = tmp_path / 'COLVAR'
    path.write_text(COLVAR_TEXT)
    ref_data = ref.utils.plumed.io.read_table(str(path))
    our_data = our_plumed.read_table(str(path))
    assert set(our_data.keys()) == set(ref_data.keys())
    for name in ref_data:
        np.testing.assert_allclose(np.asarray(our_data[name]),
                                   to_numpy(ref_data[name]), atol=0)


def test_plumed_read_table_col_subset_parity(ref, tmp_path):
    path = tmp_path / 'COLVAR'
    path.write_text(COLVAR_TEXT)
    cols = ['time', 'metad.bias']
    ref_data = ref.utils.plumed.io.read_table(str(path), col_names=cols)
    our_data = our_plumed.read_table(str(path), col_names=cols)
    for name in cols:
        np.testing.assert_allclose(np.asarray(our_data[name]),
                                   to_numpy(ref_data[name]), atol=0)


def test_plumed_write_table_cross_read(ref, tmp_path):
    """Our writer's output parses identically under the reference reader
    and vice versa."""
    data = {
        'time': np.array([0.0, 1.0, 2.0]),
        'cv1': np.array([0.25, -0.75, 1.5]),
        'bias': np.array([0.0, 0.3, 0.9]),
    }
    ours_path = tmp_path / 'OURS'
    our_plumed.write_table(data, str(ours_path))
    ref_back = ref.utils.plumed.io.read_table(str(ours_path))
    for name in data:
        np.testing.assert_allclose(to_numpy(ref_back[name]), data[name],
                                   rtol=1e-12)

    theirs_path = tmp_path / 'THEIRS'
    ref.utils.plumed.io.write_table(data, str(theirs_path))
    our_back = our_plumed.read_table(str(theirs_path))
    for name in data:
        np.testing.assert_allclose(np.asarray(our_back[name]), data[name],
                                   rtol=1e-12)
