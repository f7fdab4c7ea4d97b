"""PLUMED table I/O and dataset-aux tests (no plumed executable needed)."""

import numpy as np
import pytest

from tfep_tpu.utils.plumed import (
    PlumedSumHills, add_plumed_aux_to_dataset, read_table,
    read_table_field_names, read_table_n_rows, write_table,
)

COLVAR = """\
#! FIELDS time cv1 bias
 0.0 1.10 0.5
 1.0 1.20 0.7
 1.0 1.20 0.7
 2.0 1.15 0.9
"""


@pytest.fixture
def colvar_file(tmp_path):
    path = tmp_path / 'COLVAR'
    path.write_text(COLVAR)
    return str(path)


def test_read_field_names(colvar_file):
    assert read_table_field_names(colvar_file) == ['time', 'cv1', 'bias']


def test_read_n_rows(colvar_file):
    assert read_table_n_rows(colvar_file) == 4


def test_read_table_removes_duplicates(colvar_file):
    data = read_table(colvar_file)
    np.testing.assert_allclose(data['time'], [0.0, 1.0, 2.0])
    np.testing.assert_allclose(data['bias'], [0.5, 0.7, 0.9])


def test_read_table_columns_and_array(colvar_file):
    arr = read_table(colvar_file, col_names=['bias'], as_array=True)
    np.testing.assert_allclose(arr[:, 0], [0.5, 0.7, 0.9])


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / 'out.dat')
    data = {'time': np.arange(3.0), 'x': np.asarray([0.1, 0.2, 0.3])}
    write_table(data, path)
    back = read_table(path)
    np.testing.assert_allclose(back['x'], data['x'])
    assert read_table_field_names(path) == ['time', 'x']


def test_add_aux_to_dataset(tmp_path, colvar_file):
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System, TrajectoryDataset

    system = System(Topology(names=['C']),
                    np.zeros((3, 1, 3)))
    dataset = TrajectoryDataset(system)
    add_plumed_aux_to_dataset(dataset, colvar_file, col_names=['time',
                                                               'bias'])
    sample = dataset[1]
    assert sample['bias'] == 0.7
    batch = dataset.get_batch([0, 2])
    np.testing.assert_allclose(batch['bias'], [0.5, 0.9])


def test_sum_hills_command():
    cmd = PlumedSumHills(hills_file_path='HILLS', out_file_path='fes.dat')
    out = cmd.to_subprocess()
    assert out[:2] == ['plumed', 'sum_hills']
    assert '--hills' in out and '--outfile' in out
