"""DCD reader tests: write the binary format in-test, read it back with both
the native (C++) and the pure-Python decoder."""

import struct

import numpy as np
import pytest

from tfep_tpu.io import dcd


def write_dcd(path, positions, cells=None):
    """Minimal CHARMM-style DCD writer for tests.

    ``positions``: (n_frames, n_atoms, 3) float32;
    ``cells``: (n_frames, 6) [lx, ly, lz, alpha, beta, gamma] or None.
    """
    n_frames, n_atoms, _ = positions.shape
    with open(path, 'wb') as f:
        icntrl = [0] * 20
        icntrl[0] = n_frames
        icntrl[10] = 1 if cells is not None else 0
        f.write(struct.pack('<i', 84))
        f.write(b'CORD')
        f.write(struct.pack('<20i', *icntrl))
        f.write(struct.pack('<i', 84))

        title = b'Created by tfep_tpu tests'.ljust(80)
        f.write(struct.pack('<i', 4 + 80))
        f.write(struct.pack('<i', 1))
        f.write(title)
        f.write(struct.pack('<i', 4 + 80))

        f.write(struct.pack('<i', 4))
        f.write(struct.pack('<i', n_atoms))
        f.write(struct.pack('<i', 4))

        for frame_idx in range(n_frames):
            if cells is not None:
                lx, ly, lz, alpha, beta, gamma = cells[frame_idx]
                # DCD order: A, gamma, B, beta, alpha, C.
                f.write(struct.pack('<i', 48))
                f.write(struct.pack('<6d', lx, gamma, ly, beta, alpha, lz))
                f.write(struct.pack('<i', 48))
            for dim in range(3):
                data = positions[frame_idx, :, dim].astype('<f4').tobytes()
                f.write(struct.pack('<i', 4 * n_atoms))
                f.write(data)
                f.write(struct.pack('<i', 4 * n_atoms))


@pytest.fixture
def dcd_data(tmp_path):
    rng = np.random.default_rng(0)
    positions = rng.normal(size=(5, 7, 3)).astype(np.float32)
    cells = np.tile([20.0, 21.0, 22.0, 90.0, 90.0, 90.0], (5, 1))
    path = str(tmp_path / 'traj.dcd')
    write_dcd(path, positions, cells)
    return path, positions, cells


def test_header(dcd_data):
    path, positions, cells = dcd_data
    n_frames, n_atoms, has_cell = dcd.read_dcd_header(path)
    assert (n_frames, n_atoms, has_cell) == (5, 7, True)


def test_read_all_frames(dcd_data):
    path, positions, cells = dcd_data
    out_pos, out_cells = dcd.read_dcd(path)
    np.testing.assert_allclose(out_pos, positions, rtol=1e-6)
    np.testing.assert_allclose(out_cells, cells)


def test_read_subset(dcd_data):
    path, positions, _ = dcd_data
    out_pos, _ = dcd.read_dcd(path, frame_indices=[4, 0, 2])
    np.testing.assert_allclose(out_pos, positions[[4, 0, 2]], rtol=1e-6)


def test_no_cell(tmp_path):
    rng = np.random.default_rng(1)
    positions = rng.normal(size=(3, 4, 3)).astype(np.float32)
    path = str(tmp_path / 'nocell.dcd')
    write_dcd(path, positions)
    out_pos, out_cells = dcd.read_dcd(path)
    assert out_cells is None
    np.testing.assert_allclose(out_pos, positions, rtol=1e-6)


def test_python_fallback_matches(dcd_data, monkeypatch):
    path, positions, cells = dcd_data
    native_pos, native_cells = dcd.read_dcd(path)
    py_pos, py_cells = dcd._py_read_frames(path, np.arange(5))
    np.testing.assert_allclose(py_pos, native_pos)
    np.testing.assert_allclose(py_cells, native_cells)


def test_native_compiles():
    """The C++ fast path must be available in this environment."""
    assert dcd.native_available()
