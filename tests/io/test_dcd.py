"""DCD reader tests: write the binary format in-test, read it back with both
the native (C++) and the pure-Python decoder."""

import struct

import numpy as np
import pytest

from tfep_tpu.io import dcd


def write_dcd(path, positions, cells=None, namnf=0):
    """Minimal CHARMM-style DCD writer for tests.

    ``positions``: (n_frames, n_atoms, 3) float32;
    ``cells``: (n_frames, 6) [lx, ly, lz, alpha, beta, gamma] or None.
    """
    n_frames, n_atoms, _ = positions.shape
    with open(path, 'wb') as f:
        icntrl = [0] * 20
        icntrl[0] = n_frames
        icntrl[8] = namnf
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


def test_strided_frame_indices(dcd_data):
    """A non-contiguous index view must not hand the native decoder its
    base buffer (which would silently read the wrong frames)."""
    path, positions, _ = dcd_data
    strided = np.arange(5)[::2]          # stride-2 view: frames 0, 2, 4
    out_pos, _ = dcd.read_dcd(path, frame_indices=strided)
    np.testing.assert_allclose(out_pos, positions[[0, 2, 4]], rtol=1e-6)


def test_charmm_cosine_angles(tmp_path):
    """CHARMM (c22+) stores cos(angle) in the cell record; the reader must
    convert to degrees (X-PLOR-style degree cells stay unchanged)."""
    rng = np.random.default_rng(2)
    positions = rng.normal(size=(2, 3, 3)).astype(np.float32)
    cos60 = 0.5
    cells = np.tile([20.0, 21.0, 22.0, 0.0, 0.0, cos60], (2, 1))
    path = str(tmp_path / 'charmm.dcd')
    write_dcd(path, positions, cells)
    _, out_cells = dcd.read_dcd(path)
    np.testing.assert_allclose(
        out_cells, np.tile([20.0, 21.0, 22.0, 90.0, 90.0, 60.0], (2, 1)))

    from tfep_tpu.io.frames import DcdFrameStore
    store = DcdFrameStore(path)
    np.testing.assert_allclose(
        store.dimensions, np.tile([20.0, 21.0, 22.0, 90.0, 90.0, 60.0],
                                  (2, 1)))


def test_fixed_atom_dcd_rejected(tmp_path):
    """Fixed-atom DCDs (NAMNF != 0) store only free atoms after frame 1;
    the uniform-frame-size readers must reject them loudly."""
    rng = np.random.default_rng(3)
    positions = rng.normal(size=(2, 4, 3)).astype(np.float32)
    path = str(tmp_path / 'fixed.dcd')
    write_dcd(path, positions, namnf=2)
    with pytest.raises(ValueError, match='fixed atoms'):
        dcd.read_dcd_header(path)


def test_truncated_dcd_raises_valueerror(tmp_path):
    """A truncated header must raise the parser's ValueError on both the
    native-failure fallback and the pure-Python path — not leak
    struct.error from a short read."""
    rng = np.random.default_rng(4)
    positions = rng.normal(size=(2, 4, 3)).astype(np.float32)
    path = str(tmp_path / 'full.dcd')
    write_dcd(path, positions)
    payload = open(path, 'rb').read()

    for cut in (2, 6, 40, 90):
        trunc = str(tmp_path / f'trunc{cut}.dcd')
        with open(trunc, 'wb') as f:
            f.write(payload[:cut])
        with pytest.raises(ValueError):
            dcd.read_dcd_header(trunc)
