"""CHARMM/NAMD PSF topology and AMBER restart readers.

Fixture provenance: the PSF samples follow the atom-section layout
published in the NAMD user guide / CHARMM io documentation (classic and
EXT flavors); the ASCII restart follows the AMBER file-format
specification (``6F12.7`` coordinate fields, optional velocity block and
trailing box line); the NetCDF restart golden is generated live by
``scipy.io.netcdf_file`` — an independent NetCDF implementation — per the
AMBERRESTART convention, mirroring tests/io/test_netcdf.py's independence
standard.
"""

import numpy as np
import pytest

from tfep_tpu.io.restart import read_amber_restart, read_inpcrd, read_ncrst
from tfep_tpu.io.topfiles import read_psf
from tfep_tpu.io.traj import System, load_topology

# A two-water X-PLOR/NAMD-style PSF (whitespace-delimited, as NAMD writes).
PSF_CLASSIC = """\
PSF

       2 !NTITLE
 REMARKS original generated structure x-plor psf file
 REMARKS 2 TIP3P waters

       6 !NATOM
       1 WT1  1    TIP3 OH2  OT    -0.834000       15.9994           0
       2 WT1  1    TIP3 H1   HT     0.417000        1.0080           0
       3 WT1  1    TIP3 H2   HT     0.417000        1.0080           0
       4 WT1  2    TIP3 OH2  OT    -0.834000       15.9994           0
       5 WT1  2    TIP3 H1   HT     0.417000        1.0080           0
       6 WT1  2    TIP3 H2   HT     0.417000        1.0080           0

       4 !NBOND: bonds
       1       2       1       3       4       5
       4       6

       2 !NTHETA: angles
       2       1       3       5       4       6

       0 !NPHI: dihedrals


       0 !NIMPHI: impropers

"""

# The same system in CHARMM EXT(+CHEQ) flavor: wider fields, extra
# trailing columns after the fixed flag (ignored by the reader).
PSF_EXT = """\
PSF EXT CHEQ

         1 !NTITLE
* 2 TIP3P WATERS, EXTENDED FORMAT

         6 !NATOM
         1 WT1      1        TIP3     OH2      OT      -0.834000       15.9994           0   0.00000     -0.301140E-02
         2 WT1      1        TIP3     H1       HT       0.417000        1.0080           0   0.00000     -0.301140E-02
         3 WT1      1        TIP3     H2       HT       0.417000        1.0080           0   0.00000     -0.301140E-02
         4 WT1      2        TIP3     OH2      OT      -0.834000       15.9994           0   0.00000     -0.301140E-02
         5 WT1      2        TIP3     H1       HT       0.417000        1.0080           0   0.00000     -0.301140E-02
         6 WT1      2        TIP3     H2       HT       0.417000        1.0080           0   0.00000     -0.301140E-02

         4 !NBOND: bonds
         1         2         1         3         4         5
         4         6
"""


@pytest.mark.parametrize('text', [PSF_CLASSIC, PSF_EXT],
                         ids=['classic', 'ext'])
def test_read_psf(tmp_path, text):
    path = tmp_path / 'waters.psf'
    path.write_text(text)
    top = read_psf(str(path))

    assert top.n_atoms == 6
    assert top.names.tolist() == ['OH2', 'H1', 'H2'] * 2
    assert top.resnames.tolist() == ['TIP3'] * 6
    assert top.resids.tolist() == [1, 1, 1, 2, 2, 2]
    # Elements recovered from the masses (PSF has no element column).
    assert top.elements.tolist() == ['O', 'H', 'H'] * 2
    np.testing.assert_allclose(
        top.masses, [15.9994, 1.008, 1.008] * 2, atol=1e-4)
    # 1-based pairs on disk -> sorted zero-based.
    assert top.bonds.tolist() == [[0, 1], [0, 2], [3, 4], [3, 5]]


def test_read_psf_rejects_non_psf(tmp_path):
    path = tmp_path / 'x.psf'
    path.write_text('ATOM ...\n')
    with pytest.raises(ValueError, match='not a PSF'):
        read_psf(str(path))


def test_read_psf_truncated_bonds(tmp_path):
    path = tmp_path / 'x.psf'
    path.write_text('PSF\n\n       1 !NATOM\n'
                    '       1 A    1    RES  X    XT    0.0    12.011    0\n'
                    '\n       2 !NBOND\n       1       1\n')
    with pytest.raises(ValueError, match='truncated'):
        read_psf(str(path))


def test_load_topology_dispatches_psf(tmp_path):
    path = tmp_path / 'waters.psf'
    path.write_text(PSF_CLASSIC)
    top = load_topology(str(path))
    assert top.n_atoms == 6 and len(top.bonds) == 4


# ---------------------------------------------------------------------- #
# ASCII inpcrd/rst7
# ---------------------------------------------------------------------- #

def format_inpcrd(positions, velocities=None, box=None, time=None):
    """Serialize per the published AMBER restart format (6F12.7)."""
    flat = np.asarray(positions, dtype=np.float64).reshape(-1)
    n_atoms = flat.size // 3
    lines = ['generated test restart']
    lines.append(f'{n_atoms:5d}' + (f'{time:15.7e}' if time is not None
                                    else ''))
    blocks = [flat]
    if velocities is not None:
        blocks.append(np.asarray(velocities, dtype=np.float64).reshape(-1))
    if box is not None:
        blocks.append(np.asarray(box, dtype=np.float64))
    for block in blocks:
        for k in range(0, block.size, 6):
            lines.append(''.join(f'{v:12.7f}' for v in block[k:k + 6]))
    return '\n'.join(lines) + '\n'


def test_read_inpcrd_plain(tmp_path):
    rng = np.random.default_rng(1)
    pos = rng.normal(0, 5, size=(4, 3))
    path = tmp_path / 'x.inpcrd'
    path.write_text(format_inpcrd(pos))
    positions, dimensions, time = read_inpcrd(str(path))
    assert positions.shape == (1, 4, 3)
    np.testing.assert_allclose(positions[0], pos, atol=1e-6)
    assert dimensions is None and time is None


def test_read_inpcrd_velocities_box_time(tmp_path):
    rng = np.random.default_rng(2)
    pos = rng.normal(0, 5, size=(5, 3))
    vel = rng.normal(0, 1, size=(5, 3))
    box = [20.0, 21.0, 22.0, 90.0, 90.0, 90.0]
    path = tmp_path / 'x.rst7'
    path.write_text(format_inpcrd(pos, velocities=vel, box=box, time=12.5))
    positions, dimensions, time = read_amber_restart(str(path))
    np.testing.assert_allclose(positions[0], pos, atol=1e-6)
    np.testing.assert_allclose(dimensions[0], box, atol=1e-6)
    assert time == pytest.approx(12.5)


def test_read_inpcrd_box_only(tmp_path):
    pos = np.arange(9, dtype=np.float64).reshape(3, 3)
    box = [15.0, 15.0, 15.0, 109.47, 109.47, 109.47]
    path = tmp_path / 'x.restrt'
    path.write_text(format_inpcrd(pos, box=box))
    positions, dimensions, _ = read_inpcrd(str(path))
    np.testing.assert_allclose(positions[0], pos, atol=1e-6)
    np.testing.assert_allclose(dimensions[0], box, atol=1e-4)


def test_read_inpcrd_adjacent_negative_fields(tmp_path):
    """Fixed-width fields that exactly fill their 12 columns touch with
    no separating blank; slicing parses them where whitespace splitting
    would fail."""
    pos = np.array([[-999.9999999, 1234.5678901, -999.0000001],
                    [1000.1234567, 2.5, -3.25]])
    path = tmp_path / 'x.inpcrd'
    text = format_inpcrd(pos)
    assert '-999.99999991234.5678901' in text  # fields really do touch
    path.write_text(text)
    positions, _, _ = read_inpcrd(str(path))
    np.testing.assert_allclose(positions[0], pos, rtol=1e-7)


def test_read_inpcrd_bad_trailing_count(tmp_path):
    pos = np.zeros((2, 3))
    path = tmp_path / 'x.inpcrd'
    path.write_text(format_inpcrd(pos) + '     1.0     2.0\n')
    with pytest.raises(ValueError, match='trailing'):
        read_inpcrd(str(path))


# ---------------------------------------------------------------------- #
# NetCDF restart (AMBERRESTART convention)
# ---------------------------------------------------------------------- #

def write_scipy_ncrst(path, positions, box=None, time=None):
    """Write an AMBERRESTART-convention file with scipy (independent
    implementation)."""
    scipy_io = pytest.importorskip('scipy.io')
    nc = scipy_io.netcdf_file(str(path), 'w', version=1)
    nc.Conventions = b'AMBERRESTART'
    nc.ConventionVersion = b'1.0'
    nc.program = b'scipy-test'
    nc.programVersion = b'0'
    nc.title = b'restart golden'
    n_atoms = positions.shape[0]
    nc.createDimension('atom', n_atoms)
    nc.createDimension('spatial', 3)
    coords = nc.createVariable('coordinates', 'd', ('atom', 'spatial'))
    coords[:] = positions
    coords.units = b'angstrom'
    if time is not None:
        nc.createDimension('single', 1)
        tvar = nc.createVariable('time', 'd', ('single',))
        tvar[:] = [time]
        tvar.units = b'picosecond'
    if box is not None:
        nc.createDimension('cell_spatial', 3)
        nc.createDimension('cell_angular', 3)
        lengths = nc.createVariable('cell_lengths', 'd', ('cell_spatial',))
        lengths[:] = box[:3]
        lengths.units = b'angstrom'
        angles = nc.createVariable('cell_angles', 'd', ('cell_angular',))
        angles[:] = box[3:]
        angles.units = b'degree'
    nc.close()


def test_read_ncrst_scipy_cross(tmp_path):
    rng = np.random.default_rng(3)
    pos = rng.normal(0, 8, size=(7, 3))
    box = np.array([30.0, 31.0, 32.0, 90.0, 90.0, 120.0])
    path = tmp_path / 'x.ncrst'
    write_scipy_ncrst(path, pos, box=box, time=7.75)
    positions, dimensions, time = read_ncrst(str(path))
    assert positions.shape == (1, 7, 3)
    np.testing.assert_allclose(positions[0], pos, atol=1e-5)
    np.testing.assert_allclose(dimensions[0], box, atol=1e-5)
    assert time == pytest.approx(7.75)
    # The magic sniffer routes the same file through the NetCDF path.
    positions2, _, _ = read_amber_restart(str(path))
    np.testing.assert_array_equal(positions, positions2)


def test_read_ncrst_rejects_trajectory_convention(tmp_path):
    from tfep_tpu.io.netcdf import write_amber_netcdf
    path = tmp_path / 'traj.nc'
    write_amber_netcdf(str(path), np.zeros((2, 3, 3), dtype=np.float32))
    with pytest.raises(ValueError, match='not an AMBER NetCDF restart'):
        read_ncrst(str(path))


# ---------------------------------------------------------------------- #
# System.from_file wiring
# ---------------------------------------------------------------------- #

def test_system_from_restart_with_prmtop_style_topology(tmp_path):
    """The AMBER pair: a restart + a PSF/prmtop-style topology loads into
    a one-frame System."""
    path = tmp_path / 'waters.psf'
    path.write_text(PSF_CLASSIC)
    rng = np.random.default_rng(4)
    pos = rng.normal(0, 4, size=(6, 3))
    rst = tmp_path / 'x.rst7'
    rst.write_text(format_inpcrd(pos, box=[25, 25, 25, 90, 90, 90],
                                 time=3.0))
    system = System.from_file(str(rst), topology_path=str(path))
    assert system.n_frames == 1 and system.topology.n_atoms == 6
    np.testing.assert_allclose(system.positions[0], pos, atol=1e-5)
    np.testing.assert_allclose(system.dimensions[0],
                               [25, 25, 25, 90, 90, 90])
    np.testing.assert_allclose(system.times, [3.0])


def test_system_from_restart_requires_topology(tmp_path):
    rst = tmp_path / 'x.inpcrd'
    rst.write_text(format_inpcrd(np.zeros((2, 3))))
    with pytest.raises(ValueError, match='topology_path'):
        System.from_file(str(rst))


def test_system_from_restart_atom_mismatch(tmp_path):
    path = tmp_path / 'waters.psf'
    path.write_text(PSF_CLASSIC)
    rst = tmp_path / 'x.inpcrd'
    rst.write_text(format_inpcrd(np.zeros((2, 3))))
    with pytest.raises(ValueError, match='atoms'):
        System.from_file(str(rst), topology_path=str(path))


def test_read_inpcrd_two_atom_ambiguity(tmp_path):
    """2-atom files: 6 trailing values are ambiguous (velocities and a
    box line are indistinguishable in the ASCII format). Values that look
    like a cell (positive lengths, angles in (0, 180]) are read as the
    box; thermal-velocity-like values are dropped rather than attached as
    a nonsense unit cell."""
    pos = np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])

    boxish = tmp_path / 'box.rst7'
    boxish.write_text(format_inpcrd(pos, box=[18.0, 18.0, 18.0,
                                              90.0, 90.0, 90.0]))
    _, dimensions, _ = read_inpcrd(str(boxish))
    np.testing.assert_allclose(dimensions[0], [18, 18, 18, 90, 90, 90])

    velish = tmp_path / 'vel.rst7'
    velish.write_text(format_inpcrd(pos, velocities=np.array(
        [[0.31, -0.52, 0.11], [-0.27, 0.44, -0.63]])))
    _, dimensions, _ = read_inpcrd(str(velish))
    assert dimensions is None


def test_read_ncrst_cell_angles_scale_factor(tmp_path):
    """scale_factor applies to every variable that carries it — including
    cell_angles (stored here as centidegrees)."""
    scipy_io = pytest.importorskip('scipy.io')
    path = tmp_path / 'scaled.ncrst'
    nc = scipy_io.netcdf_file(str(path), 'w', version=1)
    nc.Conventions = b'AMBERRESTART'
    nc.createDimension('atom', 2)
    nc.createDimension('spatial', 3)
    nc.createDimension('cell_spatial', 3)
    nc.createDimension('cell_angular', 3)
    coords = nc.createVariable('coordinates', 'd', ('atom', 'spatial'))
    coords[:] = np.zeros((2, 3)); coords.units = b'angstrom'
    lengths = nc.createVariable('cell_lengths', 'd', ('cell_spatial',))
    lengths[:] = [20.0, 20.0, 20.0]; lengths.units = b'angstrom'
    angles = nc.createVariable('cell_angles', 'd', ('cell_angular',))
    angles[:] = [0.9, 0.9, 1.2]; angles.units = b'degree'
    angles.scale_factor = 100.0
    nc.close()
    _, dimensions, _ = read_ncrst(str(path))
    np.testing.assert_allclose(dimensions[0], [20, 20, 20, 90, 90, 120])


def test_read_psf_rejects_zero_bond_index(tmp_path):
    path = tmp_path / 'x.psf'
    path.write_text('PSF\n\n       2 !NATOM\n'
                    '       1 A    1    RES  X    XT    0.0    12.011    0\n'
                    '       2 A    1    RES  Y    YT    0.0    12.011    0\n'
                    '\n       1 !NBOND\n       0       2\n')
    with pytest.raises(ValueError, match='1-based'):
        read_psf(str(path))


def test_read_psf_truncated_atoms(tmp_path):
    path = tmp_path / 'x.psf'
    path.write_text('PSF\n\n       3 !NATOM\n'
                    '       1 A    1    RES  X    XT    0.0    12.011    0\n')
    with pytest.raises(ValueError, match='NATOM section truncated'):
        read_psf(str(path))
