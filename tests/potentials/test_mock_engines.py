"""Mock-module tests for engine backends absent from this environment.

The psi4/openmm task functions normally never execute here (engines not
installed); these tests monkeypatch fake engine modules into sys.modules to
pin the argument plumbing (geometry updates, restart-file options, Context
caching, convergence policies) — coverage the reference only gets on
machines with the engines present.
"""

import sys
import types

import numpy as np
import pytest

import tfep_tpu.potentials.openmm as openmm_backend
import tfep_tpu.potentials.psi4 as psi4_backend
from tfep_tpu.potentials.openmm import (
    ContextPool, _run_single_point_calculation,
)
from tfep_tpu.potentials.psi4 import _run_psi4_task


# =============================================================================
# Fake psi4
# =============================================================================

class FakeSCFError(Exception):
    pass


class FakeMolecule:
    def __init__(self):
        self.geometry = None
        self.updated = False

    def set_geometry(self, matrix):
        self.geometry = np.asarray(matrix.array)

    def update_geometry(self):
        self.updated = True


class FakeWavefunction:
    def energy(self):
        return -7.5


def make_fake_psi4(record, fail=False):
    fake = types.ModuleType('psi4')
    fake.SCFConvergenceError = FakeSCFError

    core = types.SimpleNamespace()
    core.active = None

    def set_active_molecule(mol):
        core.active = mol
        record['activated'] = mol

    core.set_active_molecule = set_active_molecule
    core.get_active_molecule = lambda: core.active

    class Matrix:
        def __init__(self, array):
            self.array = array

        from_array = classmethod(lambda cls, a: cls(a))

        def __array__(self, dtype=None, copy=None):
            return np.asarray(self.array, dtype=dtype)

    core.Matrix = Matrix
    fake.core = core

    def energy(name, **kwargs):
        if fail:
            raise FakeSCFError('no convergence')
        record['energy_call'] = dict(kwargs, name=name)
        return -7.25

    def gradient(name, return_wfn=False, **kwargs):
        if fail:
            raise FakeSCFError('no convergence')
        record['gradient_call'] = dict(kwargs, name=name)
        grad = np.full((2, 3), 0.5)
        return (Matrix(grad), FakeWavefunction()) if return_wfn else \
            Matrix(grad)

    fake.energy = energy
    fake.gradient = gradient
    return fake


@pytest.fixture
def fake_psi4(monkeypatch):
    record = {}
    monkeypatch.setitem(sys.modules, 'psi4', make_fake_psi4(record))
    monkeypatch.setattr(psi4_backend, 'PSI4_INSTALLED', True)
    return record


def test_psi4_task_energy_plumbing(fake_psi4):
    mol = FakeMolecule()
    positions = np.arange(6, dtype=float).reshape(2, 3)
    energy, forces = _run_psi4_task(
        'mp2', mol, positions, False, 'orbitals.npy', 'restart.npy',
        'raise', {'basis': 'sto-3g'})
    assert energy == -7.25
    assert forces is None
    # Geometry updated on the activated molecule.
    assert fake_psi4['activated'] is mol
    np.testing.assert_array_equal(mol.geometry, positions)
    assert mol.updated
    # Options forwarded to psi4.energy.
    call = fake_psi4['energy_call']
    assert call['name'] == 'mp2'
    assert call['basis'] == 'sto-3g'
    assert call['write_orbitals'] == 'orbitals.npy'
    assert call['restart_file'] == 'restart.npy'


def test_psi4_task_forces_sign(fake_psi4):
    positions = np.zeros((2, 3))
    energy, forces = _run_psi4_task(
        'scf', FakeMolecule(), positions, True, False, None, 'raise', {})
    assert energy == -7.5
    # Forces are the negated gradient.
    np.testing.assert_allclose(forces, -0.5)
    # write_orbitals=False / restart_file=None must NOT be forwarded
    # (psi4 crashes on restart_file=None).
    call = fake_psi4['gradient_call']
    assert 'write_orbitals' not in call
    assert 'restart_file' not in call


def test_psi4_task_unconverged_policies(monkeypatch):
    record = {}
    monkeypatch.setitem(sys.modules, 'psi4', make_fake_psi4(record, fail=True))
    positions = np.zeros((2, 3))
    with pytest.raises(FakeSCFError):
        _run_psi4_task('scf', FakeMolecule(), positions, False, False, None,
                       'raise', {})
    energy, forces = _run_psi4_task(
        'scf', FakeMolecule(), positions, True, False, None, 'nan', {})
    assert np.isnan(energy)
    np.testing.assert_array_equal(forces, np.zeros((2, 3)))


def test_psi4_restart_dir_keys(fake_psi4, tmp_path, monkeypatch):
    """restart_dir derives per-sample paths from trajectory sample keys and
    only passes restart_file once the file exists."""
    pot = psi4_backend.Psi4Potential(
        'scf', molecule=FakeMolecule(), restart_dir=str(tmp_path / 'wfn'))
    assert pot.uses_sample_keys

    calls = []

    def fake_run(func, args):
        calls.extend(args)
        return [(-1.0, None)] * len(args)

    monkeypatch.setattr(pot.parallelization_strategy, 'run', fake_run)

    # Keys ride with the positions through compute_energies.
    pot.compute_energies(np.zeros((2, 6)), sample_keys=np.array([7, 3]))
    write_orbitals = [task[4] for task in calls]
    restart_files = [task[5] for task in calls]
    assert write_orbitals[0].endswith('sample-7.npy')
    assert write_orbitals[1].endswith('sample-3.npy')
    # First visit: no file on disk yet -> no restart_file.
    assert restart_files == [None, None]

    # Once the engine wrote sample-7, frame 7 warm-starts from it.
    (tmp_path / 'wfn' / 'sample-7.npy').write_bytes(b'')
    calls.clear()
    pot.compute_energies(np.zeros((2, 6)), sample_keys=np.array([7, 3]))
    assert calls[0][5].endswith('sample-7.npy')
    assert calls[1][5] is None


def test_psi4_restart_dir_requires_keys(fake_psi4, tmp_path):
    pot = psi4_backend.Psi4Potential(
        'scf', molecule=FakeMolecule(), restart_dir=str(tmp_path / 'wfn'))
    with pytest.raises(ValueError, match='sample_keys'):
        pot.compute_energies(np.zeros((1, 6)))


def test_psi4_restart_dir_exclusive(fake_psi4, tmp_path):
    with pytest.raises(ValueError, match='mutually exclusive'):
        psi4_backend.Psi4Potential(
            'scf', restart_dir=str(tmp_path), restart_file='x.npy')


# =============================================================================
# Fake openmm
# =============================================================================

class FakeState:
    def __init__(self, n_atoms, forces):
        self._n = n_atoms
        self._forces = forces

    def getPotentialEnergy(self):
        return types.SimpleNamespace(_value=-42.0)

    def getForces(self, asNumpy=False):
        return types.SimpleNamespace(_value=np.ones((self._n, 3)))


class FakeContext:
    def __init__(self, system, integrator, platform=None):
        self.system = system
        self.platform = platform
        self.positions = None
        self.box_vectors = None

    def setPeriodicBoxVectors(self, *rows):
        self.box_vectors = np.stack(rows)

    def setPositions(self, positions):
        self.positions = np.asarray(positions)

    def getState(self, getEnergy=False, getForces=False):
        return FakeState(len(self.positions), getForces)


def make_fake_openmm(platform_record):
    fake = types.ModuleType('openmm')
    fake.Context = FakeContext
    fake.VerletIntegrator = lambda dt: ('verlet', dt)

    class Platform:
        def __init__(self, name):
            self.name = name
            self.properties = {}

        @staticmethod
        def getPlatformByName(name):
            platform = Platform(name)
            platform_record.append(platform)
            return platform

        def setPropertyDefaultValue(self, name, value):
            self.properties[name] = value

    fake.Platform = Platform
    return fake


@pytest.fixture
def fake_openmm(monkeypatch):
    platforms = []
    monkeypatch.setitem(sys.modules, 'openmm', make_fake_openmm(platforms))
    monkeypatch.setattr(openmm_backend, 'global_context_cache', ContextPool())
    return platforms


def test_openmm_task_plumbing(fake_openmm):
    positions = np.arange(6, dtype=float).reshape(2, 3)
    box = np.diag([2.0, 2.0, 2.0])
    energy, forces = _run_single_point_calculation(
        'fake-system', 'CPU', {'Threads': '2'}, 'sysA', True, positions, box)
    assert energy == -42.0
    np.testing.assert_array_equal(forces, np.ones((2, 3)))
    # Platform selected and configured.
    assert fake_openmm[0].name == 'CPU'
    assert fake_openmm[0].properties == {'Threads': '2'}
    # Context retained under its system name with state applied.
    context = openmm_backend.global_context_cache['sysA']
    np.testing.assert_array_equal(context.positions, positions)
    np.testing.assert_array_equal(context.box_vectors, box)


def test_openmm_context_cache_reuse(fake_openmm):
    positions = np.zeros((2, 3))
    _run_single_point_calculation('sys', None, {}, 'named', False,
                                  positions, None)
    first = openmm_backend.global_context_cache['named']
    # Second call with system=None must reuse the cached Context.
    _run_single_point_calculation(None, None, {}, 'named', False,
                                  positions, None)
    assert openmm_backend.global_context_cache['named'] is first
    # Unknown name without a system is an error.
    with pytest.raises(KeyError):
        _run_single_point_calculation(None, None, {}, 'missing', False,
                                      positions, None)


def test_openmm_anonymous_context_not_cached(fake_openmm):
    _run_single_point_calculation('sys', None, {}, None, False,
                                  np.zeros((1, 3)), None)
    assert None not in openmm_backend.global_context_cache


# =============================================================================
# Fake ASE
# =============================================================================

class FakeAtoms:
    """Quadratic-energy stand-in for ase.Atoms (deep-copyable)."""

    def __init__(self):
        self.positions = None
        self.cell = None

    def set_positions(self, positions):
        self.positions = np.asarray(positions)

    def set_cell(self, cell):
        self.cell = np.asarray(cell)

    def get_potential_energy(self):
        return float(np.sum(self.positions ** 2))

    def get_forces(self):
        return -2.0 * self.positions


def test_ase_task_plumbing():
    from tfep_tpu.potentials.ase import _run_ase_task

    template = FakeAtoms()
    positions = np.arange(6, dtype=float)
    cell = np.diag([9.0, 9.0, 9.0])
    energy, forces = _run_ase_task(template, positions, cell, True)
    assert energy == float(np.sum(positions ** 2))
    np.testing.assert_allclose(forces,
                               -2.0 * positions)
    # The template stays pristine (per-task deepcopy => pool-safe).
    assert template.positions is None and template.cell is None

    energy, forces = _run_ase_task(template, positions, None, False)
    assert forces is None


# =============================================================================
# Fake tblite
# =============================================================================

def make_fake_tblite(record, fail=False):
    interface = types.ModuleType('tblite.interface')

    class Calculator:
        def __init__(self, method, numbers, positions):
            record['init'] = (method, list(numbers), np.asarray(positions))
            self.settings = {}

        def set(self, key, value):
            self.settings[key] = value
            record['settings'] = dict(self.settings)

        def singlepoint(self):
            if fail:
                raise RuntimeError('SCC did not converge')
            return {'energy': -5.5,
                    'gradient': np.full(record['init'][2].shape, 0.25)}

    interface.Calculator = Calculator
    package = types.ModuleType('tblite')
    package.interface = interface
    return package, interface


@pytest.fixture
def fake_tblite(monkeypatch):
    record = {}
    package, interface = make_fake_tblite(record)
    monkeypatch.setitem(sys.modules, 'tblite', package)
    monkeypatch.setitem(sys.modules, 'tblite.interface', interface)
    return record


def test_tblite_task_plumbing(fake_tblite):
    from tfep_tpu.potentials.tblite import _run_single_point

    positions = np.arange(6, dtype=float).reshape(2, 3)
    energy, gradient = _run_single_point(
        'GFN2-xTB', [8, 1], True, 0, False, positions)
    assert energy == -5.5
    np.testing.assert_allclose(gradient, 0.25)
    method, numbers, init_positions = fake_tblite['init']
    assert method == 'GFN2-xTB' and numbers == [8, 1]
    np.testing.assert_array_equal(init_positions, positions)
    assert fake_tblite['settings'] == {'verbosity': 0}


def test_tblite_task_failure_policies(monkeypatch):
    record = {}
    package, interface = make_fake_tblite(record, fail=True)
    monkeypatch.setitem(sys.modules, 'tblite', package)
    monkeypatch.setitem(sys.modules, 'tblite.interface', interface)
    from tfep_tpu.potentials.tblite import _run_single_point

    positions = np.zeros((2, 3))
    with pytest.raises(RuntimeError, match='SCC'):
        _run_single_point('GFN2-xTB', [8, 1], False, 0, False, positions)
    energy, gradient = _run_single_point(
        'GFN2-xTB', [8, 1], True, 0, True, positions)
    assert np.isnan(energy)
    np.testing.assert_array_equal(gradient, np.zeros((2, 3)))


# =============================================================================
# Functional APIs (reference's *_potential_energy forms)
# =============================================================================

def test_tblite_potential_energy_functional(fake_tblite, monkeypatch):
    import jax
    import jax.numpy as jnp

    import tfep_tpu.potentials.tblite as tblite_backend
    from tfep_tpu.potentials import tblite_potential_energy

    monkeypatch.setattr(tblite_backend, 'TBLITE_INSTALLED', True)
    positions = jnp.asarray(np.arange(12, dtype=np.float64).reshape(2, 6))
    energies = tblite_potential_energy(positions, 'GFN2-xTB', [8, 1])
    np.testing.assert_allclose(np.asarray(energies), -5.5)

    # Differentiable: backward = -forces * g = +gradient (tblite returns
    # gradients, forces = -gradient = -0.25 everywhere).
    grad = jax.grad(
        lambda p: tblite_potential_energy(p, 'GFN2-xTB', [8, 1]).sum()
    )(positions)
    np.testing.assert_allclose(np.asarray(grad), 0.25)


def test_ase_potential_energy_functional(monkeypatch):
    import types as _types

    import jax
    import jax.numpy as jnp

    import tfep_tpu.potentials.ase as ase_backend
    from tfep_tpu.potentials import ase_potential_energy

    fake_ase = _types.ModuleType('ase')
    fake_ase.Atoms = object
    monkeypatch.setitem(sys.modules, 'ase', fake_ase)
    monkeypatch.setattr(ase_backend, 'ASE_INSTALLED', True)

    template = FakeAtoms()
    positions = jnp.asarray(np.arange(6, dtype=np.float64).reshape(1, 6))
    energies = ase_potential_energy(positions, template)
    np.testing.assert_allclose(np.asarray(energies),
                               [float(np.sum(np.arange(6.0) ** 2))])
    # d(sum x^2)/dx = 2x (engine forces are -2x; backward flips the sign).
    grad = jax.grad(
        lambda p: ase_potential_energy(p, template).sum())(positions)
    np.testing.assert_allclose(np.asarray(grad),
                               2.0 * np.asarray(positions), rtol=1e-12)


def test_ase_template_atoms_exclusive(monkeypatch):
    import types as _types

    import tfep_tpu.potentials.ase as ase_backend
    from tfep_tpu.potentials.ase import ASEPotential

    fake_ase = _types.ModuleType('ase')
    fake_ase.Atoms = object
    monkeypatch.setitem(sys.modules, 'ase', fake_ase)
    monkeypatch.setattr(ase_backend, 'ASE_INSTALLED', True)

    with pytest.raises(ValueError, match='not both'):
        ASEPotential(atoms=FakeAtoms(), symbols='OH')
    with pytest.raises(ValueError, match='calculator is required'):
        ASEPotential()


def test_openmm_potential_energy_functional(fake_openmm, monkeypatch):
    import jax.numpy as jnp

    from tfep_tpu.potentials import openmm_potential_energy

    monkeypatch.setattr(openmm_backend, 'OPENMM_INSTALLED', True)
    positions = jnp.asarray(np.arange(6, dtype=np.float64).reshape(1, 6))
    energies = openmm_potential_energy(positions, system=object(),
                                       system_name='sys-func')
    assert np.asarray(energies).shape == (1,)


def test_ase_template_not_mutated(monkeypatch):
    """Attaching a calculator to a user-supplied template Atoms must not
    clobber the template's own calculator."""
    import types as _types

    import tfep_tpu.potentials.ase as ase_backend
    from tfep_tpu.potentials.ase import ASEPotential

    fake_ase = _types.ModuleType('ase')
    fake_ase.Atoms = object
    monkeypatch.setitem(sys.modules, 'ase', fake_ase)
    monkeypatch.setattr(ase_backend, 'ASE_INSTALLED', True)

    template = FakeAtoms()
    template.calc = 'users-own-calculator'
    pot = ASEPotential(calculator='potentials-calculator', atoms=template)
    assert template.calc == 'users-own-calculator'
    assert pot.atoms.calc == 'potentials-calculator'
