"""Potentials layer tests.

Engine-independent coverage (the reference's approach for gromacs/mimic,
tests/potentials/test_mimic.py:237-317): the callback bridge gradient
contract, unit conversions through EnginePotential, g96 writing, CPMD input
parsing/rewriting, and trajectory-file readers — all with fake hosts/files.
Real-engine tests are availability-gated.
"""

import os
import subprocess
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.potentials import EnginePotential, make_callback_potential
from tfep_tpu.potentials.gromacs import (
    GmxGrompp, GmxMdrun, _cell_to_box_vectors, _create_g96_file, _read_xvg,
)
from tfep_tpu.potentials.mimic import (
    Cpmd, _parse_cpmd_input, _prepare_cpmd_command, _read_first_energy,
    _read_first_force,
)
from tfep_tpu.units import ureg

BATCH, N_DOFS = 4, 6


# =============================================================================
# Callback bridge
# =============================================================================

class TestCallbackBridge:
    def _host(self, x):
        x = np.asarray(x)
        return 0.5 * np.sum(x ** 2, axis=-1), -x  # energies, forces

    def test_forward_values(self):
        pot = make_callback_potential(self._host)
        x = jax.random.normal(jax.random.key(0), (BATCH, N_DOFS))
        e = pot(x)
        np.testing.assert_allclose(np.asarray(e),
                                   0.5 * np.sum(np.asarray(x) ** 2, axis=-1),
                                   rtol=1e-6)

    def test_gradient_is_minus_forces(self):
        pot = make_callback_potential(self._host)
        x = jax.random.normal(jax.random.key(0), (BATCH, N_DOFS))
        grad = jax.grad(lambda z: jnp.sum(pot(z)))(x)
        # d(0.5 x^2)/dx = x = -forces.
        np.testing.assert_allclose(np.asarray(grad), np.asarray(x),
                                   rtol=1e-6)

    def test_under_jit(self):
        pot = make_callback_potential(self._host)

        @jax.jit
        def loss(x):
            return jnp.mean(pot(x))

        x = jax.random.normal(jax.random.key(0), (BATCH, N_DOFS))
        val, grad = jax.value_and_grad(loss)(x)
        assert np.isfinite(float(val))
        np.testing.assert_allclose(np.asarray(grad),
                                   np.asarray(x) / BATCH, rtol=1e-6)

    def test_with_cell(self):
        def host(x, cell):
            return (np.sum(np.asarray(x), axis=-1)
                    + np.sum(np.asarray(cell), axis=-1),
                    np.ones_like(np.asarray(x)))

        pot = make_callback_potential(host, has_cell=True)
        x = jnp.ones((BATCH, N_DOFS))
        cell = 2.0 * jnp.ones((BATCH, 3))
        e = pot(x, cell)
        np.testing.assert_allclose(np.asarray(e), N_DOFS + 6.0)
        grad = jax.grad(lambda z: jnp.sum(pot(z, cell)))(x)
        np.testing.assert_allclose(np.asarray(grad), -1.0)


# =============================================================================
# EnginePotential unit conversion + NaN policy
# =============================================================================

class HarmonicEngine(EnginePotential):
    """Fake engine in eV/angstrom: U = 0.5 k |x|^2 with k = 1 eV/A^2."""

    DEFAULT_ENERGY_UNIT = 'eV'
    DEFAULT_POSITIONS_UNIT = 'angstrom'
    ENGINE_ENERGY_UNIT = 'eV'
    ENGINE_POSITIONS_UNIT = 'angstrom'

    fail_samples: set = set()

    def _compute_batch(self, positions, cell, compute_forces):
        energies = 0.5 * np.sum(positions ** 2, axis=-1)
        for i in self.fail_samples:
            energies[i] = np.nan
        forces = -positions if compute_forces else None
        return energies, forces


class TestEnginePotential:
    def test_native_units(self):
        pot = HarmonicEngine()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(BATCH, N_DOFS)))
        e = pot(x)
        np.testing.assert_allclose(
            np.asarray(e), 0.5 * np.sum(np.asarray(x) ** 2, axis=-1),
            rtol=1e-6)

    def test_unit_conversion(self):
        """Positions in nm, energies in kcal/mol: both conversions apply."""
        pot = HarmonicEngine(positions_unit=ureg.nanometer,
                             energy_unit=ureg.kilocalorie_per_mole)
        x_nm = jnp.full((1, 3), 0.1)          # = 1 angstrom per DOF
        e = pot(x_nm)
        # Engine: 0.5 * 3 * (1 A)^2 = 1.5 eV -> kcal/mol.
        expected = 1.5 * 23.060547830619026   # eV -> kcal/mol
        np.testing.assert_allclose(np.asarray(e)[0], expected, rtol=1e-6)

        # Gradient chain rule: dE[kcal/mol]/dx[nm].
        grad = jax.grad(lambda z: jnp.sum(pot(z)))(x_nm)
        expected_grad = 23.060547830619026 * 10.0  # (eV/A -> kcal/mol/nm)
        np.testing.assert_allclose(np.asarray(grad)[0], expected_grad,
                                   rtol=1e-6)

    def test_sample_keys_ride_the_callback(self):
        """Per-sample keys passed to __call__ reach _compute_batch with the
        positions (and survive jit + grad)."""
        seen = []

        class KeyedEngine(HarmonicEngine):
            uses_sample_keys = True

            def _compute_batch(self, positions, cell, compute_forces):
                seen.append(np.asarray(self._current_sample_keys))
                return super()._compute_batch(positions, cell,
                                              compute_forces)

        pot = KeyedEngine()
        keys = jnp.asarray([5, 2, 9, 0])
        x = jnp.ones((BATCH, N_DOFS))

        @jax.jit
        def total_energy(z, k):
            return jnp.sum(pot(z, sample_keys=k))

        grad = jax.grad(total_energy)(x, keys)
        assert np.all(np.isfinite(np.asarray(grad)))
        for recorded in seen:
            np.testing.assert_array_equal(recorded, [5, 2, 9, 0])

    def test_nan_policy_flows_to_loss(self):
        from tfep_tpu.loss import boltzmann_kl_div_loss
        pot = HarmonicEngine()
        pot.fail_samples = {1}
        x = jnp.ones((3, N_DOFS))
        e = pot(x)
        assert np.isnan(np.asarray(e)[1])
        loss = boltzmann_kl_div_loss(e, ignore_nan=True)
        assert np.isfinite(float(loss))


# =============================================================================
# GROMACS file I/O (no gmx needed)
# =============================================================================

class TestGromacsIO:
    def test_g96_file(self, tmp_path):
        positions = np.arange(9, dtype=float).reshape(3, 3) / 10
        box = np.diag([4.0, 3.0, 2.0])
        path = _create_g96_file(str(tmp_path), positions, box)
        content = open(path).read()
        assert 'POSITIONRED' in content and 'BOX' in content
        box_line = content.split('BOX\n')[1].splitlines()[0].split()
        assert [float(x) for x in box_line[:3]] == [4.0, 3.0, 2.0]

    def test_cell_to_box_vectors(self):
        np.testing.assert_allclose(
            _cell_to_box_vectors(np.asarray([2.0, 3.0, 4.0])),
            np.diag([2.0, 3.0, 4.0]))
        box = _cell_to_box_vectors(np.asarray([2.0, 3, 4, 90, 90, 90]))
        np.testing.assert_allclose(box, np.diag([2.0, 3, 4]), atol=1e-12)

    def test_read_xvg(self, tmp_path):
        xvg = tmp_path / 'f.xvg'
        xvg.write_text('# comment\n@ legend\n0.0 1.0 2.0 3.0\n')
        np.testing.assert_allclose(_read_xvg(str(xvg)), [0.0, 1.0, 2.0, 3.0])

    def test_grompp_command(self):
        # Options render alphabetically by attribute name (the reference's
        # inspect.getmembers ordering, cf. tests/parity).
        cmd = GmxGrompp(mdp_path='sim.mdp', max_warnings=2)
        argv = cmd.to_subprocess()
        assert argv[:2] == ['gmx', 'grompp']
        assert sorted([tuple(argv[i:i + 2]) for i in range(2, len(argv), 2)]) \
            == [('-f', 'sim.mdp'), ('-maxwarn', '2')]

    def test_mdrun_command(self):
        cmd = GmxMdrun(output_prefix='sim', omp_threads_per_rank=4)
        argv = cmd.to_subprocess()
        assert argv[:2] == ['gmx', 'mdrun']
        assert sorted([tuple(argv[i:i + 2]) for i in range(2, len(argv), 2)]) \
            == [('-deffnm', 'sim'), ('-ntomp', '4')]


# =============================================================================
# MiMiC / CPMD input handling (no engines needed)
# =============================================================================

CPMD_INPUT = textwrap.dedent("""\
    &MIMIC
    PATHS
    1
    /old/path
    BOX
    20.0 20.0 20.0
    OVERLAPS
    2
    2 1 1 1
    2 3 1 2
    &END
    &ATOMS
    *O.pbe
     LMAX=P
       1
     1.0 2.0 3.0
    *H.pbe
     LMAX=S
       1
     4.0 5.0 6.0
    &END
    """)


class TestCpmdInput:
    def test_cpmd_command(self):
        assert Cpmd('input.in', 'pseudo/').to_subprocess() == \
            ['cpmd', 'input.in', 'pseudo/']

    def test_parse(self, tmp_path):
        path = tmp_path / 'cpmd.in'
        path.write_text(CPMD_INPUT)
        (lines, paths_idx, box_idx, overlaps, atom_lines) = \
            _parse_cpmd_input(str(path))
        assert lines[paths_idx].strip() == '/old/path'
        assert lines[box_idx].split() == ['20.0', '20.0', '20.0']
        # OVERLAPS: gromacs 1-based 1->cpmd 1, gromacs 3->cpmd 2.
        assert overlaps == {0: 0, 2: 1}
        assert lines[atom_lines[0]].split() == ['1.0', '2.0', '3.0']
        assert lines[atom_lines[1]].split() == ['4.0', '5.0', '6.0']

    def test_prepare_rewrites(self, tmp_path):
        path = tmp_path / 'cpmd.in'
        path.write_text(CPMD_INPUT)
        cmd = Cpmd(str(path))
        positions = np.arange(9, dtype=float).reshape(3, 3)
        box = np.asarray([30.0, 30.0, 30.0])
        new_cmd, overlaps = _prepare_cpmd_command(
            cmd, str(tmp_path), positions, box)
        assert new_cmd.args[0] == 'cpmd.inp'
        rewritten = (tmp_path / 'cpmd.inp').read_text().splitlines()
        # Working dir updated.
        assert str(tmp_path) in '\n'.join(rewritten)
        # Box rewritten.
        assert any(l.split() == ['30.0', '30.0', '30.0'] for l in rewritten)
        # QM atom coordinates rewritten: gromacs atom 0 -> cpmd atom 0,
        # gromacs atom 2 -> cpmd atom 1.
        assert any(l.split() == ['0.0', '1.0', '2.0'] for l in rewritten)
        assert any(l.split() == ['6.0', '7.0', '8.0'] for l in rewritten)

    def test_read_energy_and_force(self, tmp_path):
        (tmp_path / 'ENERGIES').write_text(
            '1  0.0  0.0  -17.1234  0.0\n2  0.0  0.0  -17.2  0.0\n')
        assert _read_first_energy(str(tmp_path)) == -17.1234

        # FTRAJECTORY: step, 3 pos, 3 vel, 3 force.
        (tmp_path / 'FTRAJECTORY').write_text(
            '1 0 0 0 0 0 0 0.1 0.2 0.3\n'
            '1 0 0 0 0 0 0 0.4 0.5 0.6\n'
            '2 0 0 0 0 0 0 9.0 9.0 9.0\n')
        force = _read_first_force(str(tmp_path), {0: 1, 1: 0})
        np.testing.assert_allclose(force,
                                   [[0.4, 0.5, 0.6], [0.1, 0.2, 0.3]])


# =============================================================================
# Engine-gated tests (skipped when engines are absent).
#
# Installation status in the development environment (checked 2026-08):
# none of ase/tblite/openmm/psi4 is importable. pip itself exists, but the
# environment has no network route to a package index (pip install fails on
# DNS resolution), so the engines cannot be installed here and these two
# tests necessarily skip. Engine *behavioral* coverage — argument plumbing,
# context-cache reuse, restart files, NaN/failure policies — lives in
# tests/potentials/test_mock_engines.py against faithful mock modules; what
# only a real engine can validate is the engines' own API spellings, which
# these tests exercise wherever the engines exist (mirroring the
# reference's availability gating,
# /root/reference/tfep/tests/potentials/test_psi4.py:144). The skip reason
# self-documents the probe result (see _engine_skip_reason below), so if
# the environment ever gains an importable engine or network access these
# tests light up on their own.
# =============================================================================

import functools


@functools.lru_cache(maxsize=1)
def _package_index_reachable() -> bool:
    """One cheap per-run probe: can pip actually reach an index?

    pip exists in this image; what blocks engine installation is the
    missing network route. Probing (instead of asserting it in a comment)
    keeps the skip reason truthful if the environment ever gains network
    — at which point the right move is installing the engines and letting
    these tests run.
    """
    import subprocess
    import sys
    try:
        proc = subprocess.run(
            [sys.executable, '-m', 'pip', 'install', '--dry-run',
             '--quiet', '--no-input', 'ase==3.22.1'],
            capture_output=True, text=True, timeout=60)
    except (subprocess.TimeoutExpired, OSError):
        return False
    return proc.returncode == 0


def _engine_skip_reason(module_name: str) -> str:
    """Why an engine test is skipping: distinguishes 'not installed and
    not installable (no route to a package index)' from 'not installed
    but installable' so the skip message stays truthful across
    environments."""
    import importlib.util
    if importlib.util.find_spec(module_name) is not None:
        return ''
    if _package_index_reachable():
        return (f'{module_name} not importable — but a package index IS '
                'reachable now; install it and let this test run')
    return (f'{module_name} not importable and no package index reachable '
            'to install it (pip exists; the network is blocked)')

from tfep_tpu.potentials.ase import ASE_INSTALLED
from tfep_tpu.potentials.tblite import TBLITE_INSTALLED


def test_ase_potential_lj():
    if not ASE_INSTALLED:
        pytest.skip(_engine_skip_reason('ase'))
    from ase.calculators.lj import LennardJones
    from tfep_tpu.potentials import ASEPotential

    pot = ASEPotential(calculator=LennardJones(), symbols='Ar2')
    x = jnp.asarray([[0.0, 0, 0, 3.4, 0, 0]])
    e = pot(x)
    assert np.isfinite(float(e[0]))
    grad = jax.grad(lambda z: jnp.sum(pot(z)))(x)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_tblite_potential_water():
    if not TBLITE_INSTALLED:
        pytest.skip(_engine_skip_reason('tblite'))
    from tfep_tpu.potentials import TBLitePotential

    pot = TBLitePotential('GFN2-xTB', numbers=[8, 1, 1])
    x = jnp.asarray([[0.0, 0, 0, 0, 1.8, 0, 1.7, -0.5, 0]])
    e = pot(x)
    assert float(e[0]) < 0


class TestForceMatching:
    def test_forces_values_and_hessian(self):
        """forces() is differentiable: grad gives FD vector-Hessian products."""
        pot = HarmonicEngine()
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, N_DOFS)))
        f = pot.forces(x)
        np.testing.assert_allclose(np.asarray(f), -np.asarray(x), rtol=1e-6)

        # Force-matching loss: L = 0.5 |F(x) - F_target|^2.
        f_target = jnp.zeros_like(x)

        def loss(z):
            return 0.5 * jnp.sum((pot.forces(z) - f_target) ** 2)

        grad = jax.grad(loss)(x)
        # Analytic: dL/dx = (F - F_t)^T dF/dx = (-x)^T (-I) = x.
        np.testing.assert_allclose(np.asarray(grad), np.asarray(x),
                                   rtol=1e-5, atol=1e-7)
