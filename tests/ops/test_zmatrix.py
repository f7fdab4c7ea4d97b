"""Internal-coordinate transform tests: roundtrip, ranges, log-det oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.ops.zmatrix import (
    cartesian_to_internal, internal_to_cartesian,
)

BATCH = 4
# 3 Cartesian reference atoms (0, 1, 2) + 4 IC atoms in a chain.
Z_MATRIX = np.array([
    [3, 0, 1, 2],
    [4, 3, 0, 1],
    [5, 4, 3, 0],
    [6, 5, 4, 3],
])
N_ATOMS = 7
CARTESIAN = np.array([0, 1, 2])


def make_positions(key=0):
    rng = np.random.default_rng(key)
    # Start from a roughly linear chain with noise to avoid collinearity.
    base = np.arange(N_ATOMS)[:, None] * np.array([1.2, 0.3, -0.2])
    pos = base + 0.4 * rng.normal(size=(BATCH, N_ATOMS, 3))
    return jnp.asarray(pos)


@pytest.mark.parametrize('normalize', [False, True])
def test_roundtrip(normalize):
    x = make_positions()
    bonds, angles, torsions, ldj = cartesian_to_internal(
        x, Z_MATRIX, normalize_angles=normalize)

    if normalize:
        assert np.all(np.asarray(angles) >= 0) and \
            np.all(np.asarray(angles) <= 1)
        assert np.all(np.asarray(torsions) >= 0) and \
            np.all(np.asarray(torsions) <= 1)

    # Reconstruct from the Cartesian reference atoms only.
    positions_init = jnp.zeros_like(x).at[:, CARTESIAN].set(x[:, CARTESIAN])
    x_rec, ldj_inv = internal_to_cartesian(
        bonds, angles, torsions, positions_init, Z_MATRIX,
        normalize_angles=normalize)

    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-9)


def test_unrolled_matches_scan(monkeypatch):
    """The unrolled placement path (levels <= _UNROLL_MAX_LEVELS) and the
    lax.scan fallback must produce identical positions and gradients."""
    from tfep_tpu.ops import zmatrix as zm

    x = make_positions(3)
    bonds, angles, torsions, _ = cartesian_to_internal(x, Z_MATRIX)
    positions_init = jnp.zeros_like(x).at[:, CARTESIAN].set(x[:, CARTESIAN])

    def run():
        def loss(args):
            b, a, t = args
            pos, ldj = internal_to_cartesian(
                b, a, t, positions_init, Z_MATRIX)
            return jnp.sum(pos ** 2) + jnp.sum(ldj)
        value, grads = jax.value_and_grad(loss)((bonds, angles, torsions))
        return value, grads

    v_unrolled, g_unrolled = run()           # 4 levels -> unrolled
    monkeypatch.setattr(zm, '_UNROLL_MAX_LEVELS', 0)
    v_scan, g_scan = run()                   # forced lax.scan

    np.testing.assert_allclose(np.asarray(v_unrolled), np.asarray(v_scan),
                               rtol=1e-12)
    for gu, gs in zip(g_unrolled, g_scan):
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gs),
                                   rtol=1e-10, atol=1e-12)


def test_log_det_oracle():
    """log-det of the full (IC DOFs <- cart DOFs) map matches jacfwd+slogdet."""
    x = make_positions(1)
    ic_atoms = Z_MATRIX[:, 0]

    def cart_to_ic_flat(x_ic_flat):
        """Map the IC atoms' cartesian DOFs -> (bonds, angles, torsions)."""
        x_full = x.at[:, ic_atoms].set(
            x_ic_flat.reshape(BATCH, len(ic_atoms), 3))
        bonds, angles, torsions, _ = cartesian_to_internal(
            x_full, Z_MATRIX, normalize_angles=True)
        return jnp.concatenate([bonds, angles, torsions], axis=-1)

    x_ic_flat = x[:, ic_atoms].reshape(BATCH, -1)

    def single(xi):
        x_full = x[:1].at[:, ic_atoms].set(xi.reshape(1, len(ic_atoms), 3))
        b, a, t, _ = cartesian_to_internal(x_full, Z_MATRIX)
        return jnp.concatenate([b, a, t], axis=-1)[0]

    # One sample is enough for the Jacobian check (per-sample independence).
    jac = jax.jacfwd(single)(x_ic_flat[0])
    oracle_ldj = jnp.linalg.slogdet(jac)[1]

    _, _, _, ldj = cartesian_to_internal(x[:1], Z_MATRIX)
    np.testing.assert_allclose(float(ldj[0]), float(oracle_ldj), atol=1e-8)


def test_gradients_through_reconstruction():
    x = make_positions(2)
    bonds, angles, torsions, _ = cartesian_to_internal(x, Z_MATRIX)
    positions_init = jnp.zeros_like(x).at[:, CARTESIAN].set(x[:, CARTESIAN])

    def loss(b):
        pos, ldj = internal_to_cartesian(b, angles, torsions,
                                         positions_init, Z_MATRIX)
        return jnp.sum(pos ** 2) + jnp.sum(ldj)

    g = jax.grad(loss)(bonds)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


# =============================================================================
# Randomized-topology fuzz
# =============================================================================

def _random_z_matrix(rng, n_atoms):
    """A valid random Z-matrix over atoms 3..n-1 (0, 1, 2 are Cartesian).

    Each atom bonds to a random already-placed parent, with two further
    distinct placed atoms as angle/torsion references — random trees with
    arbitrary branching, so the level scheduler sees non-chain DAGs."""
    rows = []
    for i in range(3, n_atoms):
        placed = np.arange(i)
        parent = int(rng.choice(placed))
        others = rng.choice(placed[placed != parent], size=2, replace=False)
        rows.append([i, parent, int(others[0]), int(others[1])])
    return np.array(rows)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('n_atoms', [5, 9])
def test_fuzz_random_topology_roundtrip(seed, n_atoms):
    """Round trip + log-det antisymmetry + oracle over random trees with
    geometry generated from safe internal-coordinate ranges."""
    rng = np.random.default_rng(seed)
    z_matrix = _random_z_matrix(rng, n_atoms)
    n_ic = len(z_matrix)
    batch = 3

    # Non-degenerate Cartesian reference triangle per sample.
    ref = np.array([[0.0, 0.0, 0.0], [1.3, 0.0, 0.0], [0.6, 1.1, 0.2]])
    ref = ref[None] + 0.05 * rng.normal(size=(batch, 3, 3))

    # Sample ICs in collinearity-safe ranges and build the geometry.
    bonds = jnp.asarray(rng.uniform(0.9, 1.6, size=(batch, n_ic)))
    angles = jnp.asarray(rng.uniform(0.6, 2.5, size=(batch, n_ic)))
    torsions = jnp.asarray(rng.uniform(-3.0, 3.0, size=(batch, n_ic)))
    positions_init = jnp.zeros((batch, n_atoms, 3)).at[:, :3].set(ref)
    x, ldj_build = internal_to_cartesian(
        bonds, angles, torsions, positions_init, z_matrix,
        normalize_angles=False)

    # Measure back: identical ICs (up to torsion wrap), antisymmetric ldj.
    b2, a2, t2, ldj_measure = cartesian_to_internal(
        x, z_matrix, normalize_angles=False)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(bonds), atol=1e-8)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(angles), atol=1e-8)
    dt = (np.asarray(t2) - np.asarray(torsions) + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dt, 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_build + ldj_measure), 0.0,
                               atol=1e-8)

    # Oracle on the first sample: analytic log-det == jacfwd + slogdet.
    ic_atoms = z_matrix[:, 0]

    def single(xi):
        x_full = x[:1].at[:, ic_atoms].set(xi.reshape(1, n_ic, 3))
        b, a, t, _ = cartesian_to_internal(x_full, z_matrix)
        return jnp.concatenate([b, a, t], axis=-1)[0]

    jac = jax.jacfwd(single)(x[0, ic_atoms].reshape(-1))
    oracle_ldj = jnp.linalg.slogdet(jac)[1]
    _, _, _, ldj = cartesian_to_internal(x[:1], z_matrix)
    np.testing.assert_allclose(float(ldj[0]), float(oracle_ldj), atol=1e-7)


def test_forward_reference_z_matrix_rejected():
    """Rows out of dependency order must raise, not reconstruct garbage."""
    from tfep_tpu.ops.zmatrix import build_placement_schedule

    # Row 0 places atom 5 but references atom 6, placed by row 1.
    z = np.array([[5, 6, 1, 2],
                  [6, 1, 2, 0]])
    with pytest.raises(ValueError, match='dependency order'):
        build_placement_schedule(z, n_atoms=7)
    # Self-reference is a (degenerate) forward reference too.
    with pytest.raises(ValueError, match='dependency order'):
        build_placement_schedule(np.array([[3, 3, 1, 2]]), n_atoms=4)


def test_empty_z_matrix_schedule():
    """Zero IC rows yield an empty schedule instead of a numpy crash."""
    from tfep_tpu.ops.zmatrix import build_placement_schedule

    targets, refs, cols = build_placement_schedule(
        np.zeros((0, 4), dtype=np.int64), n_atoms=3)
    assert targets.shape[0] == 0
