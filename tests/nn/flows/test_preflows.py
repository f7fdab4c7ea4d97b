"""Tests for CenteredCentroidFlow, OrientedFlow, PCAWhitenedFlow.

Mirrors the reference property tests: round trips, Jacobian-vs-oracle, and
the geometric constraints each wrapper enforces (centroid pinned, axis/plane
points constrained).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.flows import (
    MAF, CenteredCentroidFlow, OrientedFlow, PCAWhitenedFlow,
)
from tfep_tpu.utils.math import batch_log_abs_det_J

from tests.nn.flows.test_maf import randomize

BATCH = 4
N_POINTS = 5
N_DOFS = N_POINTS * 3


def make_inner(n_features, key=0):
    flow = MAF.create(jax.random.key(key), generate_degrees(n_features))
    return randomize(flow, jax.random.key(key + 100))


@pytest.mark.parametrize('weights', [None, [1.0, 2.0, 3.0, 4.0, 5.0]])
@pytest.mark.parametrize('subset', [None, [0, 2, 4]])
def test_centered_centroid_flow(weights, subset):
    n_centroid_points = N_POINTS if subset is None else len(subset)
    if weights is not None:
        weights = weights[:n_centroid_points]
    inner = make_inner(N_DOFS - 3)
    flow = CenteredCentroidFlow.create(
        inner, space_dimension=3, n_features=N_DOFS,
        subset_point_indices=subset, weights=weights)

    x = jax.random.normal(jax.random.key(1), (BATCH, N_DOFS), jnp.float64)
    y, ldj = flow.forward(x)

    # The weighted centroid of the mapped configuration equals the input's.
    w = (np.full(n_centroid_points, 1 / n_centroid_points) if weights is None
         else np.asarray(weights, float) / np.sum(weights))
    pts = np.asarray(subset) if subset is not None else np.arange(N_POINTS)
    cent_x = np.einsum('p,bpd->bd', w, np.asarray(x).reshape(BATCH, -1, 3)[:, pts])
    cent_y = np.einsum('p,bpd->bd', w, np.asarray(y).reshape(BATCH, -1, 3)[:, pts])
    np.testing.assert_allclose(cent_y, cent_x, atol=1e-8)

    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-8)


@pytest.mark.parametrize('axis,plane', [('z', 'xz'), ('x', 'xy'),
                                        ('y', 'yz')])
@pytest.mark.parametrize('axis_point_idx,plane_point_idx', [(0, 1), (2, 4)])
def test_oriented_flow(axis, plane, axis_point_idx, plane_point_idx):
    # Identity-initialized inner flow so the geometric constraints are
    # directly observable on the output.
    inner = MAF.create(jax.random.key(0), generate_degrees(N_DOFS - 3))
    flow = OrientedFlow.create(
        inner, n_features=N_DOFS, axis_point_idx=axis_point_idx,
        plane_point_idx=plane_point_idx, axis=axis, plane=plane,
        rotate_back=False)

    x = jax.random.normal(jax.random.key(2), (BATCH, N_DOFS), jnp.float64)
    y, ldj = flow.forward(x)
    y_atoms = np.asarray(y).reshape(BATCH, -1, 3)

    axis_dim = 'xyz'.index(axis)
    off_axis = [d for d in range(3) if d != axis_dim]
    # The axis point lies on the axis: other coordinates are zero.
    np.testing.assert_allclose(y_atoms[:, axis_point_idx][:, off_axis], 0.0,
                               atol=1e-8)
    # The plane point lies on the plane: its normal coordinate is zero.
    normal_dim = 'xyz'.index([c for c in 'xyz' if c not in plane][0])
    np.testing.assert_allclose(y_atoms[:, plane_point_idx][:, normal_dim],
                               0.0, atol=1e-8)
    # Rotations preserve distances from the origin.
    np.testing.assert_allclose(
        np.linalg.norm(y_atoms, axis=-1),
        np.linalg.norm(np.asarray(x).reshape(BATCH, -1, 3), axis=-1),
        atol=1e-6)


def test_oriented_flow_round_trip_and_jacobian():
    inner = make_inner(N_DOFS - 3)
    flow = OrientedFlow.create(inner, n_features=N_DOFS,
                               axis_point_idx=0, plane_point_idx=1,
                               axis='z', plane='xz', rotate_back=True)
    x = jax.random.normal(jax.random.key(3), (BATCH, N_DOFS), jnp.float64)
    y, ldj = flow.forward(x)
    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-8)

    # The full R^(3N) map's log-det must match the autograd oracle even
    # though the wrapped flow changes the radial frame DOFs — this requires
    # the frame volume-element terms the reference omits.
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-8)


def test_centroid_oriented_composition_jacobian():
    """Centroid(Oriented(MAF)) — the CartesianMAFMap wrapper stack."""
    inner = make_inner(N_DOFS - 6, key=11)
    oriented = OrientedFlow.create(inner, n_features=N_DOFS - 3,
                                   axis_point_idx=0, plane_point_idx=1,
                                   axis='z', plane='xz')
    flow = CenteredCentroidFlow.create(
        oriented, space_dimension=3, n_features=N_DOFS,
        subset_point_indices=[2])
    x = jax.random.normal(jax.random.key(12), (BATCH, N_DOFS), jnp.float64)
    y, ldj = flow.forward(x)
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-8)
    x_back, _ = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-7)


def test_pca_whitened_flow():
    n_features = 6
    rng = np.random.default_rng(0)
    # Correlated data for a non-trivial whitening matrix.
    a = rng.normal(size=(n_features, n_features))
    data = rng.normal(size=(500, n_features)) @ a

    inner = make_inner(n_features, key=7)
    flow = PCAWhitenedFlow.create(inner, data, blacken=True)

    x = jnp.asarray(data[:BATCH])
    y, ldj = flow.forward(x)
    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-7)

    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-6)

    # Without blackening, the whitening log-det enters the total.
    flow_nb = PCAWhitenedFlow.create(inner, data, blacken=False)
    y_nb, ldj_nb = flow_nb.forward(x)
    oracle_nb = batch_log_abs_det_J(lambda z: flow_nb.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj_nb), np.asarray(oracle_nb),
                               atol=1e-6)


# =============================================================================
# Error paths and option behaviors (cf. reference test_oriented.py error
# tests and test_centroid.py configuration tests)
# =============================================================================

def test_oriented_flow_error_paths():
    inner = make_inner(N_DOFS - 3)
    # Same atom for axis and plane.
    with pytest.raises(ValueError, match='different'):
        OrientedFlow.create(inner, n_features=N_DOFS,
                            axis_point_idx=1, plane_point_idx=1)
    # Axis not contained in the plane.
    with pytest.raises(ValueError, match='plane'):
        OrientedFlow.create(inner, n_features=N_DOFS, axis='z', plane='xy')
    # return_partial requires rotate_back=False.
    with pytest.raises(ValueError, match='rotate_back'):
        OrientedFlow.create(inner, n_features=N_DOFS, return_partial=True,
                            rotate_back=True)


def test_oriented_flow_automatic_reference_points():
    """Defaults pick atoms 0/1, avoiding whichever the caller pinned."""
    inner = make_inner(N_DOFS - 3)
    flow = OrientedFlow.create(inner, n_features=N_DOFS)
    assert {flow.axis_point_idx, flow.plane_point_idx} == {0, 1}

    flow = OrientedFlow.create(inner, n_features=N_DOFS, plane_point_idx=0)
    assert flow.axis_point_idx == 1 and flow.plane_point_idx == 0

    flow = OrientedFlow.create(inner, n_features=N_DOFS, axis_point_idx=0)
    assert flow.axis_point_idx == 0 and flow.plane_point_idx == 1


def test_oriented_flow_return_partial():
    """return_partial exposes only the propagated (unconstrained) DOFs."""
    inner = make_inner(N_DOFS - 3)
    flow = OrientedFlow.create(inner, n_features=N_DOFS,
                               rotate_back=False, return_partial=True)
    x = jax.random.normal(jax.random.key(9), (BATCH, N_DOFS), jnp.float64)
    out = flow.forward(x)
    y = out[0]
    assert y.shape == (BATCH, N_DOFS - 3)


def test_centered_centroid_error_paths():
    inner = make_inner(N_DOFS - 3)
    with pytest.raises(ValueError, match='translate_back'):
        CenteredCentroidFlow.create(inner, space_dimension=3,
                                    n_features=N_DOFS, return_partial=True,
                                    translate_back=True)
    with pytest.raises(ValueError, match='origin'):
        CenteredCentroidFlow.create(inner, space_dimension=3,
                                    n_features=N_DOFS, origin=[0.0, 1.0])
    with pytest.raises(ValueError, match='weights'):
        CenteredCentroidFlow.create(
            inner, space_dimension=3, n_features=N_DOFS,
            subset_point_indices=[0, 1, 2], weights=[1.0, 2.0])
    # Inverse requires translate_back=True.
    flow = CenteredCentroidFlow.create(inner, space_dimension=3,
                                       n_features=N_DOFS,
                                       translate_back=False)
    x = jax.random.normal(jax.random.key(10), (BATCH, N_DOFS), jnp.float64)
    y, _ = flow.forward(x)
    with pytest.raises(ValueError, match='translate_back'):
        flow.inverse(y)


def test_centered_centroid_custom_origin():
    """A custom origin places the (internal) centroid there; with
    translate_back the output centroid still matches the input's."""
    inner = make_inner(N_DOFS - 3)
    origin = [1.0, -2.0, 0.5]
    flow = CenteredCentroidFlow.create(inner, space_dimension=3,
                                       n_features=N_DOFS, origin=origin,
                                       translate_back=False)
    x = jax.random.normal(jax.random.key(11), (BATCH, N_DOFS), jnp.float64)
    y, _ = flow.forward(x)
    cent_y = np.asarray(y).reshape(BATCH, -1, 3).mean(axis=1)
    np.testing.assert_allclose(cent_y, np.tile(origin, (BATCH, 1)),
                               atol=1e-8)
