"""Wrapper-flow parity against the PyTorch reference.

PartialFlow / CenteredCentroidFlow / OrientedFlow / PCAWhitenedFlow wrap an
inner flow with coordinate bookkeeping (fixed DOFs, centroid removal,
reference-frame rotation, PCA whitening).  Each test wraps the SAME
copied-weight MAF on both sides and asserts the composed map agrees.
Reference: ``/root/reference/tfep/nn/flows/{partial,centroid,oriented,pca}.py``.

One intentional deviation is asserted exactly rather than skipped:
OrientedFlow's log-det here includes the frame volume element the reference
omits (tfep_tpu/nn/flows/oriented.py:189-205).
"""

import numpy as np
import pytest

import jax

from refbridge import copy_made_params, to_numpy, to_torch

from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.flows.centroid import CenteredCentroidFlow
from tfep_tpu.nn.flows.maf import MAF
from tfep_tpu.nn.flows.oriented import OrientedFlow
from tfep_tpu.nn.flows.partial import PartialFlow
from tfep_tpu.nn.flows.pca import PCAWhitenedFlow

ATOL = 1e-10


def _maf_pair(ref, n_features, seed=0):
    """Reference + this-repo MAF with identical (copied) weights."""
    import torch

    degrees = generate_degrees(n_features)
    ref_maf = ref.nn.flows.maf.MAF(degrees_in=degrees.tolist())
    gen = torch.Generator().manual_seed(100 + seed)
    with torch.no_grad():
        for p in ref_maf.parameters():
            p.add_(0.3 * torch.randn(p.shape, generator=gen, dtype=p.dtype))
    our_maf = MAF.create(jax.random.PRNGKey(seed), degrees_in=degrees)
    our_maf = our_maf.replace(
        conditioner=copy_made_params(ref_maf._conditioner,
                                     our_maf.conditioner))
    return ref_maf, our_maf


def _check(ref_flow, our_flow, x, atol=ATOL, inverse=True):
    import torch

    with torch.no_grad():
        ref_y, ref_ldj = ref_flow(to_torch(x))
    our_y, our_ldj = our_flow.forward(x)
    np.testing.assert_allclose(to_numpy(our_y), to_numpy(ref_y), atol=atol,
                               rtol=0, err_msg='forward y')
    np.testing.assert_allclose(to_numpy(our_ldj), to_numpy(ref_ldj),
                               atol=atol, rtol=0, err_msg='forward log_det')
    if inverse:
        with torch.no_grad():
            ref_x, ref_ldj_inv = ref_flow.inverse(ref_y)
        our_x, our_ldj_inv = our_flow.inverse(to_numpy(ref_y))
        np.testing.assert_allclose(to_numpy(our_x), to_numpy(ref_x),
                                   atol=atol, rtol=0, err_msg='inverse x')
        np.testing.assert_allclose(to_numpy(our_ldj_inv),
                                   to_numpy(ref_ldj_inv), atol=atol, rtol=0,
                                   err_msg='inverse log_det')


def test_partial_flow_parity(ref):
    n_features, n_fixed = 9, 3
    fixed = [1, 4, 7]
    ref_maf, our_maf = _maf_pair(ref, n_features - n_fixed)
    ref_flow = ref.nn.flows.partial.PartialFlow(ref_maf,
                                                fixed_indices=fixed)
    our_flow = PartialFlow.create(our_maf, fixed_indices=fixed,
                                  n_features=n_features)
    x = np.random.default_rng(1).standard_normal((5, n_features))
    _check(ref_flow, our_flow, x)


def test_centered_centroid_flow_parity(ref):
    n_points, dim = 4, 3
    n_features = n_points * dim
    ref_maf, our_maf = _maf_pair(ref, n_features - dim)
    ref_flow = ref.nn.flows.centroid.CenteredCentroidFlow(
        ref_maf, space_dimension=dim, fixed_point_idx=1)
    our_flow = CenteredCentroidFlow.create(
        our_maf, space_dimension=dim, n_features=n_features,
        fixed_point_idx=1)
    x = np.random.default_rng(2).standard_normal((5, n_features))
    _check(ref_flow, our_flow, x)


def test_centered_centroid_flow_weights_subset_parity(ref):
    n_points, dim = 5, 3
    n_features = n_points * dim
    subset = [0, 2, 3]
    weights = [1.0, 2.0, 3.0]
    ref_maf, our_maf = _maf_pair(ref, n_features - dim)
    ref_flow = ref.nn.flows.centroid.CenteredCentroidFlow(
        ref_maf, space_dimension=dim, subset_point_indices=subset,
        weights=to_torch(weights), fixed_point_idx=0)
    our_flow = CenteredCentroidFlow.create(
        our_maf, space_dimension=dim, n_features=n_features,
        subset_point_indices=subset, weights=weights, fixed_point_idx=0)
    x = np.random.default_rng(3).standard_normal((5, n_features))
    _check(ref_flow, our_flow, x)


def test_oriented_flow_parity(ref):
    """y agrees exactly; the log-det differs by EXACTLY the frame volume
    element this repo adds and the reference omits (documented deviation,
    oriented.py:189-205): our_ldj = ref_ldj - w(x_rot) + w(y_rot) with
    w = 2·log|axis coord| + log|in-plane coord|."""
    import torch

    n_atoms = 4
    n_features = 3 * n_atoms
    axis_point, plane_point = 1, 2
    ref_maf, our_maf = _maf_pair(ref, n_features - 3)

    ref_flow = ref.nn.flows.oriented.OrientedFlow(
        ref_maf, axis_point_idx=axis_point, plane_point_idx=plane_point)
    our_flow = OrientedFlow.create(
        our_maf, n_features=n_features, axis_point_idx=axis_point,
        plane_point_idx=plane_point)

    x = np.random.default_rng(4).standard_normal((6, n_atoms, 3)) + 1.0
    x = x.reshape(6, -1)

    with torch.no_grad():
        ref_y, ref_ldj = ref_flow(to_torch(x))
    our_y, our_ldj = our_flow.forward(x)
    np.testing.assert_allclose(to_numpy(our_y), to_numpy(ref_y), atol=ATOL,
                               rtol=0, err_msg='forward y')

    # Reconstruct the frame weights from the rotated coordinates: the
    # rotated input/output can be read off the flows' intermediate frames
    # by re-rotating y and x into the reference frame (x's frame).
    from tfep_tpu.utils.geometry import (
        batchwise_rotate, reference_frame_rotation_matrix)

    x_atoms = np.asarray(x).reshape(6, n_atoms, 3)
    rot = reference_frame_rotation_matrix(
        axis_atom_positions=x_atoms[:, axis_point],
        plane_atom_positions=x_atoms[:, plane_point],
        axis=np.array([1.0, 0, 0]), plane_axis=np.array([0, 1.0, 0]),
        plane_normal=np.array([0, 0, 1.0]),
        project_on_positive_axis=False)
    x_rot = to_numpy(batchwise_rotate(x_atoms, rot)).reshape(6, -1)
    y_rot = to_numpy(batchwise_rotate(
        to_numpy(our_y).reshape(6, n_atoms, 3), rot)).reshape(6, -1)

    def frame_w(flat):
        a = flat[:, 3 * axis_point + 0]
        p = flat[:, 3 * plane_point + 1]
        return 2 * np.log(np.abs(a)) + np.log(np.abs(p))

    expected = to_numpy(ref_ldj) - frame_w(x_rot) + frame_w(y_rot)
    np.testing.assert_allclose(to_numpy(our_ldj), expected, atol=1e-8,
                               err_msg='log-det deviation is not exactly '
                                       'the frame volume element')


def test_oriented_flow_identity_wrapped_matches_reference(ref):
    """With an identity-initialized wrapped flow the frame weights cancel
    and the two implementations agree bit-for-bit (both log-dets zero)."""
    import torch

    n_atoms = 4
    n_features = 3 * n_atoms
    degrees = generate_degrees(n_features - 3)
    ref_maf = ref.nn.flows.maf.MAF(degrees_in=degrees.tolist())
    our_maf = MAF.create(jax.random.PRNGKey(0), degrees_in=degrees)

    ref_flow = ref.nn.flows.oriented.OrientedFlow(
        ref_maf, axis_point_idx=1, plane_point_idx=2)
    our_flow = OrientedFlow.create(
        our_maf, n_features=n_features, axis_point_idx=1, plane_point_idx=2)

    x = np.random.default_rng(5).standard_normal((6, n_features)) + 0.5
    with torch.no_grad():
        ref_y, ref_ldj = ref_flow(to_torch(x))
    our_y, our_ldj = our_flow.forward(x)
    np.testing.assert_allclose(to_numpy(our_y), to_numpy(ref_y), atol=ATOL)
    np.testing.assert_allclose(to_numpy(our_ldj), to_numpy(ref_ldj),
                               atol=ATOL)
    np.testing.assert_allclose(to_numpy(our_ldj), 0.0, atol=ATOL)


@pytest.mark.parametrize('blacken', [True, False])
def test_pca_whitened_flow_parity(ref, blacken):
    n_features = 6
    rng = np.random.default_rng(6)
    # Anisotropic correlated sample for a non-trivial PCA.
    base = rng.standard_normal((64, n_features))
    mix = rng.standard_normal((n_features, n_features)) * 0.5 \
        + np.eye(n_features)
    sample = base @ mix + rng.normal(0, 0.1, size=n_features)

    ref_maf, our_maf = _maf_pair(ref, n_features)
    ref_flow = ref.nn.flows.pca.PCAWhitenedFlow(
        ref_maf, x=to_torch(sample), blacken=blacken)
    our_flow = PCAWhitenedFlow.create(our_maf, x=sample, blacken=blacken)

    x = rng.standard_normal((5, n_features))
    _check(ref_flow, our_flow, x, atol=1e-8)
