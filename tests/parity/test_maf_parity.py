"""End-to-end MAF parity against the PyTorch reference.

Builds the same flow on both sides (identical degrees, transformer,
hidden-layer spec, embedding), copies the reference's trained-state weights
into this repo's modules, and asserts that forward, inverse, and
log-det-Jacobian agree in float64 — including through a two-layer
ascending/descending SequentialFlow and a per-sample TFEP work-value
computation on a shared analytic potential.  Reference:
``/root/reference/tfep/nn/flows/{maf,autoregressive,sequential}.py``.
"""

import numpy as np
import pytest

import jax

from refbridge import copy_made_params, to_numpy, to_torch

from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.embeddings.mafembed import PeriodicEmbedding
from tfep_tpu.nn.flows.maf import MAF
from tfep_tpu.nn.flows.sequential import SequentialFlow
from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer

ATOL = 1e-10


def _copy_maf(ref_maf, our_maf):
    """Copy the reference MAF's conditioner weights into ours (exact)."""
    copied = copy_made_params(ref_maf._conditioner, our_maf.conditioner)
    return our_maf.replace(conditioner=copied)


def _perturb_ref_weights(ref_maf, seed):
    """Randomize the reference's weights away from the identity init.

    Identity-initialized flows agree trivially; parity must hold at an
    arbitrary point in weight space (as after training).
    """
    import torch
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref_maf.parameters():
            p.add_(0.3 * torch.randn(p.shape, generator=gen,
                                     dtype=p.dtype))


def _build_pair(ref, degrees_in, seed=0, transformer=None, ref_transformer=None,
                embedding=None, ref_embedding=None, weight_norm=True,
                initialize_identity=True, hidden_layers=2):
    ref_maf = ref.nn.flows.maf.MAF(
        degrees_in=np.asarray(degrees_in).tolist(),
        transformer=ref_transformer,
        hidden_layers=hidden_layers, embedding=ref_embedding,
        weight_norm=weight_norm, initialize_identity=initialize_identity)
    our_maf = MAF.create(
        jax.random.PRNGKey(seed), degrees_in=np.asarray(degrees_in),
        transformer=transformer, hidden_layers=hidden_layers,
        embedding=embedding, weight_norm=weight_norm,
        initialize_identity=initialize_identity)
    return ref_maf, our_maf


def _check_flow(ref_flow, our_flow, x, atol=ATOL):
    import torch
    with torch.no_grad():
        ref_y, ref_ldj = ref_flow(to_torch(x))
    our_y, our_ldj = our_flow.forward(x)
    np.testing.assert_allclose(to_numpy(our_y), to_numpy(ref_y), atol=atol,
                               rtol=0, err_msg='forward y')
    np.testing.assert_allclose(to_numpy(our_ldj), to_numpy(ref_ldj),
                               atol=atol, rtol=0, err_msg='forward log_det')

    with torch.no_grad():
        ref_x, ref_ldj_inv = ref_flow.inverse(ref_y)
    our_x, our_ldj_inv = our_flow.inverse(to_numpy(ref_y))
    np.testing.assert_allclose(to_numpy(our_x), to_numpy(ref_x), atol=atol,
                               rtol=0, err_msg='inverse x')
    np.testing.assert_allclose(to_numpy(our_ldj_inv), to_numpy(ref_ldj_inv),
                               atol=atol, rtol=0, err_msg='inverse log_det')


def test_maf_identity_init_parity(ref):
    """Identity-initialized MAFs are the identity on both sides."""
    degrees_in = generate_degrees(6)
    ref_maf, our_maf = _build_pair(ref, degrees_in)
    our_maf = _copy_maf(ref_maf, our_maf)
    x = np.random.default_rng(0).standard_normal((4, 6))
    _check_flow(ref_maf, our_maf, x)
    our_y, our_ldj = our_maf.forward(x)
    np.testing.assert_allclose(to_numpy(our_y), x, atol=1e-12)
    np.testing.assert_allclose(to_numpy(our_ldj), 0.0, atol=1e-12)


MAF_CASES = [
    dict(),                                             # affine, ascending
    dict(order='descending'),
    dict(weight_norm=False),
    dict(conditioning=True),                            # -1 degrees
    dict(hidden_layers=[13, 9]),
    dict(repeats=2),                                    # coupling-ish blocks
]


@pytest.mark.parametrize('case', MAF_CASES)
def test_maf_affine_parity(ref, case):
    """Affine MAF with randomized weights: y, log-det, inverse all match."""
    case = dict(case)
    conditioning = case.pop('conditioning', False)
    order = case.pop('order', 'ascending')
    repeats = case.pop('repeats', 1)
    n_features = 6
    kwargs = dict(order=order, repeats=repeats)
    if conditioning:
        kwargs['conditioning_indices'] = [0, 3]
    degrees_in = generate_degrees(n_features, **kwargs)

    ref_maf, our_maf = _build_pair(ref, degrees_in, **case)
    _perturb_ref_weights(ref_maf, seed=11)
    our_maf = _copy_maf(ref_maf, our_maf)

    x = np.random.default_rng(1).standard_normal((5, n_features))
    _check_flow(ref_maf, our_maf, x)


def test_maf_spline_parity(ref):
    """Neural-spline MAF (the flagship config) with randomized weights."""
    n_features = 6
    degrees_in = generate_degrees(n_features)
    x0 = np.full(n_features, -2.0)
    xf = np.full(n_features, 2.0)
    ref_tr = ref.nn.transformers.spline.NeuralSplineTransformer(
        x0=to_torch(x0), xf=to_torch(xf), n_bins=4)
    our_tr = NeuralSplineTransformer.create(x0=x0, xf=xf, n_bins=4)

    ref_maf, our_maf = _build_pair(ref, degrees_in, transformer=our_tr,
                                   ref_transformer=ref_tr)
    _perturb_ref_weights(ref_maf, seed=13)
    our_maf = _copy_maf(ref_maf, our_maf)

    rng = np.random.default_rng(2)
    x = rng.uniform(-1.8, 1.8, size=(5, n_features))
    _check_flow(ref_maf, our_maf, x)


def test_maf_periodic_embedding_circular_spline_parity(ref):
    """Periodic embedding + circular spline: the torsion pathway of the
    mixed map (mafembed.py:65-172 + spline circular handling)."""
    n_features = 4
    limits = (-np.pi, np.pi)
    degrees_in = generate_degrees(n_features)

    ref_embed = ref.nn.embeddings.mafembed.PeriodicEmbedding(
        n_features_in=n_features, limits=list(limits))
    our_embed = PeriodicEmbedding.create(
        n_features_in=n_features, limits=limits)

    x0 = np.full(n_features, limits[0])
    xf = np.full(n_features, limits[1])
    ref_tr = ref.nn.transformers.spline.NeuralSplineTransformer(
        x0=to_torch(x0), xf=to_torch(xf), n_bins=4, circular=True)
    our_tr = NeuralSplineTransformer.create(x0=x0, xf=xf, n_bins=4,
                                            circular=True)

    ref_maf, our_maf = _build_pair(
        ref, degrees_in, transformer=our_tr, ref_transformer=ref_tr,
        embedding=our_embed, ref_embedding=ref_embed)
    _perturb_ref_weights(ref_maf, seed=17)
    our_maf = _copy_maf(ref_maf, our_maf)

    rng = np.random.default_rng(3)
    x = rng.uniform(limits[0], limits[1], size=(5, n_features))
    _check_flow(ref_maf, our_maf, x)


def test_sequential_flow_parity(ref):
    """Two-layer ascending/descending stack — the standard MAF recipe
    (sequential.py:24-87) — composes identically."""
    import torch

    n_features = 5
    deg_up = generate_degrees(n_features, order='ascending')
    deg_dn = generate_degrees(n_features, order='descending')

    ref_maf1, our_maf1 = _build_pair(ref, deg_up, seed=0)
    ref_maf2, our_maf2 = _build_pair(ref, deg_dn, seed=1)
    _perturb_ref_weights(ref_maf1, seed=19)
    _perturb_ref_weights(ref_maf2, seed=23)
    our_maf1 = _copy_maf(ref_maf1, our_maf1)
    our_maf2 = _copy_maf(ref_maf2, our_maf2)

    ref_flow = ref.nn.flows.sequential.SequentialFlow(ref_maf1, ref_maf2)
    our_flow = SequentialFlow.create(our_maf1, our_maf2)

    assert ref_flow.n_parameters() > 0
    x = np.random.default_rng(4).standard_normal((5, n_features))
    _check_flow(ref_flow, our_flow, x)


def test_tfep_work_value_parity(ref):
    """Per-sample TFEP work values agree on a shared batch and potential.

    This is BASELINE.md's bar stated directly: with the same flow weights,
    the generalized work ``w = U(y) - U(x) - kT·log|det J|`` (loss.py of
    both frameworks) matches per sample, so every downstream Δf estimate
    (a function of the work values alone) matches too.
    """
    import torch

    n_features = 6
    kT = 2.494  # kJ/mol at ~300 K
    degrees_in = generate_degrees(n_features)
    ref_maf, our_maf = _build_pair(ref, degrees_in)
    _perturb_ref_weights(ref_maf, seed=29)
    our_maf = _copy_maf(ref_maf, our_maf)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((8, n_features))

    # Shared analytic potential: anisotropic harmonic U = sum(k_i x_i^2).
    k_spring = rng.uniform(0.5, 2.0, size=n_features)

    with torch.no_grad():
        ref_y, ref_ldj = ref_maf(to_torch(x))
    ref_y = to_numpy(ref_y)
    ref_work = ((k_spring * ref_y**2).sum(1) - (k_spring * x**2).sum(1)
                - kT * to_numpy(ref_ldj))

    our_y, our_ldj = our_maf.forward(x)
    our_y = to_numpy(our_y)
    our_work = ((k_spring * our_y**2).sum(1) - (k_spring * x**2).sum(1)
                - kT * to_numpy(our_ldj))

    np.testing.assert_allclose(our_work, ref_work, atol=1e-9)
