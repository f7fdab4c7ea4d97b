"""Fused EGNN pairwise kernel vs the XLA formulation (interpret mode).

Checks (on the CPU interpreter — the kernel itself is verified
numerically; TPU lowering is exercised by the bench):
1. Forward outputs match a pure-JAX mirror of the layer's pairwise chain.
2. Hand-derived backward matches autodiff of the mirror for every input,
   including the radial expansion's trainable widths.
3. The mirror itself matches the real ``_EGLayer`` computation, guarding
   against semantic drift between the layer and the kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfep_tpu.ops.pallas.egnn as egnn_kernel
from tfep_tpu.ops.pallas.egnn import fused_egnn_pairwise

N, FEAT, DFEAT = 6, 8, 10
BATCH = 4
R_CUTOFF = 6.0


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(egnn_kernel, 'INTERPRET', True)


def _params(key):
    keys = jax.random.split(key, 12)
    sc = 0.5
    return dict(
        mu=jnp.linspace(0.0, R_CUTOFF, DFEAT),
        log_gammas=0.1 * jax.random.normal(keys[0], (DFEAT,)),
        w_e=sc * jax.random.normal(keys[1], (FEAT, DFEAT)),
        b1=sc * jax.random.normal(keys[2], (FEAT,)),
        w_m2=sc * jax.random.normal(keys[3], (FEAT, FEAT)),
        b_m2=sc * jax.random.normal(keys[4], (FEAT,)),
        w_att=sc * jax.random.normal(keys[5], (FEAT,)),
        b_att=sc * jax.random.normal(keys[6], (1,)),
        w_x1=sc * jax.random.normal(keys[7], (FEAT, FEAT)),
        b_x1=sc * jax.random.normal(keys[8], (FEAT,)),
        w_x2=sc * jax.random.normal(keys[9], (FEAT,)),
    )


def _inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    a_i = jax.random.normal(k1, (BATCH, N, FEAT))
    a_j = jax.random.normal(k2, (BATCH, N, FEAT))
    pos = 2.0 * jax.random.normal(k3, (BATCH, N, 3))
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    eye = jnp.eye(N, dtype=bool)[None]
    dist = jnp.sqrt(jnp.where(eye, 1.0, jnp.sum(diff ** 2, -1)) + 1e-20)
    return a_i, a_j, dist


def _silu(x):
    return x * jax.nn.sigmoid(x)


def reference(a_i, a_j, dist, p):
    """Pure-JAX mirror of the fused op's contract."""
    eye = jnp.eye(N, dtype=bool)[None]
    mask = ((~eye) & (dist <= R_CUTOFF)).astype(a_i.dtype)[..., None]

    gammas = jnp.exp(p['log_gammas'])
    gauss = jnp.exp(-gammas * (dist[..., None] - p['mu']) ** 2)
    sw = 0.5 * jnp.cos(jnp.pi / R_CUTOFF * dist) + 0.5
    sw = jnp.where(dist > R_CUTOFF, 0.0, sw)
    emb = gauss * sw[..., None]

    pre = (a_i[:, :, None, :] + a_j[:, None, :, :]
           + emb @ p['w_e'].T + p['b1'])
    m_s = _silu(_silu(pre) @ p['w_m2'].T + p['b_m2'])
    att = jax.nn.sigmoid(jnp.sum(m_s * p['w_att'], -1, keepdims=True)
                         + p['b_att'])
    messages = m_s * att * mask
    node_msg = jnp.sum(messages, axis=2)
    x1 = _silu(messages @ p['w_x1'].T + p['b_x1'])
    mag = jnp.tanh(jnp.sum(x1 * p['w_x2'], -1)) * mask[..., 0]
    return node_msg, mag


def _fused(a_i, a_j, dist, p):
    return fused_egnn_pairwise(
        a_i, a_j, dist, p['mu'], p['log_gammas'], p['w_e'], p['b1'],
        p['w_m2'], p['b_m2'], p['w_att'], p['b_att'], p['w_x1'],
        p['b_x1'], p['w_x2'], N, FEAT, R_CUTOFF, 2)


def test_forward_matches_reference():
    p = _params(jax.random.key(0))
    a_i, a_j, dist = _inputs(jax.random.key(1))
    nm_f, mag_f = _fused(a_i, a_j, dist, p)
    nm_r, mag_r = reference(a_i, a_j, dist, p)
    np.testing.assert_allclose(nm_f, nm_r, rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(mag_f, mag_r, rtol=1e-6, atol=1e-10)


def test_jvp_matches_autodiff():
    """Forward-mode (the Hutchinson-probe pattern) matches the mirror."""
    p = _params(jax.random.key(2))
    a_i, a_j, dist = _inputs(jax.random.key(3))
    t_i = jax.random.normal(jax.random.key(20), a_i.shape)
    t_d = jax.random.normal(jax.random.key(21), dist.shape)
    zeros_p = jax.tree_util.tree_map(jnp.zeros_like, p)

    out_f, tan_f = jax.jvp(_fused, (a_i, a_j, dist, p),
                           (t_i, jnp.zeros_like(a_j), t_d, zeros_p))
    out_r, tan_r = jax.jvp(reference, (a_i, a_j, dist, p),
                           (t_i, jnp.zeros_like(a_j), t_d, zeros_p))
    for f, r in zip((*out_f, *tan_f), (*out_r, *tan_r)):
        np.testing.assert_allclose(f, r, rtol=1e-5, atol=1e-8)


def test_grad_of_jvp_matches_autodiff():
    """Reverse over an explicit jvp — the CNF training pattern — matches
    autodiff of the mirror for every input (incl. the radial widths)."""
    p = _params(jax.random.key(2))
    a_i, a_j, dist = _inputs(jax.random.key(3))
    c1 = jax.random.normal(jax.random.key(4), (BATCH, N, FEAT))
    c2 = jax.random.normal(jax.random.key(5), (BATCH, N, N))
    e_i = jax.random.normal(jax.random.key(22), a_i.shape)
    e_d = jax.random.normal(jax.random.key(23), dist.shape)

    def scalar(fn):
        def wrapped(a_i, a_j, dist, p):
            zeros_p = jax.tree_util.tree_map(jnp.zeros_like, p)
            (nm, mag), (dnm, dmag) = jax.jvp(
                fn, (a_i, a_j, dist, p),
                (e_i, jnp.zeros_like(a_j), e_d, zeros_p))
            # Loss touches primal outputs AND the probe (like the trace).
            return (jnp.sum(nm * c1) + jnp.sum(mag * c2)
                    + jnp.sum(dnm * c1) + jnp.sum(dmag * c2))
        return wrapped

    args = (a_i, a_j, dist, p)
    grads_f = jax.grad(scalar(_fused), argnums=(0, 1, 2, 3))(*args)
    grads_r = jax.grad(scalar(reference), argnums=(0, 1, 2, 3))(*args)

    for g_f, g_r, name in zip(grads_f[:3], grads_r[:3],
                              ('a_i', 'a_j', 'dist')):
        np.testing.assert_allclose(g_f, g_r, rtol=1e-5, atol=1e-8,
                                   err_msg=name)
    for name in grads_r[3]:
        np.testing.assert_allclose(grads_f[3][name], grads_r[3][name],
                                   rtol=1e-5, atol=1e-8, err_msg=name)


def test_dynamics_pallas_matches_xla():
    """Whole EGNNDynamics: pairwise='pallas' == 'xla' for the primal and
    a forward-mode probe (the CNF's access pattern)."""
    from tfep_tpu.nn.dynamics import EGNNDynamics

    node_types = np.arange(N) % 3
    nets = {
        mode: EGNNDynamics.create(
            jax.random.key(9), node_types=node_types, r_cutoff=R_CUTOFF,
            time_feat_dim=4, node_feat_dim=FEAT, distance_feat_dim=DFEAT,
            n_layers=2, initialize_identity=False, pairwise=mode)
        for mode in ('xla', 'pallas')
    }
    x = 2.0 * jax.random.normal(jax.random.key(10), (BATCH, N * 3))
    probe = jax.random.normal(jax.random.key(11), (BATCH, N * 3))

    outs, jvs = {}, {}
    for mode, net in nets.items():
        outs[mode], jvs[mode] = jax.jvp(
            lambda z: net(0.3, z), (x,), (probe,))

    np.testing.assert_allclose(outs['pallas'], outs['xla'],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(jvs['pallas'], jvs['xla'],
                               rtol=1e-5, atol=1e-8)


def test_cnf_training_grads_pallas_matches_xla():
    """Full CNF training loss + grads through the fused kernel.

    The KL training loss differentiates through the vjp-based Hutchinson
    trace, which exercises the second-order rule (the in-kernel-autodiff
    VJP of the backward kernel)."""
    from tfep_tpu.nn.dynamics import EGNNDynamics
    from tfep_tpu.nn.flows import ContinuousFlow
    from tfep_tpu.nn.module import filter_value_and_grad

    node_types = np.arange(N) % 3
    x = 1.5 * jax.random.normal(jax.random.key(12), (BATCH, N * 3))

    results = {}
    for mode in ('xla', 'pallas'):
        dynamics = EGNNDynamics.create(
            jax.random.key(13), node_types=node_types, r_cutoff=R_CUTOFF,
            time_feat_dim=4, node_feat_dim=FEAT, distance_feat_dim=DFEAT,
            n_layers=2, initialize_identity=False, pairwise=mode)
        flow = ContinuousFlow.create(dynamics, trace_estimator='hutchinson',
                                     solver='midpoint', n_steps=2,
                                     regularization=True, checkpoint=False)

        def loss_fn(f):
            y, ldj, reg = f.forward(x)
            return (jnp.mean(0.5 * jnp.sum(y ** 2, -1) - ldj)
                    + 0.01 * jnp.mean(reg))

        loss, grads = filter_value_and_grad(loss_fn)(flow)
        results[mode] = (loss, jax.tree_util.tree_leaves(grads))

    np.testing.assert_allclose(results['pallas'][0], results['xla'][0],
                               rtol=1e-6)
    for g_p, g_x in zip(results['pallas'][1], results['xla'][1]):
        np.testing.assert_allclose(g_p, g_x, rtol=2e-5, atol=1e-8)


def test_non_dividing_batch():
    """Odd batch sizes: tiles must divide the batch or padded garbage
    rows would pollute the grid-accumulated weight gradients."""
    p = _params(jax.random.key(30))
    a_i, a_j, dist = _inputs(jax.random.key(31))
    a_i, a_j, dist = a_i[:3], a_j[:3], dist[:3]     # batch 3, block_b 2
    e_i = jax.random.normal(jax.random.key(32), a_i.shape)

    def trace_like(fn):
        def wrapped(p):
            zp = jax.tree_util.tree_map(jnp.zeros_like, p)
            (nm, mag), (dnm, dmag) = jax.jvp(
                lambda q: fn(a_i, a_j, dist, q), (p,), (zp,))
            _, (dnm2, _) = jax.jvp(
                lambda x: fn(x, a_j, dist, p), (a_i,), (e_i,))
            return jnp.sum(nm ** 2) + jnp.sum(mag) + jnp.sum(dnm2 ** 2)
        return wrapped

    val_f, grads_f = jax.value_and_grad(trace_like(_fused))(p)
    val_r, grads_r = jax.value_and_grad(trace_like(reference))(p)
    np.testing.assert_allclose(val_f, val_r, rtol=1e-6)
    for name in grads_r:
        np.testing.assert_allclose(grads_f[name], grads_r[name],
                                   rtol=1e-5, atol=1e-8, err_msg=name)


def test_unsupported_combinations_raise():
    """pallas mode rejects options it would otherwise silently ignore or
    crash on deep inside a scan."""
    from tfep_tpu.nn.dynamics import EGNNDynamics
    from tfep_tpu.nn.flows import ContinuousFlow

    with pytest.raises(ValueError, match='compute_dtype'):
        EGNNDynamics.create(jax.random.key(0), node_types=[0, 1],
                            r_cutoff=R_CUTOFF, pairwise='pallas',
                            compute_dtype='bfloat16')

    dynamics = EGNNDynamics.create(jax.random.key(0), node_types=[0, 1],
                                   r_cutoff=R_CUTOFF, pairwise='pallas')
    with pytest.raises(ValueError, match='pallas'):
        ContinuousFlow.create(dynamics, trace_estimator='exact')
    with pytest.raises(ValueError, match='pallas'):
        ContinuousFlow.create(dynamics, n_hutchinson_samples=4)
    ContinuousFlow.create(dynamics)  # the supported configuration


def test_mirror_matches_real_layer():
    """The test mirror (and hence the kernel) computes exactly the
    _EGLayer quantities it replaces."""
    from tfep_tpu.nn.dynamics.egnn import _EGLayer

    layer = _EGLayer.create(jax.random.key(6), r_cutoff=R_CUTOFF,
                            node_feat_dim=FEAT, distance_feat_dim=DFEAT,
                            speed_factor=1.0, initialize_identity=False)
    h = jax.random.normal(jax.random.key(7), (BATCH, N, FEAT))
    pos = 2.0 * jax.random.normal(jax.random.key(8), (BATCH, N, 3))

    # The layer's own forward.
    h_out, pos_out = layer(h, pos)

    # Rebuild via the mirror + the cheap XLA pieces. Block order: sender
    # first (the reference convention, egnn.py _EGLayer.__call__).
    first = layer.message_mlp.layers[0]
    w = first.effective_weight()
    w_j, w_i, w_e = w[:, :FEAT], w[:, FEAT:2 * FEAT], w[:, 2 * FEAT:]
    p = dict(
        mu=layer.distance_embedding.means,
        log_gammas=layer.distance_embedding.log_gammas,
        w_e=w_e, b1=first.bias,
        w_m2=layer.message_mlp.layers[1].effective_weight(),
        b_m2=layer.message_mlp.layers[1].bias,
        w_att=layer.attention_mlp.layers[0].effective_weight()[0],
        b_att=layer.attention_mlp.layers[0].bias,
        w_x1=layer.update_x_mlp.layers[0].effective_weight(),
        b_x1=layer.update_x_mlp.layers[0].bias,
        w_x2=layer.update_x_mlp.layers[1].effective_weight()[0],
    )
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    eye = jnp.eye(N, dtype=bool)[None]
    dist = jnp.sqrt(jnp.where(eye, 1.0, jnp.sum(diff ** 2, -1)) + 1e-20)
    directions = diff / dist[..., None]

    node_msg, mag = reference(h @ w_i.T, h @ w_j.T, dist, p)
    h_expected = h + layer.update_h_mlp(
        jnp.concatenate([h, node_msg], axis=-1))
    pos_expected = pos + jnp.sum(
        layer.speed_factor * directions * mag[..., None], axis=2)

    np.testing.assert_allclose(h_out, h_expected, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(pos_out, pos_expected, rtol=1e-6, atol=1e-9)
