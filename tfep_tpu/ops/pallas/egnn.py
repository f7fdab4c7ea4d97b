"""Pallas TPU kernel: fused EGNN pairwise message block (fwd + backward).

The EGNN layer's per-pair chain — Behler-Parrinello radial expansion,
factored message-MLP, sigmoid attention, cutoff masking, the j-sum into
node messages, and the displacement-magnitude MLP — produces several
``(batch, n, n, feat)`` tensors that XLA materializes in HBM because the
masked messages feed three consumers (attention, the node aggregation, and
the displacement MLP). At CNF training sizes that traffic dominates the
step (tfep_tpu/nn/dynamics/egnn.py measured HBM-bound; factoring one
materialization away was already a 2.5x win). This kernel keeps every
per-pair tensor in VMEM for one batch tile: HBM I/O reduces to the
``(batch, n, feat)`` inputs/outputs plus the small ``(batch, n, n)``
distance/magnitude planes.

Differentiation architecture: ``jax.custom_vjp`` is first-order only, but
the CNF needs the Hutchinson-probe pattern (``jax.jvp`` through the
dynamics, then one reverse pass for training). The op is therefore a
``jax.custom_jvp`` whose rule expands every probe into two *first-order*
``custom_vjp`` kernel ops — a fused (primal, tangent) JVP kernel and its
VJP kernel — each derived by applying ``jax.jvp``/``jax.vjp`` to the pure
forward chain *inside* the kernel body (in-kernel autodiff traces to the
same elementwise + matmul ops Mosaic compiles anyway). Weight gradients
accumulate across the batch-tile grid, so tiles must divide the batch
(``_dividing_tile``). Mosaic rejects lane-changing reshapes, hence the
layout rule documented on ``_forward_chain``. Semantics match
``_EGLayer.__call__``'s XLA formulation exactly (values and training
gradients verified against autodiff in tests/ops/test_pallas_egnn.py).

Inputs are the *factored* per-node message-MLP terms ``a_i = h W_i^T`` and
``a_j = h W_j^T`` (computed in XLA — they are cheap per-node matmuls), the
safe pairwise distances, and the layer's weights. Outputs: aggregated node
messages ``(batch, n, feat)`` and masked displacement magnitudes
``(batch, n, n)``; the 3-vector work (directions, position update) stays
in XLA where it is cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_egnn_pairwise']

DEFAULT_BLOCK_B = 16

#: Set True (e.g. in tests) to run the kernels in interpreter mode.
INTERPRET = False


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _radial(dist, mu, log_gammas, r_cutoff):
    """BP radial expansion pieces for (P, 1) distances.

    Returns (emb, gauss, sw) with emb = gauss * sw, shapes (P, D) and
    (P, 1) for sw. Matches BehlerParrinelloRadialExpansion with
    force_zero_after_cutoff=True.
    """
    gammas = jnp.exp(log_gammas)
    disp = dist - mu                       # (P, D)
    gauss = jnp.exp(-gammas * disp * disp)
    sw = 0.5 * jnp.cos(jnp.pi / r_cutoff * dist) + 0.5
    sw = jnp.where(dist > r_cutoff, 0.0, sw)
    return gauss * sw, gauss, sw


def _forward_chain(a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2, b_m2,
                   w_att, b_att, w_x1, b_x1, w_x2, *, n, feat, r_cutoff):
    """Shared traceable forward; returns every intermediate the backward
    chain needs.

    Mosaic layout rule: the lane (last) dim is never changed by a
    reshape — pair scalars arrive as ``(B_t, N*N, 1)`` and the factored
    node terms pre-expanded as ``(B_t, N, 1, F)`` / ``(B_t, 1, N, F)``,
    so every in-kernel reshape only folds leading dims and every
    broadcast expands a size-1 dim.
    """
    b_t = a_i.shape[0]
    p = b_t * n * n

    dist2d = dist.reshape(p, 1)                           # lane stays 1
    pair = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    off_diag = (pair // n) % n != pair % n
    mask = (off_diag & (dist2d <= r_cutoff)).astype(a_i.dtype)

    emb, gauss, sw = _radial(dist2d, mu, log_gammas, r_cutoff)

    # pre[b,i,j,:] = a_i[b,i,:] + a_j[b,j,:] + emb @ W_e^T + b1
    pre4 = (jnp.broadcast_to(a_i, (b_t, n, n, feat))
            + jnp.broadcast_to(a_j, (b_t, n, n, feat)))
    pre = pre4.reshape(p, feat) + jnp.dot(
        emb, w_e.T, preferred_element_type=a_i.dtype) + b1
    s_pre = _silu(pre)
    m1 = jnp.dot(s_pre, w_m2.T, preferred_element_type=a_i.dtype) + b_m2
    m_s = _silu(m1)
    att = jax.nn.sigmoid(jnp.sum(m_s * w_att, axis=-1, keepdims=True)
                         + b_att)
    messages = m_s * att * mask                            # (P, F)
    x1 = _silu(jnp.dot(messages, w_x1.T,
                       preferred_element_type=a_i.dtype) + b_x1)
    t2 = jnp.tanh(jnp.sum(x1 * w_x2, axis=-1, keepdims=True))
    return (mask, dist2d, emb, gauss, sw, pre, s_pre, m1, m_s, att,
            messages, x1, t2)


def _forward_kernel(a_i_ref, a_j_ref, dist_ref, mu_ref, lg_ref, w_e_ref,
                    b1_ref, w_m2_ref, b_m2_ref, w_att_ref, b_att_ref,
                    w_x1_ref, b_x1_ref, w_x2_ref,
                    node_msg_out, mag_out, *, n, feat, r_cutoff):
    b_t = a_i_ref.shape[0]
    (mask, _, _, _, _, _, _, _, _, _, messages, _, t2) = _forward_chain(
        a_i_ref[:], a_j_ref[:], dist_ref[:],
        mu_ref[0], lg_ref[0], w_e_ref[:], b1_ref[0], w_m2_ref[:],
        b_m2_ref[0], w_att_ref[0], b_att_ref[0, 0], w_x1_ref[:],
        b_x1_ref[0], w_x2_ref[0], n=n, feat=feat, r_cutoff=r_cutoff)

    node_msg_out[:] = jnp.sum(messages.reshape(b_t, n, n, feat), axis=2)
    mag_out[:] = (t2 * mask).reshape(b_t, n * n, 1)


def _pairwise_outputs(a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2, b_m2,
                      w_att, b_att, w_x1, b_x1, w_x2, *, n, feat,
                      r_cutoff):
    """The block's outputs as a pure traceable function of values.

    The JVP and VJP kernels apply ``jax.jvp`` / ``jax.vjp`` to this
    function *inside* the kernel body — autodiff of pure jnp traces to
    the same elementwise + matmul ops Mosaic compiles for the forward,
    so the derived kernels stay VMEM-resident."""
    b_t = a_i.shape[0]
    (mask, _, _, _, _, _, _, _, _, _, messages, _, t2) = _forward_chain(
        a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2, b_m2, w_att,
        b_att, w_x1, b_x1, w_x2, n=n, feat=feat, r_cutoff=r_cutoff)
    node_msg = jnp.sum(messages.reshape(b_t, n, n, feat), axis=2)
    mag = (t2 * mask).reshape(b_t, n * n, 1)
    return node_msg, mag


#: Positions (within one 14-argument group) stored as (1, k) rows in the
#: kernel layout; position 10 (b_att) is a (1, 1) scalar.
_ROW_POSITIONS = frozenset({3, 4, 6, 8, 9, 12, 13})
_SCALAR_POSITION = 10


def _unpack_group(values):
    """Kernel-layout (2D) values -> the shapes _pairwise_outputs expects."""
    out = []
    for idx, value in enumerate(values):
        if idx % 14 in _ROW_POSITIONS:
            out.append(value[0])
        elif idx % 14 == _SCALAR_POSITION:
            out.append(value[0, 0])
        else:
            out.append(value)
    return tuple(out)


def _pack_group(grads):
    """Inverse of :func:`_unpack_group` for gradient outputs."""
    out = []
    for idx, g in enumerate(grads):
        if idx % 14 in _ROW_POSITIONS:
            out.append(g.reshape(1, -1))
        elif idx % 14 == _SCALAR_POSITION:
            out.append(g.reshape(1, 1))
        else:
            out.append(g)
    return out


def _accumulate_outputs(outs, out_refs, n_tiled):
    """Write per-tile grads directly; zero-init + accumulate the rest
    (weight-shaped contributions summed across the batch-tile grid)."""
    for ref, value in zip(out_refs[:n_tiled], outs[:n_tiled]):
        ref[:] = value

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in out_refs[n_tiled:]:
            ref[:] = jnp.zeros_like(ref)

    for ref, value in zip(out_refs[n_tiled:], outs[n_tiled:]):
        ref[:] += value


def _jvp_kernel(*refs, n, feat, r_cutoff):
    """(primal, tangent) of the pairwise block in one fused pass."""
    vals = _unpack_group([ref[:] for ref in refs[:28]])
    out_refs = refs[28:]

    def fn(*args):
        return _pairwise_outputs(*args, n=n, feat=feat, r_cutoff=r_cutoff)

    (nm, mag), (dnm, dmag) = jax.jvp(fn, vals[:14], vals[14:])
    out_refs[0][:] = nm
    out_refs[1][:] = mag
    out_refs[2][:] = dnm
    out_refs[3][:] = dmag


def _jvp_bwd_kernel(*refs, n, feat, r_cutoff):
    """VJP of the JVP pass, derived by in-kernel autodiff.

    Inputs: 28 primal refs (14 args + 14 tangents), 4 cotangent refs
    (on nm, mag, dnm, dmag). Outputs: 28 grads — the 6 per-pair ones
    (a_i, a_j, dist and their tangents) written per tile, the 22
    weight-shaped ones accumulated across the grid."""
    vals = _unpack_group([ref[:] for ref in refs[:28]])
    cots = tuple(ref[:] for ref in refs[28:32])
    out_refs = refs[32:]

    def jvp_fn(*args):
        def fn(*a):
            return _pairwise_outputs(*a, n=n, feat=feat,
                                     r_cutoff=r_cutoff)
        (nm, mag), (dnm, dmag) = jax.jvp(fn, args[:14], args[14:])
        return nm, mag, dnm, dmag

    _, vjp_fn = jax.vjp(jvp_fn, *vals)
    grads = _pack_group(vjp_fn(cots))

    tiled = [grads[0], grads[1], grads[2], grads[14], grads[15], grads[16]]
    accumulated = grads[3:14] + grads[17:28]
    _accumulate_outputs(tuple(tiled + accumulated), out_refs, 6)


def _weight_specs_shapes(feat, d_feat, dtype, full):
    """(specs, shapes) for one group's 11 weight-layout tensors."""
    layouts = [(1, d_feat), (1, d_feat), (feat, d_feat), (1, feat),
               (feat, feat), (1, feat), (1, feat), (1, 1),
               (feat, feat), (1, feat), (1, feat)]
    specs = tuple(full(shape) for shape in layouts)
    shapes = tuple(jax.ShapeDtypeStruct(shape, dtype) for shape in layouts)
    return specs, shapes


def _pack_args(args, n):
    """Map user-facing arg shapes to the kernel layouts (free XLA
    reshapes: a_i -> (B,N,1,F), a_j -> (B,1,N,F), dist -> (B,N*N,1),
    row params -> (1,k))."""
    packed = []
    for idx, value in enumerate(args):
        pos = idx % 14
        if pos == 0:
            packed.append(value[:, :, None, :])
        elif pos == 1:
            packed.append(value[:, None, :, :])
        elif pos == 2:
            packed.append(value.reshape(value.shape[0], n * n, 1))
        elif pos in _ROW_POSITIONS or pos == _SCALAR_POSITION:
            packed.append(_as_row(value))
        else:
            packed.append(value)
    return packed


@functools.partial(jax.custom_vjp, nondiff_argnums=(28, 29, 30, 31))
def _jvp_op(*args):
    """Fused (primal, tangent) op: 14 primals + 14 tangents in, the 4
    outputs (nm, mag, dnm, dmag) out. custom_vjp (first order), which is
    all the CNF training loss needs once the trace probe has been
    expanded by the jvp rule."""
    arrays, (n, feat, r_cutoff, block_b) = args[:28], args[28:]
    a_i = arrays[0]
    batch = a_i.shape[0]
    # The dual (value, tangent) chain doubles the live VMEM set vs the
    # plain forward; halve the batch tile.
    block_b = _dividing_tile(batch, max(1, block_b // 2))
    d_feat = arrays[5].shape[1]
    grid = (pl.cdiv(batch, block_b),)
    in_specs, tile3, full, pair1, _ = _specs(batch, block_b, n, feat,
                                             d_feat)
    w_specs, _ = _weight_specs_shapes(feat, d_feat, a_i.dtype, full)
    group = [in_specs[0], in_specs[1], in_specs[2], *w_specs]
    dtype = a_i.dtype

    kernel = functools.partial(_jvp_kernel, n=n, feat=feat,
                               r_cutoff=r_cutoff)
    nm, mag, dnm, dmag = pl.pallas_call(
        kernel, grid=grid,
        in_specs=group + group,
        out_specs=(tile3(feat), pair1(), tile3(feat), pair1()),
        out_shape=(jax.ShapeDtypeStruct((batch, n, feat), dtype),
                   jax.ShapeDtypeStruct((batch, n * n, 1), dtype),
                   jax.ShapeDtypeStruct((batch, n, feat), dtype),
                   jax.ShapeDtypeStruct((batch, n * n, 1), dtype)),
        compiler_params=_compiler_params(),
        interpret=INTERPRET,
    )(*_pack_args(arrays, n))
    return nm, mag.reshape(batch, n, n), dnm, dmag.reshape(batch, n, n)


def _jvp_op_fwd(*args):
    arrays = args[:28]
    return _jvp_op(*args), arrays


def _jvp_op_bwd(n, feat, r_cutoff, block_b, residuals, cotangents):
    arrays = residuals
    a_i = arrays[0]
    batch = a_i.shape[0]
    # The second-order pass holds roughly four dual chains in VMEM;
    # shrink the tile accordingly.
    block_b = _dividing_tile(batch, max(1, block_b // 8))
    d_feat = arrays[5].shape[1]
    grid = (pl.cdiv(batch, block_b),)
    in_specs, tile3, full, pair1, node4 = _specs(batch, block_b, n, feat,
                                                 d_feat)
    w_specs, w_shapes = _weight_specs_shapes(feat, d_feat, a_i.dtype, full)
    group = [in_specs[0], in_specs[1], in_specs[2], *w_specs]
    dtype = a_i.dtype

    # Per-pair grads come back in the kernel layouts (node4/pair1).
    tiled_specs = (node4(2), node4(1), pair1(),
                   node4(2), node4(1), pair1())
    tiled_shapes = (
        jax.ShapeDtypeStruct((batch, n, 1, feat), dtype),
        jax.ShapeDtypeStruct((batch, 1, n, feat), dtype),
        jax.ShapeDtypeStruct((batch, n * n, 1), dtype),
        jax.ShapeDtypeStruct((batch, n, 1, feat), dtype),
        jax.ShapeDtypeStruct((batch, 1, n, feat), dtype),
        jax.ShapeDtypeStruct((batch, n * n, 1), dtype),
    )
    cot_specs = [tile3(feat), pair1(), tile3(feat), pair1()]
    g_nm, g_mag, g_dnm, g_dmag = cotangents
    cots = (g_nm, g_mag.reshape(batch, n * n, 1),
            g_dnm, g_dmag.reshape(batch, n * n, 1))

    kernel = functools.partial(_jvp_bwd_kernel, n=n, feat=feat,
                               r_cutoff=r_cutoff)
    outs = pl.pallas_call(
        kernel, grid=grid,
        in_specs=group + group + cot_specs,
        out_specs=tiled_specs + w_specs + w_specs,
        out_shape=tiled_shapes + w_shapes + w_shapes,
        compiler_params=_compiler_params(),
        interpret=INTERPRET,
    )(*_pack_args(arrays, n), *cots)

    # Reorder back to argument order and restore original shapes.
    tiled = outs[:6]
    weights_p = outs[6:17]
    weights_t = outs[17:28]
    flat = ([tiled[0], tiled[1], tiled[2], *weights_p,
             tiled[3], tiled[4], tiled[5], *weights_t])
    return tuple(g.reshape(arg.shape)
                 for g, arg in zip(flat, arrays))


_jvp_op.defvjp(_jvp_op_fwd, _jvp_op_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(14, 15, 16, 17))
def fused_egnn_pairwise(a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2,
                        b_m2, w_att, b_att, w_x1, b_x1, w_x2,
                        n, feat, r_cutoff, block_b=DEFAULT_BLOCK_B):
    """Fused EGNN pairwise message block.

    Differentiation contract: the op is a :func:`jax.custom_jvp` whose
    rule expands a forward-mode probe into two first-order
    ``custom_vjp`` kernel ops — exactly the pattern the CNF uses
    (``jax.jvp`` for the Hutchinson trace, then one reverse pass for
    training). Plain ``jax.grad`` *without* an enclosing ``jvp`` is not
    supported (reverse-on-primal would require transposing the opaque
    tangent kernel); call ``jax.jvp`` with zero tangents if you need
    value+grad of the primal alone.

    Parameters
    ----------
    a_i, a_j : jax.Array
        Factored message-MLP first-layer terms ``h @ W_i^T`` / ``h @
        W_j^T``, shape ``(batch, n, feat)``.
    dist : jax.Array
        Safe pairwise distances (diagonal = 1), shape ``(batch, n, n)``.
    mu, log_gammas : jax.Array
        Radial-expansion means / log inverse variances, ``(d_feat,)``.
    w_e, b1 : jax.Array
        Embedding block ``(feat, d_feat)`` of the message MLP's first
        weight and its bias.
    w_m2, b_m2 : jax.Array
        Second message-MLP layer ``(feat, feat)`` + bias.
    w_att, b_att : jax.Array
        Attention head: ``(feat,)`` weight row and scalar bias.
    w_x1, b_x1, w_x2 : jax.Array
        Displacement MLP: ``(feat, feat)`` + bias, then the bias-free
        ``(feat,)`` output row (tanh).
    n, feat : int
        Static atom count / feature width.
    r_cutoff : float
        Static radial cutoff (mask + switching function).
    block_b : int, optional
        Batch tile per kernel invocation (static).

    Returns
    -------
    node_messages : jax.Array
        ``(batch, n, feat)`` — ``sum_j silu-MLP messages * attention *
        mask``.
    magnitudes : jax.Array
        ``(batch, n, n)`` — masked ``tanh`` displacement magnitudes
        (multiply by unit directions and the speed factor outside).
    """
    return _fwd_impl(a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2, b_m2,
                     w_att, b_att, w_x1, b_x1, w_x2, n, feat, r_cutoff,
                     block_b)


@fused_egnn_pairwise.defjvp
def _fused_jvp_rule(n, feat, r_cutoff, block_b, primals, tangents):
    outs = _jvp_op(*primals, *tangents, n, feat, r_cutoff, block_b)
    nm, mag, dnm, dmag = outs
    return (nm, mag), (dnm, dmag)


def _specs(batch, block_b, n, feat, d_feat):
    """(in_specs for the 14-arg group, spec builders).

    Layout rule (see _forward_chain): a_i arrives as (B, N, 1, F), a_j
    as (B, 1, N, F), dist/mag as (B, N*N, 1) — the lane dim of every
    tensor survives all in-kernel reshapes.
    """
    def tile3(width):
        return pl.BlockSpec((block_b, n, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def pair1():
        return pl.BlockSpec((block_b, n * n, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def node4(expand_axis):
        shape = ((block_b, n, 1, feat) if expand_axis == 2
                 else (block_b, 1, n, feat))
        return pl.BlockSpec(shape, lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def full(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [
        node4(2), node4(1), pair1(),                   # a_i, a_j, dist
        full((1, d_feat)), full((1, d_feat)),          # mu, log_gammas
        full((feat, d_feat)), full((1, feat)),         # w_e, b1
        full((feat, feat)), full((1, feat)),           # w_m2, b_m2
        full((1, feat)), full((1, 1)),                 # w_att, b_att
        full((feat, feat)), full((1, feat)),           # w_x1, b_x1
        full((1, feat)),                               # w_x2
    ]
    return in_specs, tile3, full, pair1, node4


def _as_row(x):
    return jnp.asarray(x).reshape(1, -1)


def _dividing_tile(batch: int, want: int) -> int:
    """Largest tile <= want that divides batch exactly.

    Partial trailing blocks are padded by Pallas with undefined rows;
    harmless for per-tile outputs (clipped on copy-back) but fatal for
    the weight gradients accumulated across the grid — so tiles must
    divide the batch.
    """
    want = max(1, min(want, batch))
    while batch % want:
        want -= 1
    return want


def _compiler_params():
    if INTERPRET:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_impl(a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2, b_m2, w_att,
              b_att, w_x1, b_x1, w_x2, n, feat, r_cutoff, block_b):
    batch = a_i.shape[0]
    block_b = _dividing_tile(batch, block_b)
    d_feat = w_e.shape[1]
    grid = (pl.cdiv(batch, block_b),)
    in_specs, tile3, _, pair1, _ = _specs(batch, block_b, n, feat,
                                          d_feat)

    kernel = functools.partial(_forward_kernel, n=n, feat=feat,
                               r_cutoff=r_cutoff)
    node_msg, mag = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(tile3(feat), pair1()),
        out_shape=(jax.ShapeDtypeStruct((batch, n, feat), a_i.dtype),
                   jax.ShapeDtypeStruct((batch, n * n, 1), a_i.dtype)),
        compiler_params=_compiler_params(),
        interpret=INTERPRET,
    )(*_pack_args([a_i, a_j, dist, mu, log_gammas, w_e, b1, w_m2, b_m2,
                   w_att, b_att, w_x1, b_x1, w_x2], n))
    return node_msg, mag.reshape(batch, n, n)
