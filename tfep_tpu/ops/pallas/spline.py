"""Pallas TPU kernel: fused rational-quadratic spline (forward + backward).

Fuses, for the standard spline configuration (non-circular, fixed domain,
K+1 free slopes), the whole parameter-normalization + bin-assignment +
spline evaluation chain into one VMEM-resident kernel per batch tile:
softmax over width/height logits, softplus slopes with the identity offset,
on-the-fly cumulative knots, bin selection by masks, the rational-quadratic
map and its log-derivative. The backward kernel recomputes the forward
quantities and applies hand-derived analytic gradients (including the
softmax/softplus chains), so neither pass materializes any ``(batch, K,
n_features)`` intermediate in HBM — the dominant cost of the XLA
formulation. Semantics match
:func:`tfep_tpu.nn.transformers.spline.NeuralSplineTransformer` exactly for
the supported configuration (verified against the XLA path and the autograd
oracle in tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_spline', 'fused_spline_reference']

DEFAULT_BLOCK_B = 256

#: Set True (e.g. in tests) to run the kernels in interpreter mode.
INTERPRET = False


def _unpack(params_ref, k, F):
    return params_ref[:, k * F:(k + 1) * F]


def _normalized(params, x0, xf, y0, yf, K, min_bin, min_slope, offset):
    """Shared (traceable) normalization used by both kernels.

    Returns widths w[k], heights h[k], slopes s[j] (lists of (TB, F)) plus
    the softmax probabilities for the backward chain.
    """
    F = x0.shape[-1]
    R_w = (xf - x0) - K * min_bin
    R_h = (yf - y0) - K * min_bin

    w_logits = [params[:, k * F:(k + 1) * F] for k in range(K)]
    h_logits = [params[:, (K + k) * F:(K + k + 1) * F] for k in range(K)]
    s_raw = [params[:, (2 * K + j) * F:(2 * K + j + 1) * F]
             for j in range(K + 1)]

    w_max = w_logits[0]
    for k in range(1, K):
        w_max = jnp.maximum(w_max, w_logits[k])
    w_exp = [jnp.exp(l - w_max) for l in w_logits]
    w_sum = w_exp[0]
    for k in range(1, K):
        w_sum = w_sum + w_exp[k]
    w_p = [e / w_sum for e in w_exp]
    widths = [p * R_w + min_bin for p in w_p]

    h_max = h_logits[0]
    for k in range(1, K):
        h_max = jnp.maximum(h_max, h_logits[k])
    h_exp = [jnp.exp(l - h_max) for l in h_logits]
    h_sum = h_exp[0]
    for k in range(1, K):
        h_sum = h_sum + h_exp[k]
    h_p = [e / h_sum for e in h_exp]
    heights = [p * R_h + min_bin for p in h_p]

    slopes = [jax.nn.softplus(s + offset) + min_slope for s in s_raw]
    sig = [jax.nn.sigmoid(s + offset) for s in s_raw]

    return widths, heights, slopes, w_p, h_p, sig, R_w, R_h


def _forward_kernel(x_ref, params_ref, x0_ref, xf_ref, y0_ref, yf_ref,
                    y_out, dl_out, *, K, min_bin, min_slope, offset):
    x = x_ref[:]
    x0 = x0_ref[:]
    xf = xf_ref[:]
    y0 = y0_ref[:]
    yf = yf_ref[:]

    widths, heights, slopes, _, _, _, _, _ = _normalized(
        params_ref[:], x0, xf, y0, yf, K, min_bin, min_slope, offset)

    xr = x - x0
    W_total = xf - x0

    y = jnp.zeros_like(x)
    dl = jnp.zeros_like(x)
    cw = jnp.zeros_like(x)
    ch = jnp.zeros_like(x)
    for k in range(K):
        w_k = widths[k]
        h_k = heights[k]
        s_k = slopes[k]
        s_k1 = slopes[k + 1]
        in_bin = ((xr >= cw) if k == K - 1
                  else (xr >= cw) & (xr < cw + w_k))
        rw = 1.0 / w_k
        # Every bin's arithmetic runs for every element and is masked
        # afterwards — so it must be finite even for out-of-bin elements.
        # Unclamped, |e| can be large enough out-of-bin to drive the
        # denominator D = sb + c*e*(1-e) through zero (inf, then
        # mask*inf = NaN). Clamping to the bin is a no-op for in-bin
        # elements (e in [0, 1]) and makes D provably positive:
        # D = sb*(1-2*emo) + (s_k+s_k1)*emo with emo in [0, 1/4].
        e = jnp.clip((xr - cw) * rw, 0.0, 1.0)
        sb = h_k * rw
        emo = e * (1.0 - e)
        c = s_k1 + s_k - 2.0 * sb
        A = sb * e * e + s_k * emo
        D = sb + c * emo
        rD = 1.0 / D
        y_k = y0 + ch + h_k * A * rD
        N = s_k1 * e * e + 2.0 * sb * emo + s_k * (1.0 - e) ** 2
        # One log per bin: 2 log sb + log N - 2 log D = log(sb^2 N / D^2).
        dl_k = jnp.log(sb * sb * N * rD * rD)
        y = jnp.where(in_bin, y_k, y)
        dl = jnp.where(in_bin, dl_k, dl)
        cw = cw + w_k
        ch = ch + h_k

    # Linear extrapolation outside the domain with the boundary slopes.
    below = xr < 0.0
    above = xr >= W_total
    y = jnp.where(below, y0 + slopes[0] * xr, y)
    dl = jnp.where(below, jnp.log(slopes[0]), dl)
    y = jnp.where(above, yf + slopes[K] * (xr - W_total), y)
    dl = jnp.where(above, jnp.log(slopes[K]), dl)

    y_out[:] = y
    dl_out[:] = dl


def _backward_kernel(x_ref, params_ref, x0_ref, xf_ref, y0_ref, yf_ref,
                     gy_ref, gl_ref, gx_out, gp_out,
                     *, K, min_bin, min_slope, offset):
    x = x_ref[:]
    params = params_ref[:]
    x0 = x0_ref[:]
    xf = xf_ref[:]
    y0 = y0_ref[:]
    yf = yf_ref[:]
    gy = gy_ref[:]
    gl = gl_ref[:]

    F = x0.shape[-1]
    widths, heights, slopes, w_p, h_p, sig, R_w, R_h = _normalized(
        params, x0, xf, y0, yf, K, min_bin, min_slope, offset)

    xr = x - x0
    W_total = xf - x0
    below = xr < 0.0
    above = xr >= W_total
    inside = jnp.logical_not(below | above)

    gx = jnp.zeros_like(x)
    gw = [jnp.zeros_like(x) for _ in range(K)]
    gh = [jnp.zeros_like(x) for _ in range(K)]
    gs = [jnp.zeros_like(x) for _ in range(K + 1)]
    # Grad w.r.t. the cumulative offsets entering bin k (distributed to
    # earlier bins with a suffix sum afterwards).
    gcw = [jnp.zeros_like(x) for _ in range(K)]
    gch = [jnp.zeros_like(x) for _ in range(K)]

    cw = jnp.zeros_like(x)
    ch = jnp.zeros_like(x)
    for k in range(K):
        w_k = widths[k]
        h_k = heights[k]
        s_k = slopes[k]
        s_k1 = slopes[k + 1]
        in_bin = (inside & (xr >= cw) if k == K - 1
                  else inside & (xr >= cw) & (xr < cw + w_k))

        rw = 1.0 / w_k
        # Clamped for the same masked-lane finiteness reason as the
        # forward kernel (out-of-bin D could cross zero; 0 * inf = NaN).
        e = jnp.clip((xr - cw) * rw, 0.0, 1.0)
        sb = h_k * rw
        emo = e * (1.0 - e)
        one_m2e = 1.0 - 2.0 * e
        c = s_k1 + s_k - 2.0 * sb
        A = sb * e * e + s_k * emo
        D = sb + c * emo
        N = s_k1 * e * e + 2.0 * sb * emo + s_k * (1.0 - e) ** 2
        rD = 1.0 / D
        rN = 1.0 / N
        hrD = h_k * rD
        hrD2 = hrD * rD

        # y = y0 + ch + h A / D ; l = 2 log sb + log N - 2 log D.
        dA_de = 2.0 * sb * e + s_k * one_m2e
        dD_de = c * one_m2e
        dN_de = 2.0 * s_k1 * e + 2.0 * sb * one_m2e - 2.0 * s_k * (1.0 - e)
        dy_de = hrD2 * (dA_de * D - A * dD_de)
        dl_de = dN_de * rN - 2.0 * dD_de * rD
        ge = gy * dy_de + gl * dl_de

        # sb appears in A, D (through c), N, and the 2 log sb term.
        dy_dsb = hrD2 * (e * e * D - A * (1.0 - 2.0 * emo))
        dl_dsb = 2.0 * w_k / h_k + 2.0 * emo * rN - 2.0 * (
            1.0 - 2.0 * emo) * rD
        gsb = gy * dy_dsb + gl * dl_dsb

        # s_k in A, D (via c), N.
        dy_dsk = hrD2 * (emo * D - A * emo)
        dl_dsk = (1.0 - e) ** 2 * rN - 2.0 * emo * rD
        gs_k_bin = gy * dy_dsk + gl * dl_dsk

        # s_{k+1} in D (via c), N.
        dy_dsk1 = hrD2 * (-A * emo)
        dl_dsk1 = e * e * rN - 2.0 * emo * rD
        gs_k1_bin = gy * dy_dsk1 + gl * dl_dsk1

        # h_k direct (A/D factor) + via sb; w_k via e and sb; cw via e.
        gh_direct = gy * A * rD
        gw_k_bin = -rw * (ge * e + gsb * sb)
        gh_k_bin = gh_direct + gsb * rw
        gcw_k_bin = -ge * rw
        gch_k_bin = gy

        mask = in_bin.astype(x.dtype)
        gx = gx + mask * ge * rw
        gw[k] = gw[k] + mask * gw_k_bin
        gh[k] = gh[k] + mask * gh_k_bin
        gs[k] = gs[k] + mask * gs_k_bin
        gs[k + 1] = gs[k + 1] + mask * gs_k1_bin
        gcw[k] = mask * gcw_k_bin
        gch[k] = mask * gch_k_bin

        cw = cw + w_k
        ch = ch + h_k

    # Distribute cumulative-offset grads to earlier bins (suffix sums).
    suffix_w = jnp.zeros_like(x)
    suffix_h = jnp.zeros_like(x)
    for k in range(K - 1, 0, -1):
        suffix_w = suffix_w + gcw[k]
        suffix_h = suffix_h + gch[k]
        gw[k - 1] = gw[k - 1] + suffix_w
        gh[k - 1] = gh[k - 1] + suffix_h

    # Out-of-domain linear pieces: y = y0 + s0 xr (below),
    # y = yf + sK (xr - W) (above); total width W has zero grad.
    mb = below.astype(x.dtype)
    ma = above.astype(x.dtype)
    gx = gx + mb * gy * slopes[0] + ma * gy * slopes[K]
    gs[0] = gs[0] + mb * (gy * xr + gl / slopes[0])
    gs[K] = gs[K] + ma * (gy * (xr - W_total) + gl / slopes[K])

    # Softmax chains: gw_k is grad w.r.t. widths; widths = p R + minbin.
    gp_dot_w = jnp.zeros_like(x)
    gp_dot_h = jnp.zeros_like(x)
    for k in range(K):
        gp_dot_w = gp_dot_w + gw[k] * w_p[k]
        gp_dot_h = gp_dot_h + gh[k] * h_p[k]

    for k in range(K):
        gp_out[:, k * F:(k + 1) * F] = (
            R_w * w_p[k] * (gw[k] - gp_dot_w))
        gp_out[:, (K + k) * F:(K + k + 1) * F] = (
            R_h * h_p[k] * (gh[k] - gp_dot_h))
    for j in range(K + 1):
        gp_out[:, (2 * K + j) * F:(2 * K + j + 1) * F] = sig[j] * gs[j]

    gx_out[:] = gx


def _run_kernel(kernel, out_shapes, block_b, B, inputs, F, P):
    n_in = len(inputs)
    grid = (pl.cdiv(B, block_b),)

    def in_spec(width):
        return pl.BlockSpec((block_b, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def row_spec(width):
        return pl.BlockSpec((1, width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = []
    for arr in inputs:
        if arr.shape[0] == 1:
            in_specs.append(row_spec(arr.shape[1]))
        else:
            in_specs.append(in_spec(arr.shape[1]))
    out_specs = [in_spec(s.shape[1]) for s in out_shapes]

    # The unrolled K-bin chains keep a large scoped live set; lift Mosaic's
    # default 16M scoped-VMEM limit (v5e has 128M physical VMEM).
    compiler_params = None
    if not INTERPRET:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=(tuple(out_shapes) if len(out_shapes) > 1
                   else out_shapes[0]),
        compiler_params=compiler_params,
        interpret=INTERPRET,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_spline(x, params, x0, xf, y0, yf, n_bins, min_bin_size, min_slope,
                 block_b=DEFAULT_BLOCK_B):
    """Fused rational-quadratic spline transform on TPU.

    Differentiable via a hand-derived :func:`jax.custom_vjp` whose
    backward pass is itself a Pallas kernel (recompute-in-VMEM, no HBM
    intermediates). Points outside ``[x0, xf]`` are mapped by linear
    extrapolation with the boundary slopes, exactly like the XLA
    formulation in
    :class:`tfep_tpu.nn.transformers.spline.NeuralSplineTransformer`.

    Parameters
    ----------
    x : jax.Array
        Inputs, shape ``(batch, n_features)``.
    params : jax.Array
        Raw conditioner outputs, shape ``(batch, (3K+1) * n_features)``,
        laid out feature-contiguous per parameter: K width logits, K
        height logits, K+1 slope pre-activations.
    x0, xf, y0, yf : jax.Array
        Per-feature domain bounds, shape ``(n_features,)``.
    n_bins : int
        Number of spline bins K (static).
    min_bin_size, min_slope : float
        Floors applied after normalization (static).
    block_b : int, optional
        Batch tile per kernel invocation (static).

    Returns
    -------
    y : jax.Array
        Transformed values, shape ``(batch, n_features)``.
    log_dy_dx : jax.Array
        Per-element log-derivative, same shape (sum over features gives
        the transformer's log-det-Jacobian contribution).
    """
    y, dl = _fused_spline_fwd_impl(x, params, x0, xf, y0, yf, n_bins,
                                   min_bin_size, min_slope, block_b)
    return y, dl


def _pad_features(x, params, x0, xf, y0, yf, n_bins):
    """Pad the feature axis to a 128-lane multiple.

    Every per-bin parameter slice inside the kernels then starts on a lane
    boundary, which removes all Mosaic relayouts (measured ~1.6x on the
    backward pass for F=96). Padded lanes get a benign [0, 1] domain and
    are sliced away on the way out.
    """
    B, F = x.shape
    F_pad = ((F + 127) // 128) * 128
    if F_pad == F:
        return x, params, x0, xf, y0, yf, F
    pad = F_pad - F
    x = jnp.pad(x, ((0, 0), (0, pad)))
    P = 3 * n_bins + 1
    params = jnp.pad(params.reshape(B, P, F), ((0, 0), (0, 0), (0, pad)))
    params = params.reshape(B, P * F_pad)
    x0 = jnp.pad(x0, (0, pad))
    xf = jnp.pad(xf, (0, pad), constant_values=1.0)
    y0 = jnp.pad(y0, (0, pad))
    yf = jnp.pad(yf, (0, pad), constant_values=1.0)
    return x, params, x0, xf, y0, yf, F


def _fused_spline_fwd_impl(x, params, x0, xf, y0, yf, n_bins, min_bin_size,
                           min_slope, block_b):
    B = x.shape[0]
    x, params, x0, xf, y0, yf, F = _pad_features(
        x, params, x0, xf, y0, yf, n_bins)
    offset = float(np.log(np.exp(1.0 - min_slope) - 1.0))
    kernel = functools.partial(_forward_kernel, K=n_bins,
                               min_bin=min_bin_size, min_slope=min_slope,
                               offset=offset)
    F_pad = x.shape[1]
    out_shapes = [jax.ShapeDtypeStruct((B, F_pad), x.dtype),
                  jax.ShapeDtypeStruct((B, F_pad), x.dtype)]
    rows = [v.reshape(1, -1).astype(x.dtype) for v in (x0, xf, y0, yf)]
    y, dl = _run_kernel(kernel, out_shapes, min(block_b, B), B,
                        [x, params, *rows], F_pad, params.shape[1])
    return y[:, :F], dl[:, :F]


def _fused_spline_fwd(x, params, x0, xf, y0, yf, n_bins, min_bin_size,
                      min_slope, block_b):
    out = _fused_spline_fwd_impl(x, params, x0, xf, y0, yf, n_bins,
                                 min_bin_size, min_slope, block_b)
    return out, (x, params, x0, xf, y0, yf)


def _fused_spline_bwd(n_bins, min_bin_size, min_slope, block_b, residuals,
                      cotangents):
    x, params, x0, xf, y0, yf = residuals
    gy, gl = cotangents
    B, F = x.shape
    P_shape = params.shape
    xp, params, x0p, xfp, y0p, yfp, _ = _pad_features(
        x, params, x0, xf, y0, yf, n_bins)
    F_pad = xp.shape[1]
    if F_pad != F:
        pad = ((0, 0), (0, F_pad - F))
        gy = jnp.pad(gy, pad)
        gl = jnp.pad(gl, pad)
    offset = float(np.log(np.exp(1.0 - min_slope) - 1.0))
    kernel = functools.partial(_backward_kernel, K=n_bins,
                               min_bin=min_bin_size, min_slope=min_slope,
                               offset=offset)
    out_shapes = [jax.ShapeDtypeStruct((B, F_pad), x.dtype),
                  jax.ShapeDtypeStruct(params.shape, params.dtype)]
    rows = [v.reshape(1, -1).astype(x.dtype) for v in (x0p, xfp, y0p, yfp)]
    gx, gparams = _run_kernel(kernel, out_shapes, min(block_b, B), B,
                              [xp, params, *rows, gy, gl], F_pad,
                              params.shape[1])
    if F_pad != F:
        gx = gx[:, :F]
        P = 3 * n_bins + 1
        gparams = gparams.reshape(B, P, F_pad)[:, :, :F].reshape(P_shape)
    zeros_f = jnp.zeros_like(x0)
    return (gx, gparams, zeros_f, zeros_f, zeros_f, zeros_f)


fused_spline.defvjp(_fused_spline_fwd, _fused_spline_bwd)


def fused_spline_reference(x, params, x0, xf, y0, yf, n_bins,
                           min_bin_size=1e-4, min_slope=1e-4):
    """Pure-JAX mirror of the fused kernel (for tests/interpret checks)."""
    from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer
    t = NeuralSplineTransformer.create(
        x0=x0, xf=xf, y0=y0, yf=yf, n_bins=n_bins,
        min_bin_size=min_bin_size, min_slope=min_slope)
    y, ldj = t._forward_impl(x, params)
    return y, ldj
