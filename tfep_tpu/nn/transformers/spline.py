"""Rational-quadratic (neural) spline transformer, with circular variant.

Implements Durkan et al.'s neural spline flows with the reference's full
option surface (/root/reference/tfep/nn/transformers/spline.py:29-650):
per-feature fixed domains ``x0/xf/y0/yf`` with linear extrapolation outside,
circular (periodic) splines with a learned phase shift, identity boundary
slopes, learnable lower/upper domain bounds (scale/shift parameters from the
conditioner), and min bin-size/slope floors. The parameter-count contract
(``n_parameters_per_feature``) matches the reference exactly, since MADE
output degrees depend on it.

TPU notes: bin assignment is a rank-reduction (``sum(x > knots)``) plus
``take_along_axis`` gathers — fully vectorized, no data-dependent shapes.
The whole transformer fuses into the surrounding jit region.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import buffer, static
from tfep_tpu.nn.transformers.transformer import MAFTransformer

__all__ = [
    'NeuralSplineTransformer',
    'neural_spline_transformer', 'neural_spline_transformer_inverse',
]


class NeuralSplineTransformer(MAFTransformer):
    """Neural spline transformer (optionally circular / learnable-domain).

    Attributes
    ----------
    x0, xf : jax.Array
        ``(n_features,)`` input-domain bounds; inputs outside are mapped
        by linear extrapolation with the boundary slopes.
    y0, yf : jax.Array
        Output-domain bounds (default: same as the input domain, which is
        required for the identity initialization).
    n_bins : int
        Number of rational-quadratic bins K.
    circular : bool
        Periodic spline: first slope equals last slope and the
        conditioner provides a phase shift, so torsions transform
        smoothly through the boundary.
    identity_boundary_slopes : bool
        Pin both boundary slopes to 1 (removes 2 parameters per feature,
        1 if circular) so the map is C1 at the domain edges with the
        linear tails.
    learn_lower_bound, learn_upper_bound : bool
        Make domain bounds conditioner outputs (log-scale + shift).
    min_bin_size, min_slope : float
        Floors keeping every bin and slope strictly positive.
    fused : {'auto', 'always', 'never'}
        Whether to use the Pallas fused kernel when applicable (see
        ``_fused_applicable`` for why 'auto' currently means the XLA
        path).
    remat : bool
        Rematerialize the spline intermediates in the backward pass
        (opt-in memory knob; off is faster when the residuals fit HBM).
    """

    x0: jnp.ndarray = buffer(default=None)    # (n_features,)
    xf: jnp.ndarray = buffer(default=None)
    y0: jnp.ndarray = buffer(default=None)
    yf: jnp.ndarray = buffer(default=None)
    n_bins: int = static(default=8)
    circular: bool = static(default=False)
    identity_boundary_slopes: bool = static(default=False)
    learn_lower_bound: bool = static(default=False)
    learn_upper_bound: bool = static(default=False)
    min_bin_size: float = static(default=1e-4)
    min_slope: float = static(default=1e-4)
    fused: str = static(default='auto')   # 'auto' | 'always' | 'never'
    remat: bool = static(default=False)

    @classmethod
    def create(cls, x0, xf, n_bins: int, y0=None, yf=None,
               circular: bool = False,
               identity_boundary_slopes: bool = False,
               learn_lower_bound: bool = False,
               learn_upper_bound: bool = False,
               min_bin_size: float = 1e-4,
               min_slope: float = 1e-4,
               fused: str = 'auto',
               remat: bool = False) -> 'NeuralSplineTransformer':
        """Build a spline transformer (validates the option combinations).

        Parameters
        ----------
        x0, xf : array_like, shape (n_features,)
            Lower/upper input-domain bound of each feature's spline.
        n_bins : int
            Number of rational-quadratic bins K.
        y0, yf : array_like, shape (n_features,), optional
            Output-domain bounds; default to ``x0``/``xf``.
        circular : bool, optional
            Periodic spline (torsions): ties the boundary slopes and adds a
            learned phase shift. Requires ``y0 == x0`` and ``yf == xf``.
        identity_boundary_slopes : bool, optional
            Pin the boundary slopes to 1 (C1 continuity with the linear
            extrapolation tails).
        learn_lower_bound, learn_upper_bound : bool, optional
            Make the domain bounds conditioner outputs. Incompatible with
            ``circular``.
        min_bin_size, min_slope : float, optional
            Positivity floors on bin sizes and knot slopes.
        fused : {'auto', 'always', 'never'}, optional
            Pallas fused-kernel policy ('auto' currently selects the XLA
            path, which ties the kernel in measured throughput).
        remat : bool, optional
            Recompute the spline intermediates in the backward pass
            instead of saving them — an opt-in memory knob (costs ~4–8%
            throughput when the residuals would have fit anyway).

        Returns
        -------
        NeuralSplineTransformer
            The validated transformer (a pytree; safe to close over in jit).
        """
        x0 = jnp.asarray(x0)
        xf = jnp.asarray(xf)
        y0 = x0 if y0 is None else jnp.asarray(y0)
        yf = xf if yf is None else jnp.asarray(yf)

        if circular and (learn_lower_bound or learn_upper_bound):
            raise ValueError(
                'Cannot instantiate a circular spline with learnable limits.')
        if circular and not (np.allclose(x0, y0) and np.allclose(xf, yf)):
            raise ValueError('x0==y0 and xf==yf must hold for all periodic '
                             'degrees of freedom.')
        if min_bin_size <= 0.0:
            raise ValueError('The minimum bin size should be positive.')
        if not (0.0 < min_slope < 1.0):
            raise ValueError('The minimum slope should be between 0 and 1.')

        return cls(x0=x0, xf=xf, y0=y0, yf=yf, n_bins=int(n_bins),
                   circular=circular,
                   identity_boundary_slopes=identity_boundary_slopes,
                   learn_lower_bound=learn_lower_bound,
                   learn_upper_bound=learn_upper_bound,
                   min_bin_size=float(min_bin_size),
                   min_slope=float(min_slope), fused=fused,
                   remat=bool(remat))

    @property
    def n_parameters_per_feature(self) -> int:
        n = 3 * self.n_bins + 1
        if self.learn_lower_bound:
            n += 1
        if self.learn_upper_bound:
            n += 1
        if self.identity_boundary_slopes:
            n -= 1 if self.circular else 2
        return n

    # ------------------------------------------------------------------ #
    @property
    def _fused_applicable(self) -> bool:
        """Whether the Pallas fused kernel handles this configuration.

        Opt-in (``fused='always'``): after lane-aligning the parameter
        layout and lifting Mosaic's scoped-VMEM limit the kernel ties the
        XLA one-hot + remat formulation on current hardware (~1.1 ms/layer
        fwd+bwd at batch 4096x96 for both, and identical full-train-step
        throughput), so the simpler XLA path stays the default and the
        kernel is kept as a verified alternative.
        """
        return (self.fused == 'always'
                and not self.circular
                and not self.identity_boundary_slopes
                and not self.learn_lower_bound
                and not self.learn_upper_bound)

    def forward(self, x, parameters):
        if self._fused_applicable:
            # Hand-fused Pallas kernel: no (batch, K, n_features)
            # intermediates touch HBM in either pass.
            from tfep_tpu.ops.pallas.spline import fused_spline
            y, dl = fused_spline(x, parameters, self.x0, self.xf,
                                 self.y0, self.yf, self.n_bins,
                                 self.min_bin_size, self.min_slope)
            return y, jnp.sum(dl, axis=-1)
        if self.remat:
            # Recompute the spline's (batch, K, n_features) intermediates
            # in the backward pass instead of saving them — an opt-in
            # memory knob for configurations where the saved residuals
            # would not fit HBM. Re-measured off by default: saving the
            # residuals is faster at both the bench config (+4%) and
            # solvated scale (+8%) on v5e.
            return jax.checkpoint(self._forward_impl)(x, parameters)
        return self._forward_impl(x, parameters)

    def _forward_impl(self, x, parameters):
        x0, y0, widths, heights, slopes, shifts = self._get_parameters(
            parameters)
        if self.circular:
            x = (x - x0 + shifts) % (self.xf - x0) + x0
        return neural_spline_transformer(x, x0, y0, widths, heights, slopes)

    def inverse(self, y, parameters):
        x0, y0, widths, heights, slopes, shifts = self._get_parameters(
            parameters)
        x, log_det_J = neural_spline_transformer_inverse(
            y, x0, y0, widths, heights, slopes)
        if shifts is not None:
            x = (x - x0 - shifts) % (self.xf - x0) + x0
        return x, log_det_J

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        """Zeros: equal bins (softmax), unit slopes (offset softplus), zero
        shifts and unit domain scale. Identity only when x0==y0, xf==yf."""
        if not (np.allclose(self.x0, self.y0)
                and np.allclose(self.xf, self.yf)):
            raise ValueError('The identity neural spline transformer can be '
                             'implemented only if x0=y0 and xf=yf.')
        return np.zeros(self.n_parameters_per_feature * n_features)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.tile(np.asarray(degrees_in), self.n_parameters_per_feature)

    def slice_features(self, feature_indices) -> 'NeuralSplineTransformer':
        """Feature-subset view: per-feature domain bounds are gathered.

        ``feature_indices`` may be traced (dynamic values, static shape),
        so the autoregressive inverse can slice per degree group inside a
        scan. All other configuration is static and shared. A scalar (0-d)
        bound broadcasts over all features, so it is kept as is.
        """
        def gather(bound):
            return bound if np.ndim(bound) == 0 else bound[feature_indices]

        return self.replace(
            x0=gather(self.x0), xf=gather(self.xf),
            y0=gather(self.y0), yf=gather(self.yf))

    # ------------------------------------------------------------------ #
    def _get_parameters(self, parameters):
        """Normalize raw conditioner outputs into knot widths/heights/slopes.

        Returns x0, y0 with shape broadcastable to (batch, n_features);
        widths/heights (batch, K, n_features); slopes (batch, K+1,
        n_features); shifts (batch, n_features) or None.
        """
        batch_size = parameters.shape[0]
        parameters = parameters.reshape(
            batch_size, self.n_parameters_per_feature, -1)
        K = self.n_bins

        widths = parameters[:, :K]
        heights = parameters[:, K:2 * K]

        if self.identity_boundary_slopes:
            n_slopes = K - 1
        elif self.circular:
            n_slopes = K
        else:
            n_slopes = K + 1
        slopes = parameters[:, 2 * K:2 * K + n_slopes]

        if self.circular:
            shifts = parameters[:, -1]
            if not self.identity_boundary_slopes:
                # Periodic boundary: first and last slopes identical.
                slopes = jnp.concatenate([slopes, slopes[:, :1]], axis=1)
        else:
            shifts = None

        if self.identity_boundary_slopes:
            zeros = jnp.zeros_like(widths[:, :1])
            slopes = jnp.concatenate([zeros, slopes, zeros], axis=1)

        # Domain rescaling with minimum bin sizes.
        min_interval = K * self.min_bin_size
        rescaled_width = self.xf - self.x0 - min_interval
        rescaled_height = self.yf - self.y0 - min_interval
        if self.learn_lower_bound or self.learn_upper_bound:
            domain_scale = jnp.exp(parameters[:, -1:])
            rescaled_width = rescaled_width * domain_scale
            rescaled_height = rescaled_height * domain_scale

        widths = (jax.nn.softmax(widths, axis=1) * rescaled_width
                  + self.min_bin_size)
        heights = (jax.nn.softmax(heights, axis=1) * rescaled_height
                   + self.min_bin_size)

        x0, y0 = self.x0, self.y0
        if self.learn_lower_bound and self.learn_upper_bound:
            domain_shift = parameters[:, -2]
            x0 = x0 + domain_shift
            y0 = y0 + domain_shift
        elif self.learn_lower_bound:
            # Fixed upper bound: the lower bound moves with the scaled width.
            x0 = self.xf - rescaled_width[:, 0] - min_interval
            y0 = self.yf - rescaled_height[:, 0] - min_interval

        # Offset so that zero parameters give slope exactly 1.
        offset = np.log(np.exp(1.0 - self.min_slope) - 1.0)
        slopes = jax.nn.softplus(slopes + offset) + self.min_slope

        return x0, y0, widths, heights, slopes, shifts


# =============================================================================
# Functional API
# =============================================================================

def _assign_bins(x, x0, y0, widths, heights, slopes, inverse):
    """Gather per-input bin quantities (widths, knots, slopes, s=h/w).

    Adds one huge outer bin on each side of the domain so out-of-domain
    inputs are transformed linearly with the boundary slopes (reference:
    spline.py:567-650).
    """
    batch_size, n_bins, n_features = widths.shape

    cum_width = jnp.cumsum(widths, axis=1)
    cum_height = jnp.cumsum(heights, axis=1)

    x0 = jnp.broadcast_to(jnp.atleast_1d(x0), (batch_size, n_features))
    y0 = jnp.broadcast_to(jnp.atleast_1d(y0), (batch_size, n_features))

    # Outer linear-extrapolation bins, 3 orders of magnitude wider.
    dx = cum_width[:, -1] * 1000.0
    dy0 = slopes[:, 0] * dx
    dyf = slopes[:, -1] * dx

    # knots_x/y: (batch, K+3, n_features).
    knots_x = jnp.concatenate([
        (x0 - dx)[:, None], x0[:, None], x0[:, None] + cum_width,
        (x0 + cum_width[:, -1] + dx)[:, None]], axis=1)
    knots_y = jnp.concatenate([
        (y0 - dy0)[:, None], y0[:, None], y0[:, None] + cum_height,
        (y0 + cum_height[:, -1] + dyf)[:, None]], axis=1)

    slopes = jnp.concatenate([slopes[:, :1], slopes, slopes[:, -1:]], axis=1)
    widths = jnp.concatenate([dx[:, None], widths, dx[:, None]], axis=1)
    heights = jnp.concatenate([dy0[:, None], heights, dyf[:, None]], axis=1)

    knots = knots_y if inverse else knots_x
    bin_indices = jnp.sum(x[:, None, :] > knots, axis=1) - 1
    bin_indices = jnp.clip(bin_indices, 0, n_bins + 1)

    # TPU-friendly bin select: a one-hot multiply-reduce over the small
    # (K+2) knot axis instead of take_along_axis gathers. The select fuses
    # into the surrounding elementwise work on the VPU and its backward is
    # a plain multiply (no scatter), which is where the gather formulation
    # loses two orders of magnitude on TPU.
    n_select = n_bins + 2
    iota = jax.lax.broadcasted_iota(bin_indices.dtype,
                                    (1, n_select, 1), 1)
    onehot = (bin_indices[:, None, :] == iota).astype(x.dtype)

    def take(arr):
        return jnp.sum(onehot * arr[:, :n_select], axis=1)

    widths_b_f = take(widths)
    heights_b_f = take(heights)
    lower_knot_x_b_f = take(knots_x)
    lower_knot_y_b_f = take(knots_y)
    slopes_k_b_f = take(slopes)
    slopes_k1_b_f = jnp.sum(onehot * slopes[:, 1:n_select + 1], axis=1)
    s_b_f = heights_b_f / widths_b_f

    return (widths_b_f, heights_b_f, lower_knot_x_b_f, lower_knot_y_b_f,
            slopes_k_b_f, slopes_k1_b_f, s_b_f)


def _log_dy_dx(slopes_k, slopes_k1, s, eps, eps_1meps, eps2):
    numerator = s ** 2 * (slopes_k1 * eps2 + 2 * s * eps_1meps
                          + slopes_k * (1 - eps) ** 2)
    denominator = (s + (slopes_k1 + slopes_k - 2 * s) * eps_1meps) ** 2
    return jnp.log(numerator) - jnp.log(denominator)


def neural_spline_transformer(x, x0, y0, widths, heights, slopes):
    """Monotonic rational-quadratic spline; linear outside the domain.

    Functional core (reference: spline.py:424-503). All knot quantities
    must already be positive and normalized (see
    ``NeuralSplineTransformer._get_parameters``).

    Parameters
    ----------
    x : ndarray, shape (batch, n_features)
        Inputs; values outside ``[x0, x0 + sum(widths)]`` are transformed
        linearly with the boundary slopes.
    x0, y0 : ndarray, shape (n_features,) or (batch, n_features)
        Lower input/output domain bounds.
    widths, heights : ndarray, shape (batch, K, n_features)
        Positive bin widths/heights (they define the knots cumulatively).
    slopes : ndarray, shape (batch, K+1, n_features)
        Positive derivative at each knot.

    Returns
    -------
    y : ndarray, shape (batch, n_features)
        Spline values.
    log_det_J : ndarray, shape (batch,)
        Sum over features of ``log dy/dx``.
    """
    (widths_b_f, heights_b_f, lower_knot_x, lower_knot_y,
     slopes_k, slopes_k1, s) = _assign_bins(
        x, x0, y0, widths, heights, slopes, inverse=False)

    eps = (x - lower_knot_x) / widths_b_f
    eps_1meps = eps * (1 - eps)
    eps2 = eps ** 2

    numerator = heights_b_f * (s * eps2 + slopes_k * eps_1meps)
    denominator = s + (slopes_k1 + slopes_k - 2 * s) * eps_1meps
    y = lower_knot_y + numerator / denominator

    log_det_J = jnp.sum(
        _log_dy_dx(slopes_k, slopes_k1, s, eps, eps_1meps, eps2), axis=1)
    return y, log_det_J


def neural_spline_transformer_inverse(y, x0, y0, widths, heights, slopes):
    """Analytic inverse (quadratic solve) of the rational-quadratic spline.

    Same arguments as :func:`neural_spline_transformer` with ``y`` in place
    of ``x``; returns ``(x, log_det_J)`` where ``log_det_J`` is the inverse
    map's Jacobian (the negative of the forward one at ``x``). The
    quadratic is solved in the numerically stable ``2c / (-b - sqrt(...))``
    form (reference: spline.py:504-545).
    """
    (widths_b_f, heights_b_f, lower_knot_x, lower_knot_y,
     slopes_k, slopes_k1, s) = _assign_bins(
        y, x0, y0, widths, heights, slopes, inverse=True)

    y_myk = y - lower_knot_y
    dk1_dk_m2s = slopes_k1 + slopes_k - 2 * s

    a = heights_b_f * (s - slopes_k) + y_myk * dk1_dk_m2s
    b = heights_b_f * slopes_k - y_myk * dk1_dk_m2s
    c = -s * y_myk

    eps = 2 * c / (-b - jnp.sqrt(b ** 2 - 4 * a * c))
    x = eps * widths_b_f + lower_knot_x

    eps_1meps = eps * (1 - eps)
    eps2 = eps ** 2
    log_det_J = -jnp.sum(
        _log_dy_dx(slopes_k, slopes_k1, s, eps, eps_1meps, eps2), axis=1)
    return x, log_det_J
