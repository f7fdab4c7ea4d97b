"""Sum-of-squares polynomial transformer (Jaini et al. 2019).

``y_i = a_0 + int_0^{x_i} sum_k (a_k0 + a_k1 z)^2 dz`` — guaranteed monotone
for any parameters. Only degree-1 inner polynomials are supported (the only
case with an analytic inverse; degree-0 reduces to the affine transformer).
Unlike the reference's hand-written autograd Function
(/root/reference/tfep/nn/transformers/sos.py:163-306), the JAX version is a
plain differentiable expression — XLA fuses the polynomial evaluation and
autodiff produces the same gradients.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import static
from tfep_tpu.nn.transformers.transformer import MAFTransformer

__all__ = ['SOSPolynomialTransformer', 'sos_polynomial_transformer',
           'sos_polynomial_transformer_inverse']


class SOSPolynomialTransformer(MAFTransformer):
    """SOS polynomial transformer with K squared first-degree polynomials.

    Each feature is mapped by ``y = a_0 + int_0^x sum_k (a_k0 + a_k1 z)^2 dz``
    — monotone by construction for *any* conditioner output, so no parameter
    constraints are needed (reference:
    /root/reference/tfep/nn/transformers/sos.py:28-162). Consumes
    ``1 + 2 * n_polynomials`` parameters per feature, ordered
    ``a_0, a_10, a_11, ..., a_K0, a_K1``.

    Parameters
    ----------
    n_polynomials : int, optional
        Number K >= 2 of squared degree-1 polynomials summed (default 2).

    Notes
    -----
    Unlike the reference, :meth:`inverse` is implemented (analytically —
    Cardano on the monotone cubic plus a Newton polish).
    """

    n_polynomials: int = static(default=2)

    @classmethod
    def create(cls, n_polynomials: int = 2) -> 'SOSPolynomialTransformer':
        if n_polynomials < 2:
            raise ValueError('n_polynomials must be strictly greater than 1.')
        return cls(n_polynomials=int(n_polynomials))

    @property
    def degree_polynomials(self) -> int:
        return 1

    @property
    def parameters_per_polynomial(self) -> int:
        return self.degree_polynomials + 1

    @property
    def n_parameters_per_feature(self) -> int:
        return self.parameters_per_polynomial * self.n_polynomials + 1

    def forward(self, x, parameters):
        batch_size = parameters.shape[0]
        parameters = parameters.reshape(
            batch_size, self.n_parameters_per_feature, -1)
        return sos_polynomial_transformer(x, parameters)

    def inverse(self, y, parameters):
        """Analytic inverse (beyond reference parity).

        The reference raises ``NotImplementedError`` here
        (/root/reference/tfep/nn/transformers/sos.py:113); the degree-1 SOS
        integrates to a *monotone cubic*, which has a unique real root with
        a closed form — see :func:`sos_polynomial_transformer_inverse`.
        """
        batch_size = parameters.shape[0]
        parameters = parameters.reshape(
            batch_size, self.n_parameters_per_feature, -1)
        return sos_polynomial_transformer_inverse(y, parameters)

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        params = np.zeros((self.n_parameters_per_feature, n_features))
        # Identity: sum of squared constant terms must be 1, linear terms 0.
        params[1::self.parameters_per_polynomial] = np.sqrt(
            1.0 / self.n_polynomials)
        return params.reshape(-1)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.tile(np.asarray(degrees_in), self.n_parameters_per_feature)

    def slice_features(self, feature_indices) -> 'SOSPolynomialTransformer':
        """Feature-subset view (stateless: the transformer itself)."""
        return self


def sos_polynomial_transformer(x, parameters):
    """Functional SOS transformer (reference: sos.py:163-306).

    Parameters
    ----------
    x : ndarray, shape (batch, n_features)
        Input features.
    parameters : ndarray, shape (batch, 1 + 2*K, n_features)
        Polynomial coefficients ordered ``a_0, a_10, a_11, ..., a_K0, a_K1``.

    Returns
    -------
    y : ndarray, shape (batch, n_features)
        ``a_0 + c_1 x + c_2 x^2 + c_3 x^3`` with the c's induced by the
        squared polynomials (monotone increasing in ``x``).
    log_det_J : ndarray, shape (batch,)
        ``sum_i log dy_i/dx_i``.
    """
    a0, c1, c2, c3 = _sos_coefficients(parameters)
    y = a0 + x * (c1 + x * (c2 + x * c3))
    # dy/dx = c1 + 2 c2 x + 3 c3 x^2 = sum_k (a_k0 + a_k1 x)^2 >= 0.
    grad_x = c1 + 2 * c2 * x + 3 * c3 * x ** 2
    log_det_J = jnp.sum(jnp.log(grad_x), axis=1)
    return y, log_det_J


def _sos_coefficients(parameters):
    """Coefficients of the integrated polynomial y = a0 + c1 x + c2 x^2
    + c3 x^3 from the packed (batch, 1 + 2*K, n_features) parameters —
    the single place encoding the interleaved a_k0/a_k1 layout."""
    a0 = parameters[:, 0]
    zeroth = parameters[:, 1::2]   # (batch, K, n_features)
    first = parameters[:, 2::2]
    c1 = jnp.sum(zeroth ** 2, axis=1)
    c2 = jnp.sum(zeroth * first, axis=1)
    c3 = jnp.sum(first ** 2, axis=1) / 3.0
    return a0, c1, c2, c3


def sos_polynomial_transformer_inverse(y, parameters):
    """Invert the degree-1 SOS transformer analytically.

    The forward map is the monotone cubic
    ``y = a0 + c1 x + c2 x^2 + c3 x^3`` whose derivative
    ``sum_k (a_k0 + a_k1 x)^2`` is non-negative everywhere, so exactly one
    real root exists: Cardano's formula on the depressed cubic (the
    discriminant is non-negative for monotone cubics), followed by three
    Newton steps to polish float conditioning when ``c3`` is small. When
    every linear coefficient is zero the map is affine and inverted
    directly. ``parameters``: (batch, 1 + 2*K, n_features). Returns
    ``(x, log_det_J)`` with ``log_det_J = -sum log dy/dx`` evaluated at the
    recovered ``x``.
    """
    a0, c1, c2, c3 = _sos_coefficients(parameters)

    d = a0 - y                      # c3 x^3 + c2 x^2 + c1 x + d = 0
    eps = jnp.finfo(y.dtype).eps
    # Cardano's intermediates involve (c2/c3)^6 and (d/c3)^2, which overflow
    # when c3 is small but nonzero (e.g. near-identity parameters where the
    # linear coefficients are ~1e-7). Take the cubic branch only when c3 is
    # non-negligible against the other coefficients: by Cauchy-Schwarz
    # c2^2 <= 3*c1*c3, so below this threshold the quadratic term is
    # negligible too and the linear start is within sqrt(eps) relative
    # error — which the Newton polish then squares away.
    is_cubic = c3 > eps * (c1 + jnp.abs(c2) + jnp.abs(d))

    # Affine branch (all a_k1 = 0 implies c2 = 0 as well): x = -d / c1.
    x_linear = -d / jnp.maximum(c1, eps)

    # Cardano branch on the monic cubic x^3 + b x^2 + c x + e = 0.
    safe_c3 = jnp.where(is_cubic, c3, 1.0)
    b = c2 / safe_c3
    c = c1 / safe_c3
    e = d / safe_c3
    shift = b / 3.0
    p = c - b * b / 3.0
    q = 2.0 * b ** 3 / 27.0 - b * c / 3.0 + e
    # Monotonicity guarantees a single real root => discriminant >= 0
    # (clamped against float round-off).
    disc = jnp.maximum((q / 2.0) ** 2 + (p / 3.0) ** 3, 0.0)
    s = jnp.sqrt(disc)
    t = jnp.cbrt(-q / 2.0 + s) + jnp.cbrt(-q / 2.0 - s)
    x = jnp.where(is_cubic, t - shift, x_linear)

    # Newton polish: cheap, vectorized, and repairs the cancellation-prone
    # Cardano cube roots near triple roots / tiny c3.
    for _ in range(3):
        f = a0 + x * (c1 + x * (c2 + x * c3)) - y
        fp = c1 + 2.0 * c2 * x + 3.0 * c3 * x ** 2
        x = x - f / jnp.maximum(fp, eps)

    grad_x = c1 + 2.0 * c2 * x + 3.0 * c3 * x ** 2
    log_det_J = -jnp.sum(jnp.log(grad_x), axis=1)
    return x, log_det_J
