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

__all__ = ['SOSPolynomialTransformer', 'sos_polynomial_transformer']


class SOSPolynomialTransformer(MAFTransformer):
    """SOS polynomial transformer with K squared first-degree polynomials."""

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
        raise NotImplementedError(
            'Inversion of SOS polynomial transformer has not been '
            'implemented yet.')

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        params = np.zeros((self.n_parameters_per_feature, n_features))
        # Identity: sum of squared constant terms must be 1, linear terms 0.
        params[1::self.parameters_per_polynomial] = np.sqrt(
            1.0 / self.n_polynomials)
        return params.reshape(-1)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.tile(np.asarray(degrees_in), self.n_parameters_per_feature)


def sos_polynomial_transformer(x, parameters):
    """Functional SOS transformer.

    ``parameters``: (batch, 1 + 2*K, n_features), ordered ``a_0, a_10, a_11,
    ..., a_K0, a_K1``. Returns (y, log_det_J).
    """
    a0 = parameters[:, 0]
    zeroth = parameters[:, 1::2]   # (batch, K, n_features)
    first = parameters[:, 2::2]

    # Coefficients of the integrated polynomial:
    # y = a0 + c1*x + c2*x^2 + c3*x^3 with
    c1 = jnp.sum(zeroth ** 2, axis=1)
    c2 = jnp.sum(zeroth * first, axis=1)
    c3 = jnp.sum(first ** 2, axis=1) / 3.0

    y = a0 + x * (c1 + x * (c2 + x * c3))
    # dy/dx = c1 + 2 c2 x + 3 c3 x^2 = sum_k (a_k0 + a_k1 x)^2 >= 0.
    grad_x = c1 + 2 * c2 * x + 3 * c3 * x ** 2
    log_det_J = jnp.sum(jnp.log(grad_x), axis=1)
    return y, log_det_J
