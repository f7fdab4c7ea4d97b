"""Masked Autoregressive Flow: MADE conditioner + arbitrary transformer.

Reference behaviors: /root/reference/tfep/nn/flows/maf.py:33-194 — degree
validation (consecutive values from -1/0), embedding-lifted conditioner
degrees, identity initialization through the transformer's identity
parameters, and per-degree-group inverse ordering.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from tfep_tpu.nn.conditioners.made import MADE
from tfep_tpu.nn.flows.autoregressive import AutoregressiveFlow
from tfep_tpu.nn.transformers.affine import AffineTransformer

__all__ = ['MAF']


class MAF(AutoregressiveFlow):
    """Masked Autoregressive Flow (Papamakarios et al. 2017).

    One MADE conditioner pass produces every transformer parameter in the
    forward (density-evaluation) direction; the inverse iterates one
    conditioner pass per degree group (a ``fori_loop`` on device). With
    ``initialize_identity`` (default) the untrained flow is exactly the
    identity map. Build with :meth:`create`; the forward/inverse contract
    is the :class:`~tfep_tpu.nn.flows.Flow` one.

    Generation-heavy workloads: fully-autoregressive degrees make
    :meth:`inverse` intrinsically ~n_degree_groups times the forward cost
    (measured ~145k vs ~718k frames/s on the bench config even with the
    restricted per-group evaluation). If you generate more than you
    evaluate, build ``degrees_in`` with ``generate_degrees(...,
    repeats=k)`` — coupling-style degree blocks need only
    ``ceil(n/k)`` inverse passes (~1.35M frames/s measured at two-block
    coupling; see docs/PERFORMANCE.md "generation direction").
    """

    @classmethod
    def create(cls, key, degrees_in, transformer=None,
               hidden_layers: Union[int, list] = 2,
               embedding=None, weight_norm: bool = True,
               initialize_identity: bool = True, dtype=None,
               compute_dtype=None) -> 'MAF':
        """Build a MAF layer.

        Parameters
        ----------
        key : jax.random key for parameter initialization.
        degrees_in : array-like of int, shape (n_features,)
            Autoregressive degree per input feature; must take consecutive
            values starting at 0, or -1 for conditioning features (which
            affect the output without being mapped).
        transformer : MAFTransformer, optional (default AffineTransformer).
        hidden_layers : int | list[int] | list[array], optional
            MADE hidden-layer spec (see :meth:`MADE.create`).
        embedding : MAFEmbedding, optional
            Input lift applied before the conditioner (e.g. periodic cos/sin).
        weight_norm : bool, optional
        initialize_identity : bool, optional
        compute_dtype : str or dtype, optional
            Mixed-precision policy for the conditioner matmuls (e.g.
            ``'bfloat16'`` for the TPU MXU). Parameters and the transformer
            math stay in the storage dtype; only matmul operands are cast,
            with float32 accumulation.
        """
        if transformer is None:
            transformer = AffineTransformer()

        degrees_in = np.asarray(degrees_in)
        min_d, max_d = int(degrees_in.min()), int(degrees_in.max())
        if (set(degrees_in.tolist()) != set(range(min_d, max_d + 1))
                or min_d not in (-1, 0)):
            raise ValueError(
                'degrees_in must assume consecutive values starting from 0 '
                '(or -1 for conditioning input features).')

        if embedding is None:
            degrees_in_embedded = degrees_in
        else:
            degrees_in_embedded = embedding.get_degrees_out(degrees_in)

        # Feature groups in inverse-evaluation order.
        transformer_indices = [np.nonzero(degrees_in == d)[0]
                               for d in range(max_d + 1)]

        # Conditioner output degrees only for transformed inputs.
        degrees_out = transformer.get_degrees_out(degrees_in[degrees_in != -1])

        conditioner = MADE.create(
            key, degrees_in=degrees_in_embedded, degrees_out=degrees_out,
            hidden_layers=hidden_layers, weight_norm=weight_norm,
            embedding=embedding, dtype=dtype, compute_dtype=compute_dtype)

        # Per-degree-group conditioner-output rows: a parameter row's
        # degree equals its feature's degree, so the rows of degree d are
        # exactly degree-group d's transformer parameters — regardless of
        # the transformer's layout. Powers the layout-agnostic restricted
        # inverse (AutoregressiveFlow.inverse) for transformers without
        # slice_features (e.g. the mixed map's MixedTransformer).
        inverse_param_rows = [np.nonzero(degrees_out == d)[0]
                              for d in range(max_d + 1)]

        return super().create(
            n_features_in=len(degrees_in),
            transformer_indices=transformer_indices,
            conditioner=conditioner,
            transformer=transformer,
            initialize_identity=initialize_identity,
            inverse_param_rows=inverse_param_rows,
        )

    def n_parameters(self) -> int:
        return self.conditioner.n_parameters()
