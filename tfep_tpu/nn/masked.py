"""Masked linear layers for autoregressive conditioners.

TPU-first design: instead of a custom autograd Function masking gradients
(the reference's ``MaskedLinearFunc``, /root/reference/tfep/nn/masked.py:220-305),
the mask is folded into the weight at apply time (``W_eff = where(mask, W, 0)``).
XLA fuses the select into the matmul operand and autodiff masks the gradient
for free. Weight normalization is computed over the masked weight with a
zero-norm guard, replacing the reference's NaN-safe gradient hooks
(/root/reference/tfep/nn/masked.py:312-440) with plain algebra that is safe
under autodiff.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import Module, buffer, static

__all__ = ['create_autoregressive_mask', 'MaskedLinear']


def create_autoregressive_mask(
        degrees_in: np.ndarray,
        degrees_out: np.ndarray,
        strictly_less: bool = True,
        transpose: bool = False,
) -> np.ndarray:
    """Create the autoregressive connectivity mask between two layers.

    ``mask[i, j]`` is True when input ``i`` feeds output ``j`` (or transposed
    when ``transpose=True``). Output nodes connect to inputs of strictly lower
    degree when ``strictly_less`` (MADE output layer), else lower-or-equal
    (hidden layers). Host-side, numpy; reference behavior:
    /root/reference/tfep/nn/masked.py:36-108.

    Parameters
    ----------
    degrees_in : ndarray of int, shape (n_in,)
        Autoregressive degree of each input node (-1 marks conditioning
        inputs every output may see).
    degrees_out : ndarray of int, shape (n_out,)
        Degree of each output node.
    strictly_less : bool, optional
        Use ``>`` (output layer) instead of ``>=`` (hidden layers).
    transpose : bool, optional
        Return the ``(n_out, n_in)`` layout used by the weight matrix
        instead of ``(n_in, n_out)``.

    Returns
    -------
    mask : ndarray of bool
        The connectivity mask.
    """
    degrees_in = np.asarray(degrees_in)
    degrees_out = np.asarray(degrees_out)
    if transpose:
        if strictly_less:
            mask = degrees_out[:, None] > degrees_in[None, :]
        else:
            mask = degrees_out[:, None] >= degrees_in[None, :]
    else:
        if strictly_less:
            mask = degrees_out[None, :] > degrees_in[:, None]
        else:
            mask = degrees_out[None, :] >= degrees_in[:, None]
    return mask


class MaskedLinear(Module):
    """Masked dense layer ``y = x @ (M o W)^T + b``, with optional weight norm.

    With ``weight_norm=True`` the effective weight is
    ``W = g * (M o V) / ||M o V||_row`` (norm over the input axis per output
    row); rows whose mask is entirely False produce zero weights with safe
    gradients. Setting ``g = 0`` (or ``W = 0`` without weight norm) makes the
    layer output its bias — the hook used for identity initialization
    (reference contract: /root/reference/tfep/nn/conditioners/made.py:358-364).
    """

    weight: jnp.ndarray                 # (out, in) — V when weight_norm
    bias: Optional[jnp.ndarray]         # (out,)
    gain: Optional[jnp.ndarray]         # (out, 1) weight-norm g, or None
    mask: Optional[jnp.ndarray] = buffer()   # bool (out, in), or None (dense)
    degrees_in: Optional[jnp.ndarray] = buffer(default=None)   # int32 (in,)
    degrees_out: Optional[jnp.ndarray] = buffer(default=None)  # int32 (out,)
    strictly_less: bool = static(default=False)
    use_weight_norm: bool = static(default=False)
    compute_dtype: Optional[str] = static(default=None)  # e.g. 'bfloat16'

    @classmethod
    def create(cls, key, in_features: int, out_features: int,
               mask: Optional[np.ndarray] = None, bias: bool = True,
               weight_norm: bool = False, dtype=None,
               compute_dtype: Optional[str] = None,
               degrees_in: Optional[np.ndarray] = None,
               degrees_out: Optional[np.ndarray] = None,
               strictly_less: bool = False):
        """Initialize like torch.nn.Linear (Kaiming-uniform), masked.

        Connectivity can be given either as an explicit ``mask`` (bool
        ``(out, in)``) or — preferred for large layers — as the two degree
        vectors ``degrees_in``/``degrees_out`` (+``strictly_less``), from
        which the mask is recomputed on the fly at apply time. The lazy
        form stores O(in + out) integers instead of an O(in x out) buffer:
        at solvated-system scale the materialized output-layer mask is
        hundreds of MB of host build time, host->device transfer, and
        per-step HBM reads, while XLA fuses the on-the-fly comparison into
        the matmul operand for free.
        """
        if mask is not None and degrees_in is not None:
            raise ValueError('Pass either mask or degrees_in/degrees_out, '
                             'not both.')
        if (degrees_in is None) != (degrees_out is None):
            raise ValueError('degrees_in and degrees_out must be passed '
                             'together.')
        if dtype is None:
            dtype = jnp.result_type(float)
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / np.sqrt(in_features) if in_features > 0 else 0.0
        weight = jax.random.uniform(
            wkey, (out_features, in_features), dtype, -bound, bound)
        bias_arr = (jax.random.uniform(bkey, (out_features,), dtype, -bound,
                                       bound) if bias else None)
        mask_arr = None
        if mask is not None:
            mask_arr = jnp.asarray(np.asarray(mask, dtype=bool))
        din = dout = None
        if degrees_in is not None:
            din = jnp.asarray(np.asarray(degrees_in, dtype=np.int32))
            dout = jnp.asarray(np.asarray(degrees_out, dtype=np.int32))
        layer = cls(weight=weight, bias=bias_arr, gain=None, mask=mask_arr,
                    degrees_in=din, degrees_out=dout,
                    strictly_less=strictly_less,
                    use_weight_norm=weight_norm, compute_dtype=compute_dtype)
        if weight_norm:
            eff_mask = layer._mask_array()
            masked_w = weight if eff_mask is None else jnp.where(
                eff_mask, weight, 0.0)
            norms = jnp.linalg.norm(masked_w, axis=1, keepdims=True)
            layer = layer.replace(gain=norms.astype(dtype))
        return layer

    def _mask_array(self) -> Optional[jnp.ndarray]:
        """The (out, in) connectivity, materialized lazily if degree-based."""
        if self.mask is not None:
            return self.mask
        if self.degrees_out is not None:
            cmp = jnp.greater if self.strictly_less else jnp.greater_equal
            return cmp(self.degrees_out[:, None], self.degrees_in[None, :])
        return None

    @property
    def in_features(self) -> int:
        return self.weight.shape[1]

    @property
    def out_features(self) -> int:
        return self.weight.shape[0]

    def effective_weight(self) -> jnp.ndarray:
        w = self.weight
        mask = self._mask_array()
        if mask is not None:
            w = jnp.where(mask, w, 0.0)
        if self.use_weight_norm:
            norms = jnp.linalg.norm(w, axis=1, keepdims=True)
            safe = jnp.where(norms > 0.0, norms, 1.0)
            w = self.gain * w / safe
        return w

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.effective_weight()
        if self.compute_dtype is not None:
            # Mixed-precision matmul: parameters/master copies stay in the
            # storage dtype; operands are cast down (e.g. bfloat16 for the
            # TPU MXU) with float32 accumulation.
            cd = jnp.dtype(self.compute_dtype)
            y = jax.lax.dot_general(
                x.astype(cd), w.astype(cd).T,
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
        else:
            y = x @ w.T
        if self.bias is not None:
            y = y + self.bias
        return y

    def n_parameters(self) -> int:
        """Number of unmasked trainable parameters (reference parity)."""
        if self.mask is not None:
            n = int(np.sum(np.asarray(self.mask)))
        elif self.degrees_out is not None:
            # Count without materializing the mask: for each output row,
            # the number of inputs with degree < (or <=) its degree.
            din = np.sort(np.asarray(self.degrees_in))
            dout = np.asarray(self.degrees_out)
            side = 'left' if self.strictly_less else 'right'
            n = int(np.searchsorted(din, dout, side=side).sum())
        else:
            n = self.weight.size
        if self.bias is not None:
            n += self.bias.size
        if self.gain is not None:
            n += self.gain.size
        return n

    def set_output(self, output: jnp.ndarray) -> 'MaskedLinear':
        """Return a copy that constantly outputs ``output`` (identity init)."""
        output = jnp.asarray(output, dtype=self.weight.dtype)
        if self.use_weight_norm:
            return self.replace(gain=jnp.zeros_like(self.gain), bias=output)
        return self.replace(weight=jnp.zeros_like(self.weight), bias=output)

    def restrict_rows(self, rows: jnp.ndarray) -> 'MaskedLinear':
        """A view of the layer computing only the given output rows.

        ``rows`` may be a traced index array (dynamic values, static
        shape), so this works inside scans — e.g. the autoregressive
        inverse, where each iteration needs only one degree-group's
        parameters and the full output matmul would waste ~(n_groups-1)/
        n_groups of the layer's FLOPs. Weight normalization is per output
        row, so restricting rows computes exactly the corresponding rows
        of the full layer's output (duplicate indices are allowed and
        yield duplicate outputs).
        """
        return self.replace(
            weight=self.weight[rows],
            bias=None if self.bias is None else self.bias[rows],
            gain=None if self.gain is None else self.gain[rows],
            mask=None if self.mask is None else self.mask[rows],
            degrees_out=(None if self.degrees_out is None
                         else self.degrees_out[rows]))
