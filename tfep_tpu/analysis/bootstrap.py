"""Device-vectorized bootstrap analysis (scipy-like API).

All resampling happens on-device: indices are drawn with the JAX PRNG, the
gather + statistic evaluates as one batched XLA computation, and memory is
controlled by chunking resamples (``batch``). Supports percentile/basic
confidence intervals, multiple bootstrap sample sizes, ``take_first_only``
(progressively-trained-map work values) and Bayesian (Dirichlet-weighted)
bootstrap. Reference behavior: /root/reference/tfep/analysis/bootstrap.py:24-262.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['bootstrap']


def bootstrap(
        data,
        statistic: Callable,
        *,
        confidence_level: float = 0.95,
        n_resamples: int = 9999,
        bootstrap_sample_size: Optional[Union[int, List[int]]] = None,
        take_first_only: bool = False,
        batch: Optional[int] = None,
        method: str = 'percentile',
        bayesian: bool = False,
        seed: Optional[Union[int, jax.Array]] = 0,
):
    """Compute the parameters of the bootstrap distribution of a statistic.

    Parameters
    ----------
    data : array
        Shape ``(n_samples,)`` or ``(n_samples, data_dim)``.
    statistic : Callable
        Takes resampled data and a ``vectorized`` keyword; when vectorized the
        data has a leading resample axis and the return must have shape
        ``(batch,)``. With ``bayesian=True`` it must also accept ``weights``.
    confidence_level, n_resamples, bootstrap_sample_size, take_first_only,
    batch, method, bayesian :
        Same semantics as the reference (bootstrap.py:24-182).
    seed : int or jax PRNG key, optional
        Seed for resampling (replaces the reference's torch.Generator).

    Returns
    -------
    result : dict or list of dict
        Keys: ``confidence_interval`` ({'low','high'}), ``standard_deviation``,
        ``mean``, ``median``. A list when multiple sample sizes are requested.
    """
    data = jnp.asarray(data)
    n_samples = data.shape[0]

    if seed is None:
        seed = 0
    if isinstance(seed, (int, np.integer)):
        key = jax.random.key(int(seed))
    else:
        key = seed

    single_size = bootstrap_sample_size is None or isinstance(
        bootstrap_sample_size, (int, np.integer))
    if bootstrap_sample_size is None:
        sizes = [n_samples]
    elif single_size:
        sizes = [int(bootstrap_sample_size)]
    else:
        sizes = [int(s) for s in bootstrap_sample_size]
        if bayesian and not take_first_only:
            raise ValueError(
                'With Bayesian bootstrapping, specifying a '
                'bootstrap_sample_size is supported only when take_first_only '
                'is True.')
    if (bayesian and not take_first_only
            and any(s != n_samples for s in sizes)):
        raise ValueError(
            'With Bayesian bootstrapping, specifying a bootstrap_sample_size '
            'is supported only when take_first_only is True.')

    if batch is None:
        batch = n_resamples

    results = []
    for sample_size in sizes:
        stats_chunks = []
        for k in range(0, n_resamples, batch):
            batch_actual = min(batch, n_resamples - k)
            key, subkey = jax.random.split(key)
            if bayesian:
                weights = jax.random.dirichlet(
                    subkey, jnp.ones(sample_size, dtype=data.dtype),
                    shape=(batch_actual,))
                chunk_data = jnp.broadcast_to(
                    data[:sample_size],
                    (batch_actual, *data[:sample_size].shape))
                chunk = statistic(chunk_data, weights=weights,
                                  vectorized=True)
            else:
                max_idx = sample_size if take_first_only else n_samples
                idx = jax.random.randint(
                    subkey, (batch_actual, sample_size), 0, max_idx)
                chunk = statistic(data[idx], vectorized=True)
            stats_chunks.append(chunk)
        bootstrap_statistics = jnp.concatenate(
            [jnp.atleast_1d(c) for c in stats_chunks])

        alpha = (1 - confidence_level) / 2
        ci_l, ci_u = jnp.quantile(
            bootstrap_statistics,
            jnp.asarray([alpha, 1 - alpha], dtype=bootstrap_statistics.dtype))

        if method == 'basic':
            full_statistic = statistic(data[None], vectorized=True)[0]
            ci_l, ci_u = 2 * full_statistic - ci_u, 2 * full_statistic - ci_l
        elif method != 'percentile':
            raise ValueError("method must be 'percentile' or 'basic'.")

        results.append(dict(
            confidence_interval=dict(low=ci_l, high=ci_u),
            standard_deviation=jnp.std(bootstrap_statistics, ddof=1),
            mean=jnp.mean(bootstrap_statistics),
            median=jnp.median(bootstrap_statistics),
        ))

    # Like the reference (bootstrap.py:180-182), a single size returns the
    # bare dict even when it was spelled as a 1-element sequence.
    if len(results) == 1:
        return results[0]
    return results
