"""Analysis tests: bootstrap vs scipy.stats.bootstrap and fep_estimator
analytic cases (the reference validates its bootstrap against scipy,
tests/analysis/test_bootstrap.py:74).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tfep_tpu.analysis import bootstrap, fep_estimator

rng = np.random.default_rng(42)


def mean_statistic(data, weights=None, vectorized=False):
    if weights is not None:
        return jnp.sum(data * weights, axis=-1)
    if vectorized:
        return jnp.mean(data, axis=-1)
    return jnp.mean(data)


# =============================================================================
# bootstrap vs scipy
# =============================================================================

@pytest.mark.parametrize('method', ['percentile', 'basic'])
def test_bootstrap_matches_scipy(method):
    data = rng.normal(2.0, 1.5, size=400)
    n_resamples = 4000

    ours = bootstrap(data, mean_statistic, n_resamples=n_resamples,
                     method=method, seed=1)
    ref = scipy.stats.bootstrap(
        (data,), np.mean, n_resamples=n_resamples, method=method,
        confidence_level=0.95, random_state=np.random.default_rng(1),
        vectorized=False)

    # Both are Monte Carlo estimates of the same CI: they must agree to a
    # few standard errors of the quantile estimator.
    se = data.std() / np.sqrt(len(data))
    tol = 0.25 * se * 3
    assert abs(float(ours['confidence_interval']['low'])
               - ref.confidence_interval.low) < tol
    assert abs(float(ours['confidence_interval']['high'])
               - ref.confidence_interval.high) < tol
    np.testing.assert_allclose(float(ours['standard_deviation']),
                               ref.standard_error, rtol=0.15)


def test_bootstrap_distribution_parameters():
    """Bootstrap std of the mean ~ sigma/sqrt(n); mean/median ~ sample mean."""
    sigma, n = 2.0, 1000
    data = rng.normal(5.0, sigma, size=n)
    result = bootstrap(data, mean_statistic, n_resamples=3000, seed=2)
    np.testing.assert_allclose(float(result['standard_deviation']),
                               sigma / np.sqrt(n), rtol=0.2)
    np.testing.assert_allclose(float(result['mean']), data.mean(), atol=0.05)
    np.testing.assert_allclose(float(result['median']), data.mean(),
                               atol=0.05)


def test_bootstrap_batching_equivalent():
    """Chunked resampling draws the same keys sequence -> similar results."""
    data = rng.normal(0.0, 1.0, size=200)
    full = bootstrap(data, mean_statistic, n_resamples=2000, seed=3)
    chunked = bootstrap(data, mean_statistic, n_resamples=2000, batch=128,
                        seed=3)
    np.testing.assert_allclose(float(full['mean']), float(chunked['mean']),
                               atol=0.02)


def test_bootstrap_sample_sizes_and_take_first():
    """CI width shrinks as the bootstrap sample size grows."""
    data = rng.normal(0.0, 1.0, size=1000)
    results = bootstrap(data, mean_statistic, n_resamples=1500,
                        bootstrap_sample_size=[10, 1000],
                        take_first_only=True, seed=4)
    assert isinstance(results, list) and len(results) == 2
    widths = [float(r['confidence_interval']['high'])
              - float(r['confidence_interval']['low']) for r in results]
    assert widths[0] > 3 * widths[1]


def test_bootstrap_seed_spellings_and_single_size_list():
    data = rng.normal(0.0, 1.0, size=200)
    # seed=None (the Optional hint) and numpy-integer seeds must work.
    for seed in (None, np.int64(3), 3):
        result = bootstrap(data, mean_statistic, n_resamples=50, seed=seed)
        assert np.isfinite(float(result['mean']))
    # Like the reference (bootstrap.py:180-182): a 1-element size list
    # returns the bare dict, not a 1-element list.
    result = bootstrap(data, mean_statistic, n_resamples=50,
                       bootstrap_sample_size=[100], take_first_only=True,
                       seed=0)
    assert isinstance(result, dict) and 'confidence_interval' in result


def test_bayesian_bootstrap():
    data = rng.normal(3.0, 1.0, size=500)
    result = bootstrap(data, mean_statistic, n_resamples=2000,
                       bayesian=True, seed=5)
    np.testing.assert_allclose(float(result['mean']), data.mean(), atol=0.05)
    np.testing.assert_allclose(float(result['standard_deviation']),
                               1.0 / np.sqrt(500), rtol=0.25)


def test_bayesian_with_sample_size_requires_take_first():
    data = rng.normal(size=100)
    with pytest.raises(ValueError, match='take_first_only'):
        bootstrap(data, mean_statistic, bayesian=True,
                  bootstrap_sample_size=[10, 50], n_resamples=10)


def test_bad_method_raises():
    with pytest.raises(ValueError, match='percentile'):
        bootstrap(rng.normal(size=50), mean_statistic, n_resamples=10,
                  method='bca')


# =============================================================================
# fep_estimator
# =============================================================================

def test_fep_estimator_gaussian_work():
    """For w ~ N(mu, sigma^2) in kT: -log<exp(-w)> = mu - sigma^2/2."""
    mu, sigma = 2.0, 0.5
    work = rng.normal(mu, sigma, size=200_000)
    df = float(fep_estimator(work))
    np.testing.assert_allclose(df, mu - sigma ** 2 / 2, atol=0.02)


def test_fep_estimator_kT_scaling():
    """Work in physical units with kT equals kT * estimate(work/kT)."""
    work_kT = rng.normal(1.0, 0.3, size=5000)
    kT = 0.596
    df_physical = float(fep_estimator(work_kT * kT, kT=kT))
    df_reduced = float(fep_estimator(work_kT))
    np.testing.assert_allclose(df_physical, kT * df_reduced, rtol=1e-6)


def test_fep_estimator_constant_bias_is_unbiased():
    """A constant bias gives uniform weights == the unbiased estimate."""
    work = rng.normal(0.5, 0.2, size=1000)
    bias = np.full_like(work, 3.21)
    df_biased = float(fep_estimator(np.stack([work, bias], axis=-1)))
    df_plain = float(fep_estimator(work))
    np.testing.assert_allclose(df_biased, df_plain, rtol=1e-6)


def test_fep_estimator_bias_reweights():
    """Bias favoring low-work samples must move the estimate accordingly:
    manual log-softmax reweighting reproduces the implementation."""
    work = rng.normal(0.0, 1.0, size=2000)
    bias = -work  # favor high-work frames
    df = float(fep_estimator(np.stack([work, bias], axis=-1)))
    log_w = bias - np.log(np.sum(np.exp(bias - bias.max()))) - bias.max()
    expected = -np.log(np.sum(np.exp(-work + log_w)))
    np.testing.assert_allclose(df, expected, rtol=1e-5)


def test_fep_estimator_vectorized_matches_loop():
    work = rng.normal(1.0, 0.4, size=(8, 300))
    vec = np.asarray(fep_estimator(work, vectorized=True))
    loop = np.asarray([float(fep_estimator(w)) for w in work])
    np.testing.assert_allclose(vec, loop, rtol=1e-6)

    # Vectorized with bias: trailing (work, bias) pairs.
    bias = rng.normal(size=(8, 300))
    data = np.stack([work, bias], axis=-1)
    vec = np.asarray(fep_estimator(data, vectorized=True))
    loop = np.asarray([float(fep_estimator(np.stack([w, b], axis=-1)))
                       for w, b in zip(work, bias)])
    np.testing.assert_allclose(vec, loop, rtol=1e-6)


def test_fep_estimator_uniform_weights_match_unweighted():
    work = rng.normal(size=(4, 100))
    weights = np.full((4, 100), 1.0 / 100)
    with_w = np.asarray(fep_estimator(work, weights=weights,
                                      vectorized=True))
    without = np.asarray(fep_estimator(work, vectorized=True))
    np.testing.assert_allclose(with_w, without, rtol=1e-6)


def test_fep_estimator_weights_with_bias_unsupported():
    with pytest.raises(NotImplementedError):
        fep_estimator(np.zeros((10, 2)), weights=np.ones(10) / 10)


def test_fep_estimator_rejects_transposed_biased_layout():
    """(2, n) — the reference's *documented* but non-executable layout —
    is rejected with a pointer to the (n, 2) convention."""
    with pytest.raises(ValueError, match='n_samples, 2'):
        fep_estimator(np.zeros((2, 10)))


def test_bootstrapped_fep_estimate_brackets_analytic():
    """The composed workflow: bootstrap CI of the FEP estimate brackets the
    analytic free energy for Gaussian work."""
    mu, sigma = 1.0, 0.4
    work = rng.normal(mu, sigma, size=4000)
    result = bootstrap(
        work, lambda d, weights=None, vectorized=False:
            fep_estimator(d, weights=weights, vectorized=vectorized),
        n_resamples=1000, seed=6)
    analytic = mu - sigma ** 2 / 2
    assert float(result['confidence_interval']['low']) < analytic \
        < float(result['confidence_interval']['high'])


# =============================================================================
# estimate_from_logger
# =============================================================================

def _write_logger(tmp_path, potential, log_det_j, n_batches=2):
    from tfep_tpu.io.log import TFEPLogger

    n = len(potential)
    batch = n // n_batches
    logger = TFEPLogger(save_dir_path=str(tmp_path / 'logs'),
                        batch_size=batch, n_samples_per_epoch=n)
    for b in range(n_batches):
        sl = slice(b * batch, (b + 1) * batch)
        logger.save_train_tensors({
            'dataset_sample_index': np.arange(n)[sl],
            'potential': potential[sl],
            'log_det_J': log_det_j[sl],
        }, epoch_idx=0, batch_idx=b)
    return logger


def test_estimate_from_logger_matches_manual(tmp_path):
    from tfep_tpu.analysis import estimate_from_logger

    n = 200
    potential = rng.normal(3.0, 0.5, size=n)
    log_det_j = rng.normal(0.0, 0.1, size=n)
    u_a = rng.normal(1.0, 0.2, size=n)
    logger = _write_logger(tmp_path, potential, log_det_j)

    result = estimate_from_logger(logger, epoch_idx=0,
                                  reference_potentials=u_a,
                                  n_resamples=200, seed=3)
    work = potential - log_det_j - u_a
    df_manual = float(fep_estimator(jnp.asarray(work)))
    assert result['df'] == pytest.approx(df_manual, rel=1e-6)
    assert result['n_samples'] == n
    # work rows come back aligned with sample_indices.
    np.testing.assert_allclose(
        result['work'], work[result['sample_indices']], rtol=1e-6)
    ci = result['confidence_interval']
    assert ci['low'] < df_manual < ci['high']


def test_estimate_from_logger_biased(tmp_path):
    from tfep_tpu.analysis import estimate_from_logger

    n = 100
    potential = rng.normal(2.0, 0.3, size=n)
    log_det_j = np.zeros(n)
    bias = rng.normal(0.0, 0.5, size=n)
    logger = _write_logger(tmp_path, potential, log_det_j)

    result = estimate_from_logger(logger, epoch_idx=0,
                                  bias_potentials=bias,
                                  n_resamples=100, seed=5)
    df_manual = float(fep_estimator(jnp.stack([potential, bias], axis=-1)))
    assert result['df'] == pytest.approx(df_manual, rel=1e-6)
    ci = result['confidence_interval']
    assert ci['low'] <= result['df'] <= ci['high']


def test_estimate_from_logger_requires_one_channel(tmp_path):
    from tfep_tpu.analysis import estimate_from_logger

    logger = _write_logger(tmp_path, np.ones(4), np.zeros(4), n_batches=1)
    with pytest.raises(ValueError, match='exactly one'):
        estimate_from_logger(logger)
    with pytest.raises(ValueError, match='exactly one'):
        estimate_from_logger(logger, epoch_idx=0, step_idx=0)


def test_estimate_from_logger_multimap(tmp_path):
    """A sequence of epochs stacks per-map work by frame and bootstraps
    over frames (cluster bootstrap: a frame's work under every map is
    resampled together), matching the hand-rolled recipe."""
    from tfep_tpu.analysis import estimate_from_logger
    from tfep_tpu.io.log import TFEPLogger

    n, n_epochs = 60, 3
    logger = TFEPLogger(save_dir_path=str(tmp_path / 'logs'),
                        batch_size=n, n_samples_per_epoch=n)
    all_work = []
    for epoch in range(n_epochs):
        potential = rng.normal(2.0 + 0.1 * epoch, 0.4, size=n)
        ldj = rng.normal(0.0, 0.05, size=n)
        # Shuffled write order: the multimap assembly must align frames
        # across epochs by dataset sample index.
        perm = rng.permutation(n)
        logger.save_train_tensors({
            'dataset_sample_index': perm,
            'potential': potential[perm],
            'log_det_J': ldj[perm],
        }, epoch_idx=epoch, batch_idx=0)
        all_work.append(potential - ldj)

    result = estimate_from_logger(logger, epoch_idx=range(n_epochs),
                                  n_resamples=150, seed=7)
    # (n_frames, n_maps): frame-aligned work matrix.
    work_matrix = np.stack(all_work, axis=-1)
    work = work_matrix.reshape(-1)
    assert result['n_samples'] == n * n_epochs
    # Multimap work is the frame-aligned (n_frames, n_maps) matrix, with
    # rows keyed by sample_indices and columns in requested-epoch order.
    assert result['work'].shape == (n, n_epochs)
    np.testing.assert_allclose(
        result['work'], work_matrix[result['sample_indices']], rtol=1e-6)
    assert result['df'] == pytest.approx(
        float(fep_estimator(jnp.asarray(work))), rel=1e-6)
    # Manual cluster bootstrap: resample frame rows, flatten the map axis.
    manual = bootstrap(
        jnp.asarray(work_matrix),
        lambda d, weights=None, vectorized=False:
            fep_estimator(d.reshape(*d.shape[:-2], -1),
                          weights=(None if weights is None else
                                   jnp.repeat(weights / n_epochs, n_epochs,
                                              axis=-1)),
                          vectorized=vectorized),
        n_resamples=150, seed=7)
    ci = result['confidence_interval']
    assert ci['low'] == pytest.approx(
        float(manual['confidence_interval']['low']), rel=1e-6)
    assert ci['high'] == pytest.approx(
        float(manual['confidence_interval']['high']), rel=1e-6)
    # The CI must be consistent with the point estimate it accompanies.
    assert ci['low'] <= result['df'] <= ci['high']
