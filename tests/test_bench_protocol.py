"""Unit tests for the bench measurement protocol (no device work).

The tracked throughput figures in the driver record are only as
trustworthy as the sampling protocol that produces them, so the pure
decision logic — the below-pin fresh-process retry that absorbs the
tunnel's multi-minute slow episodes (docs/PERFORMANCE.md
"Round-over-round variance") — is pinned by tests like any other
component. The stages themselves need the TPU and are exercised by the
driver's bench run, not here.
"""

import sys

import pytest


@pytest.fixture()
def bench():
    saved_argv = sys.argv
    sys.argv = ['bench.py']
    try:
        import bench as bench_mod
    finally:
        sys.argv = saved_argv
    saved_diags = dict(bench_mod.STAGE_DIAGS)
    yield bench_mod
    bench_mod.STAGE_DIAGS.clear()
    bench_mod.STAGE_DIAGS.update(saved_diags)


def test_below_pin_triggers_retry_and_keeps_max(bench):
    pin = bench.PINNED_R03['cnf']
    low = 0.89 * pin
    bench.STAGE_DIAGS['cnf'] = {'blocks': 15}
    value = bench._below_pin_retry(low, 'cnf', lambda: pin)
    assert value == pin
    diag = bench.STAGE_DIAGS['cnf_below_pin_retry']
    assert diag == {'first': round(low, 1), 'retry': round(pin, 1)}


def test_worse_retry_keeps_first_reading_and_its_diagnostics(bench):
    pin = bench.PINNED_R03['cnf']
    first_diag = {'blocks': 15, 'best': 1.0}
    bench.STAGE_DIAGS['cnf'] = dict(first_diag)
    value = bench._below_pin_retry(0.9 * pin, 'cnf', lambda: 0.85 * pin)
    assert value == 0.9 * pin
    # The retry subprocess would have overwritten the stage diagnostics;
    # the kept reading's diagnostics must be the ones in the record.
    assert bench.STAGE_DIAGS['cnf'] == first_diag


def test_on_pin_reading_never_retries(bench):
    pin = bench.PINNED_R03['mixed']
    calls = []
    value = bench._below_pin_retry(
        0.95 * pin, 'mixed', lambda: calls.append(1) or 2 * pin)
    assert value == 0.95 * pin
    assert not calls


def test_failed_retry_returns_first_reading(bench):
    pin = bench.PINNED_R03['solvated']

    def boom():
        raise RuntimeError('tunnel flake')

    value = bench._below_pin_retry(0.5 * pin, 'solvated', boom)
    assert value == 0.5 * pin


def test_unpinned_stage_is_untouched(bench):
    calls = []
    value = bench._below_pin_retry(
        1.0, 'no-such-pin', lambda: calls.append(1) or 1e9)
    assert value == 1.0
    assert not calls


def test_headline_diag_key_indirection(bench):
    # The headline stage's sampling diagnostics live under 'jax' while
    # its pin lives under 'spline'; the retry must restore the right one.
    pin = bench.PINNED_R03['spline']
    first_diag = {'blocks': 7}
    bench.STAGE_DIAGS['jax'] = dict(first_diag)
    value = bench._below_pin_retry(
        0.9 * pin, 'spline', lambda: 0.8 * pin, diag_key='jax')
    assert value == 0.9 * pin
    assert bench.STAGE_DIAGS['jax'] == first_diag
