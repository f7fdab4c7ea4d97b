"""Execute the doctest examples embedded in module docstrings.

The reference CI runs ``pytest --doctest-modules`` over the package
(.github/workflows/CI.yaml); here the modules carrying examples are
enumerated so a new example in any of them runs automatically while
jax-heavy modules stay out of doctest collection.
"""

import doctest

import pytest

import tfep_tpu.nn.conditioners.made
import tfep_tpu.parallel.cli
import tfep_tpu.parallel.launcher
import tfep_tpu.potentials.gromacs
import tfep_tpu.potentials.mimic
import tfep_tpu.utils.misc


@pytest.mark.parametrize('module', [
    tfep_tpu.nn.conditioners.made,
    tfep_tpu.parallel.cli,
    tfep_tpu.parallel.launcher,
    tfep_tpu.potentials.gromacs,
    tfep_tpu.potentials.mimic,
    tfep_tpu.utils.misc,
], ids=lambda m: m.__name__)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False,
                              optionflags=doctest.NORMALIZE_WHITESPACE)
    assert results.failed == 0, f'{results.failed} doctest failures'
    assert results.attempted > 0, 'expected at least one doctest example'
