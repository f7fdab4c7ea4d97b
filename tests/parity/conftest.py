"""Shared fixtures for the reference-parity tests.

Everything here runs the actual PyTorch reference from ``/root/reference``
as a numerical oracle (see ``refbridge`` for why and how).  Both frameworks
are pinned to float64 so agreement can be asserted to ~1e-12 and any
divergence is a *convention* difference, not roundoff.
"""

import pytest

from refbridge import import_reference


@pytest.fixture(scope='session')
def ref():
    """The imported reference ``tfep`` package (skips if unavailable)."""
    tfep = import_reference()
    import torch
    torch.set_default_dtype(torch.float64)
    return tfep
