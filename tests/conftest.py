"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Must set XLA flags before jax initializes its backends, hence the env mutation
at import time (pytest imports conftest before test modules).
"""

import os

# Force CPU with 8 virtual devices so sharding tests exercise a real mesh.
# (The session environment pins JAX_PLATFORMS to the TPU platform, so this
# must be an unconditional override, not a setdefault.)
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, which latches
# JAX_PLATFORMS before this conftest runs — override through the config API.
jax.config.update('jax_platforms', 'cpu')

# Double precision for tight invertibility/Jacobian tolerances (the reference
# test suite also forces float64, cf. tests/app/test_maps.py:53-58).
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the suite compiles many parametrized flow
# variants; caching makes repeat runs dramatically faster.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_tfep_tests')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
