"""Test env: CPU platform with 8 virtual devices for mesh/sharding tests.

This is the JAX-native way to exercise multi-device code without a cluster
(SURVEY.md §4).  The sandbox pre-registers a TPU PJRT plugin ('axon') via
sitecustomize and pins JAX_PLATFORMS=axon, so env vars alone don't stick —
we override through jax.config before any backend initializes.
"""
import os

os.environ.setdefault('JAX_ENABLE_X64', '0')
# persistent compile cache: the suite is compile-bound on small hosts
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
