"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no test suite at all (SURVEY.md §4); this pyramid is new.
Multi-chip behavior is tested on virtual CPU devices
(``--xla_force_host_platform_device_count=8``) per the build plan.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # override: env presets 'axon' (the TPU tunnel)
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# sitecustomize sets jax_platforms='axon,cpu' through jax.config, which beats
# the env var -- force CPU before any backend initializes
jax.config.update('jax_platforms', 'cpu')
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(77)  # reference config.json 'random-seed'
