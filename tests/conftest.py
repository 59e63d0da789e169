"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes its backends, so this happens at
conftest import time (pytest imports conftest before test modules).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms='axon,cpu' at interpreter
# startup; override it back to CPU for the test suite (8 virtual devices).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = pathlib.Path('/root/reference')


@pytest.fixture(scope='session')
def reference_abdock():
    """Import the reference AbDock torch package for golden-parity checks.

    Skips if the reference checkout or torch is unavailable, so the test
    suite remains self-contained outside this build environment.
    """
    root = REFERENCE_ROOT / 'AbDock'
    if not root.exists():
        pytest.skip('reference checkout not available')
    torch = pytest.importorskip('torch')
    import sys
    if str(root) not in sys.path:
        sys.path.insert(0, str(root))
    return root, torch


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
