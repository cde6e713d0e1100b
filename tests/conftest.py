"""Test configuration: force an 8-virtual-device CPU platform.

Tests never touch the real TPU: they run on CPU with
``--xla_force_host_platform_device_count=8`` so every multi-device sharding
path (DP x TP mesh, sharded sampling) is exercised for real — something the
reference never did (its pjit paths only ever saw a 1x1 mesh in CI; see
SURVEY.md §4).

This module must run before anything imports jax, which pytest guarantees
for conftest.py at collection time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest  # noqa: E402
from flax import nnx  # noqa: E402


@pytest.fixture
def rngs() -> nnx.Rngs:
    return nnx.Rngs(0)
