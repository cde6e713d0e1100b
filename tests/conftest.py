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

# Force CPU even when the ambient environment pins JAX_PLATFORMS to a TPU
# platform (tests must be hermetic and multi-device). Override with
# VDT_TEST_PLATFORM to run the suite against real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("VDT_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter start (before this
# conftest), so jax has already cached JAX_PLATFORMS from the ambient env.
# Backend initialization is still lazy at collection time, so updating the
# config here reliably redirects the suite to CPU.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# The suite's ~57-minute wall-clock is dominated by CPU jit compiles of
# trainer/distill/sampler programs. The persistent compilation cache makes
# re-runs load those executables from disk (the axon-incompatibility only
# applies to the real-TPU tunnel, which this CPU-redirected process never
# touches — utils/compile_cache.py checks the config-selected platform).
from video_diffusion_nnx_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402
from flax import nnx  # noqa: E402

# ---- fast/slow tiers ----
# tests/slow_tests.txt lists every test measured >= 15 s on the round-4
# full run (the 61 of them sum to ~43 of the suite's ~57 minutes —
# compile-heavy trainer/distill/guidance/multihost programs). The fast
# tier is the remaining ~300 tests in under 15 minutes:
#
#     python -m pytest tests/ -q -m "not slow"      # fast tier, <15 min
#     python -m pytest tests/ -q                    # everything, ~57 min
#
# Regenerate after adding heavy tests:
#     python -m pytest tests/ -q --durations=0 2>&1 \
#       | grep -E '^[0-9.]+s call' | awk '$1+0>=15{print $3}' | sort \
#       > tests/slow_tests.txt
_SLOW_LIST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "slow_tests.txt")
with open(_SLOW_LIST) as _f:
    _SLOW_IDS = frozenset(line.strip() for line in _f if line.strip())


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: measured >= 15 s on the reference full run"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rngs() -> nnx.Rngs:
    return nnx.Rngs(0)
