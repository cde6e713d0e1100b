"""Device mesh construction and multi-host initialization.

Parity surface: reference trainer.py:160-178 (2-D data x model mesh over
local devices) and gaussian_diffusion.py:279-288 (1-D data mesh for
sampling). The reference is single-host only; this module adds the
multi-host/multi-slice hook (``jax.distributed.initialize``) so the same
code scales over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (no-op when already initialized or single-host).

    Call before any other JAX API in each process of a multi-host job. On a
    single process this is a no-op so single-host scripts need no changes.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    if coordinator_address is None and num_processes is None:
        # Single-host: nothing to do.
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _distributed_initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str],
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh of the given logical shape.

    Uses ``mesh_utils.create_device_mesh`` so the logical axes map onto the
    physical ICI topology (keeping the fastest-varying axis on the
    tightest-coupled links), falling back to a plain reshape for host
    platforms where topology info is unavailable.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n_needed = 1
    for s in shape:
        n_needed *= s
    if n_needed > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n_needed} devices, have {len(devices)}")
    devices = devices[:n_needed]
    try:
        device_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    except (ValueError, AssertionError):
        import numpy as np

        device_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(device_array, axis_names=tuple(axis_names))


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    """1-D ``('data',)`` mesh over local devices (reference gaussian_diffusion.py:288)."""
    n = n_devices if n_devices is not None else jax.local_device_count()
    return make_mesh((n,), ("data",), devices=jax.local_devices()[:n])


def data_model_mesh(
    n_devices: int | None = None, num_model_shards: int = 1
) -> Mesh:
    """2-D ``('data', 'model')`` mesh (reference trainer.py:176-177)."""
    n = n_devices if n_devices is not None else jax.local_device_count()
    assert n % num_model_shards == 0, (
        f"device count {n} not divisible by num_model_shards {num_model_shards}"
    )
    return make_mesh(
        (n // num_model_shards, num_model_shards),
        ("data", "model"),
        devices=jax.local_devices()[:n],
    )
