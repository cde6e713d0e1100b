"""Persistent-compilation-cache plumbing (CPU backend).

The axon-backend incompatibility (fetch hangs) is environment-specific and
documented in utils/compile_cache.py; here the CPU path proves the cache is
actually wired: enabling it populates the directory, and the axon guard
no-ops when the axon platform is selected.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from video_diffusion_nnx_tpu.utils.compile_cache import enable_compilation_cache


def test_cache_dir_populated(tmp_path, monkeypatch):
    cache_dir = tmp_path / "xla_cache"
    result = enable_compilation_cache(str(cache_dir))
    try:
        assert result == str(cache_dir)
        x = jnp.ones((128, 128))
        jax.jit(lambda x: (x @ x).sum() * 3)(x).block_until_ready()
        entries = list(cache_dir.iterdir())
        assert entries, "compilation cache wrote no entries"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_axon_platform_guard(monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert enable_compilation_cache(str(tmp_path / "never")) is None
    assert not (tmp_path / "never").exists()


def test_env_var_override(monkeypatch, tmp_path):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("VDN_COMPILATION_CACHE_DIR", str(tmp_path / "from_env"))
    try:
        assert enable_compilation_cache() == str(tmp_path / "from_env")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
