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
    """jax.config's platform selection outranks the env var (jax's own
    precedence): the guard fires on a config-selected axon even with a
    clean env, and on an env-selected axon only when the config doesn't
    override it — the suite itself runs with config='cpu' under an
    ambient axon env and must keep its cache."""
    prev = jax.config.jax_platforms  # 'cpu' (conftest)
    try:
        jax.config.update("jax_platforms", "axon")
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        assert enable_compilation_cache(str(tmp_path / "never")) is None
        assert not (tmp_path / "never").exists()

        jax.config.update("jax_platforms", None)
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        assert enable_compilation_cache(str(tmp_path / "never2")) is None
        assert not (tmp_path / "never2").exists()
    finally:
        jax.config.update("jax_platforms", prev)

    # Config-redirected-to-CPU under an ambient axon env: cache allowed.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    try:
        assert enable_compilation_cache(str(tmp_path / "ok")) == str(tmp_path / "ok")
    finally:
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        enable_compilation_cache()  # re-point at the suite's default dir


def test_env_var_override(monkeypatch, tmp_path):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("VDN_COMPILATION_CACHE_DIR", str(tmp_path / "from_env"))
    try:
        assert enable_compilation_cache() == str(tmp_path / "from_env")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_default_dir_is_host_keyed(monkeypatch, tmp_path):
    """The default cache dir embeds a host-CPU fingerprint: XLA:CPU AOT
    entries are feature-flag-specific, and loading a different host's
    entries logs SIGILL warnings per entry (measured — see
    compile_cache._host_fingerprint)."""
    from video_diffusion_nnx_tpu.utils import compile_cache

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("VDN_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setattr(
        compile_cache, "_DEFAULT_CACHE_DIR", str(tmp_path / "xla-{host}")
    )
    fp = compile_cache._host_fingerprint()
    assert fp and len(fp) == 10
    try:
        assert enable_compilation_cache() == str(tmp_path / f"xla-{fp}")
    finally:
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        enable_compilation_cache()  # re-point at the suite's default dir
