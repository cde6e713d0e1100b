"""Persistent XLA compilation cache.

On this toolchain every TPU compile goes through a remote-compile server and
costs 1-5 minutes per (shape, static-config) program variant; without a
persistent cache that price is re-paid on every process start (train,
sample, bench each recompile the same programs). Enabling
``jax_compilation_cache_dir`` serializes compiled executables to disk so the
second process start loads them in milliseconds.

The reference has no equivalent (it is a research repo that eats the
recompiles); for a production TPU framework this is table stakes.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

# Shared across train/sample/bench by default so a sampler compiled by
# bench.py is a cache hit for sample.py. Override per-run with the
# VDN_COMPILATION_CACHE_DIR env var or the trainer config knob.
_DEFAULT_CACHE_DIR = "~/.cache/video_diffusion_nnx_tpu/xla-{host}"


def _host_fingerprint() -> str:
    """Short hash of the host's CPU feature set.

    XLA:CPU serializes AOT results compiled for the BUILD machine's exact
    feature flags; loading them on a host with different features logs a
    SIGILL warning per entry and can actually crash (measured: a cache
    populated on an avx512-bf16+amx host spammed `cpu_aot_loader.cc` errors
    when reused on this machine). Keying the default cache dir by the CPU
    fingerprint makes every host get its own cache instead of tripping on
    a predecessor's.
    """
    import hashlib
    import platform

    desc = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    desc += " " + line
                    break
    except OSError:
        pass
    return hashlib.sha1(desc.encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument > ``VDN_COMPILATION_CACHE_DIR`` env
    var > the shared per-user default. Returns the directory in use, or
    ``None`` if the cache could not be enabled (old jax, read-only FS) —
    failure is never fatal, it just means compiles are re-paid.
    """
    import jax

    # The axon plugin registers its devices as plain "tpu", so the backend
    # name can't identify it — the platform *selection* can. An explicit
    # jax.config value overrides the env var (jax's own precedence): a
    # process redirected to CPU via jax.config.update (tests, dry-runs)
    # is NOT on axon even when the ambient env still pins it.
    selected = str(getattr(jax.config, "jax_platforms", "") or "") or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    if "axon" in selected:
        # Measured on this toolchain: with the persistent cache enabled on
        # the axon (tunneled remote-compile) backend, EVERY device->host
        # fetch after executing a cache-affected program hangs forever —
        # both on the cache-write run and on cache-hit runs. The cache is
        # sound on real local TPU/CPU backends; disable it here.
        logger.warning(
            "persistent compilation cache disabled: incompatible with the "
            "axon remote-compile backend (buffer fetches hang)"
        )
        return None

    if not cache_dir:
        cache_dir = os.environ.get("VDN_COMPILATION_CACHE_DIR") or _DEFAULT_CACHE_DIR
    if "{host}" in cache_dir:
        cache_dir = cache_dir.replace("{host}", _host_fingerprint())
    path = Path(cache_dir).expanduser().resolve()
    try:
        path.mkdir(parents=True, exist_ok=True)
        previous = getattr(jax.config, "jax_compilation_cache_dir", None)
        jax.config.update("jax_compilation_cache_dir", str(path))
        if previous and previous != str(path):
            # jax binds its cache singleton to the first directory it
            # initializes; a config update alone won't re-point an
            # already-created cache (writes keep landing in the old dir).
            try:
                from jax._src import compilation_cache

                compilation_cache.reset_cache()
            except Exception:  # pragma: no cover - private API drift
                logger.warning(
                    "could not reset jax's compilation-cache singleton; "
                    "cache writes may continue to %s", previous
                )
        # Cache everything: the default min-compile-time gate (1s) would
        # skip small programs, but over the remote-compile tunnel even those
        # cost seconds of round trip.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - depends on jax version/FS
        logger.warning("persistent compilation cache not enabled: %s", e)
        return None
    logger.info("persistent compilation cache at %s", path)
    return str(path)
