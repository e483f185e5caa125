"""Persistent XLA compilation cache for pvot entry points.

Compiling the chunked tracking scan is expensive — on the remote-relay TPU
test harness a cold 720p/chunk-256 scan compile measured ~700 s, repeated
by every fresh process.  JAX's persistent compilation cache removes that:
the compiled executable round-trips through a local directory, and a
second process reuses it (measured 1.27 s -> 0.27 s cross-process on the
relay; the big scans drop from minutes to seconds).

The CLI and the benchmarks enable this by default; library users call
enable_compilation_cache() themselves (it must run before the first
device computation).  Opt out with PVOT_JAX_CACHE=0; point elsewhere with
PVOT_JAX_CACHE=/path.
"""

from __future__ import annotations

import os
import threading

_cache_write_lock = threading.Lock()
_write_lock_installed = False


def _serialize_cache_writes() -> None:
    """Serialize persistent-cache writes across host threads.

    pvot compiles from worker threads (geometry groups in
    pvot.io.serving.serve_streams_grouped; devices= fan-out), and a
    cold-cache full-test run segfaulted inside
    jax._src.compilation_cache.put_executable_and_time ->
    executable.serialize() while a grouped-serving compile wrote its cache
    entry from a ThreadPoolExecutor worker (faulthandler dump in the
    round-4 log).  Cache writes are rare (first compile of a program
    only), so a process-wide lock around the write path costs nothing at
    steady state.  Best-effort: if the internal module moves, skip — the
    cache still works, only the write path is unguarded again.
    """
    global _write_lock_installed
    if _write_lock_installed:
        return
    try:
        from jax._src import compilation_cache as cc

        inner = cc.put_executable_and_time

        def locked_put(*args, **kwargs):
            with _cache_write_lock:
                return inner(*args, **kwargs)

        cc.put_executable_and_time = locked_put
        _write_lock_installed = True
    except (ImportError, AttributeError):
        pass


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent).

    Returns the cache directory, or None when disabled via PVOT_JAX_CACHE=0.
    """
    env = os.environ.get("PVOT_JAX_CACHE")
    if env == "0":
        return None
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.expanduser("~"), ".cache", "pvot", "jax"
        )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took real compile time; the default threshold
    # (1 s) already covers the tracking scans, but small helper jits are
    # cheap to store and save relay round trips too.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _serialize_cache_writes()
    return cache_dir
