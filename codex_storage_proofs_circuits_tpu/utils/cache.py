"""Shared JAX compilation-cache and timing helpers (no jax imports here —
callers set JAX_COMPILATION_CACHE_DIR *before* jax is first imported)."""

from __future__ import annotations

import hashlib
import os
import platform


def machine_cache_dir(base: str) -> str:
    """Compilation-cache dir keyed by the host CPU: XLA:CPU AOT cache entries
    embed target machine features, and loading an entry compiled on a
    different machine fails with feature-mismatch errors (observed when the
    cache directory outlives the VM it was written on)."""
    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += hashlib.sha256(line.encode()).hexdigest()[:12]
                    break
    except OSError:
        pass
    return f"{base}_{tag}"


def set_default_cache_env(base: str = "/root/.cache/jax_comp") -> str:
    """Set JAX_COMPILATION_CACHE_DIR (if unset) to the machine-keyed dir."""
    path = machine_cache_dir(base)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    return os.environ["JAX_COMPILATION_CACHE_DIR"]


def enable_compile_cache(base: str = "/root/.cache/jax_comp") -> str:
    """Activate the persistent compilation cache even when jax was already
    initialized (the axon sitecustomize imports jax at interpreter startup,
    BEFORE any tool can set JAX_COMPILATION_CACHE_DIR — the env-var path
    silently never cached: the 1 GB pipeline re-paid a ~90-230 s cold
    compile in every process).  jax reads these config values at compile
    time, so setting them post-import works."""
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or machine_cache_dir(base)
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
    return path


def measure_sync_overhead(reps: int = 5) -> float:
    """Median wall-clock of a warm tiny device_get round trip.

    On the tunneled PJRT backend (axon) this is tens of ms and must be
    subtracted from dispatch-closed timing loops; on local backends it is
    microseconds.  Call only after jax is importable; warms the tunnel."""
    import time

    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1,), jnp.uint32)
    jax.device_get(x[0])  # warm (first transfer pays tunnel init)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(x[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]
