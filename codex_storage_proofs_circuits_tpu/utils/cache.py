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


# ---------------------------------------------------------------------------
# AOT executable cache.  The persistent compilation cache (above) skips XLA
# *backend* compilation, but jax still re-traces and re-lowers the program
# every process — for the fully-unrolled streaming-chunk jits that tracing
# is ~100 s of the 1 GB cold start.  Serializing the *compiled* executable
# (jax.experimental.serialize_executable) skips tracing, lowering AND
# compilation on reload; the cache key pins everything the executable
# depends on (jax version, backend, device kind, arg shapes, statics).

_AOT_MEM: dict = {}
_CODE_FP: str | None = None


def _code_fingerprint() -> str:
    """Digest of the package's own source tree.  The serialized executable
    embeds code compiled from these files; without this term in the key, a
    code change to a cached function would silently deserialize the OLD
    executable and return stale results (unlike the HLO-keyed persistent
    compile cache, which re-keys automatically)."""
    global _CODE_FP
    if _CODE_FP is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            if "__pycache__" in dirnames:
                dirnames.remove("__pycache__")
            for fn in sorted(filenames):
                if fn.endswith((".py", ".c", ".h")):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def _aot_key(name: str, backend, args, statics) -> str:
    import jax

    dev = jax.devices()[0]
    # CSPC_* env knobs (CSPC_NORM, CSPC_PRNG_IMPL, ...) select code paths at
    # trace time, so they are part of the executable's identity (CSPC_AOT
    # itself is harmless but cheap to include).
    env_knobs = sorted(
        (k, v) for k, v in os.environ.items() if k.startswith("CSPC_")
    )
    sig = repr(
        (
            jax.__version__,
            backend,
            getattr(dev, "device_kind", "?"),
            _code_fingerprint(),
            env_knobs,
            name,
            statics,
            [(tuple(a.shape), str(a.dtype)) for a in args],
        )
    )
    return hashlib.sha256(sig.encode()).hexdigest()[:24]


def aot_call(jitted, name: str, args: tuple, statics: tuple = (), base: str = "/root/.cache/cspc_aot"):
    """Call `jitted(*args, *statics)` through an on-disk compiled-executable
    cache.  Falls back to the plain jit call on any serialization failure
    (not every PJRT backend supports executable deserialization).  Disable
    with CSPC_AOT=0."""
    import jax

    if os.environ.get("CSPC_AOT", "1") == "0":
        return jitted(*args, *statics)
    backend = jax.default_backend()
    key = _aot_key(name, backend, args, statics)
    compiled = _AOT_MEM.get(key)
    if compiled is None:
        path = os.path.join(machine_cache_dir(base), key + ".jaxexec")
        if os.path.exists(path):
            try:
                import pickle

                from jax.experimental.serialize_executable import (
                    deserialize_and_load,
                )

                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                compiled = deserialize_and_load(payload, in_tree, out_tree)
            except Exception:
                compiled = None
        if compiled is None:
            try:
                compiled = jitted.lower(*args, *statics).compile()
                import pickle

                from jax.experimental.serialize_executable import serialize

                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(serialize(compiled), f)
                os.replace(tmp, path)
            except Exception:
                return jitted(*args, *statics)
        _AOT_MEM[key] = compiled
    try:
        return compiled(*args)
    except Exception:
        _AOT_MEM.pop(key, None)
        return jitted(*args, *statics)


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
