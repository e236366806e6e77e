"""Sweep Pallas permutation batch_tile on the real chip; print perm/s each."""
import os, sys, time, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from codex_storage_proofs_circuits_tpu.utils.cache import (
    machine_cache_dir,
    measure_sync_overhead,
)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", machine_cache_dir("/root/.cache/jax_tpu_comp")
)
from codex_storage_proofs_circuits_tpu.utils.cache import enable_compile_cache
enable_compile_cache("/root/.cache/jax_tpu_comp")

import numpy as np
import jax, jax.numpy as jnp

from codex_storage_proofs_circuits_tpu.ops import limbs as L
from codex_storage_proofs_circuits_tpu.ops import poseidon2_pallas as P2K

BATCH = 1 << 17
ITERS = 16
print("backend:", jax.default_backend(), flush=True)
SYNC = measure_sync_overhead()
print(f"sync overhead: {SYNC*1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
states = rng.integers(0, 1 << 16, size=(3, L.NL, BATCH), dtype=np.uint32)
states[:, L.NL - 1, :] &= 0x2FFF
x = jnp.asarray(states)

for tile, nc in ((512, 1), (1024, 2), (1024, 4), (2048, 2), (2048, 4), (2048, 8), (4096, 4), (4096, 8)):
    try:
        perm = lambda s: P2K.permutation(s, batch_tile=tile, n_chains=nc)
        t0 = time.perf_counter()
        jax.device_get(perm(x)[0, 0, :1])
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            y = x
            for _ in range(ITERS):
                y = perm(y)
            jax.device_get(y[0, 0, :1])
            best = min(best, (time.perf_counter() - t0 - SYNC) / ITERS)
        print(f"tile {tile:5d} x{nc}: {BATCH/best/1e6:7.2f} M perm/s  (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"tile {tile:5d} x{nc}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
