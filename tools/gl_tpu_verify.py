"""On-hardware verification + throughput for the fused Goldilocks kernels.

Checks permutation and rate-8 sponge bit-exactly against the scalar oracle
on random states embedded in a large batch, then reports perm/s.

Run on the TPU host: python tools/gl_tpu_verify.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from codex_storage_proofs_circuits_tpu.utils.cache import (  # noqa: E402
    measure_sync_overhead,
    set_default_cache_env,
)

set_default_cache_env("/root/.cache/jax_tpu_comp")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from codex_storage_proofs_circuits_tpu.ops import goldilocks_pallas as K
    from codex_storage_proofs_circuits_tpu.oracle import goldilocks as O

    print("backend:", jax.default_backend(), flush=True)
    sync = measure_sync_overhead()
    print(f"sync overhead: {sync*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(3)
    B = 1 << 16
    tile = K.DEFAULT_TILE
    vals = rng.integers(0, O.P_GL, size=(12, B), dtype=np.uint64)
    state = np.zeros((12, 4, B), np.uint32)
    for k in range(4):
        state[:, k, :] = ((vals >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.uint32)
    x = jnp.asarray(state)

    t0 = time.time()
    out = K.permutation(x, batch_tile=tile)
    chk = np.asarray(jax.device_get(out[:, :, :8]))
    print(f"compile+first run {time.time()-t0:.1f}s", flush=True)
    for b in range(8):
        exp = O.poseidon2_permutation([int(v) for v in vals[:, b]])
        got = [int(sum(int(chk[l, k, b]) << (16 * k) for k in range(4))) for l in range(12)]
        assert got == exp, (b, [hex(v) for v in exp[:2]], [hex(v) for v in got[:2]])
    print("permutation bit-exact vs oracle on 8 states", flush=True)

    iters = 16
    jax.device_get(K.permutation(x, batch_tile=tile)[0, 0, :1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = K.permutation(y, batch_tile=tile)
        jax.device_get(y[0, 0, :1])
        best = min(best, (time.perf_counter() - t0 - sync) / iters)
    print(f"GL perm/s (tile {tile}): {B/best/1e6:.2f} M", flush=True)

    # sponge: cell-shaped inputs (16 felts = 2 absorb blocks)
    nf, B2 = 16, 1 << 14
    felts = rng.integers(0, O.P_GL, size=(nf, B2), dtype=np.uint64)
    arr = np.zeros((nf, 4, B2), np.uint32)
    for k in range(4):
        arr[:, k, :] = ((felts >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.uint32)
    out = K.sponge_digest_felts(jnp.asarray(arr), batch_tile=tile)
    chk = np.asarray(jax.device_get(out[:, :, :4]))
    for b in range(4):
        exp = O.digest_felts("poseidon2", [int(felts[f, b]) for f in range(nf)])
        got = tuple(
            int(sum(int(chk[l, k, b]) << (16 * k) for k in range(4))) for l in range(4)
        )
        assert got == exp, b
    print("rate-8 sponge bit-exact vs oracle on 4 digests", flush=True)

    # Monolith permutation kernel
    out = K.permutation(x, batch_tile=tile, hash_fun="monolith")
    chk = np.asarray(jax.device_get(out[:, :, :4]))
    for b in range(4):
        exp = O.monolith_permutation([int(v) for v in vals[:, b]])
        got = [
            int(sum(int(chk[l, k, b]) << (16 * k) for k in range(4))) for l in range(12)
        ]
        assert got == exp, b
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = K.permutation(y, batch_tile=tile, hash_fun="monolith")
        jax.device_get(y[0, 0, :1])
        best = min(best, (time.perf_counter() - t0 - sync) / iters)
    print(f"Monolith bit-exact; perm/s (tile {tile}): {B/best/1e6:.2f} M", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
