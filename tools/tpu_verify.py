"""On-hardware verification + tuning sweep for the fused Poseidon2 kernel.

Checks the Pallas kernel bit-exactly against the scalar oracle (including
the permutation KAT, reference/haskell/src/Poseidon2/Example.hs:13-19) on a
handful of random states embedded in a large batch, then sweeps batch tiles.

Run on the TPU host: python tools/tpu_verify.py
(CPU hosts: use the interpret-mode test, CSPC_SLOW_TESTS=1 pytest
tests/test_pallas_kernel.py — Mosaic cannot target CPU.)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_comp")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from codex_storage_proofs_circuits_tpu.fields import bn254
    from codex_storage_proofs_circuits_tpu.ops import limbs as L
    from codex_storage_proofs_circuits_tpu.ops import poseidon2_pallas as K
    from codex_storage_proofs_circuits_tpu.oracle import poseidon2 as O

    from codex_storage_proofs_circuits_tpu.utils.cache import enable_compile_cache

    enable_compile_cache("/root/.cache/jax_tpu_comp")
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    B = 1 << 17
    nchk = 8
    vals = [
        [int(x) for x in rng.integers(0, 2**62, size=nchk, dtype=np.int64)]
        for _ in range(3)
    ]
    vals[0][0], vals[1][0], vals[2][0] = 0, 1, 2  # the KAT
    arr = rng.integers(0, 1 << 16, size=(3, L.NL, B), dtype=np.uint32)
    arr[:, L.NL - 1, :] &= 0x2FFF  # < P
    for lane in range(3):
        pk = np.asarray(L.pack([bn254.to_mont(v) for v in vals[lane]]))
        arr[lane, :, :nchk] = pk
    state = jnp.asarray(arr)
    from codex_storage_proofs_circuits_tpu.utils.cache import measure_sync_overhead

    global SYNC
    SYNC = measure_sync_overhead()  # also warms the tunnel
    print(f"sync overhead: {SYNC*1e3:.1f} ms", flush=True)

    t0 = time.time()
    out = K.permutation(state, batch_tile=512)
    chk = jax.device_get(out[:, :, :nchk])
    print(f"compile+first run {time.time()-t0:.1f}s", flush=True)
    for b in range(nchk):
        exp = O.permutation((vals[0][b], vals[1][b], vals[2][b]))
        for i in range(3):
            got = sum(int(chk[i, l, b]) << (16 * l) for l in range(L.NL))
            assert got == bn254.to_mont(exp[i]), (b, i, hex(got))
    print(f"kernel bit-exact vs oracle on {nchk} states (incl. KAT)", flush=True)

    def _timed(fn, x0):
        """Overhead-safe per-call seconds on a CHAINED y = fn(y) loop with
        the window scaled to >= 10x sync overhead, median of 3 (bench.py
        methodology).  Unchained same-input repeat dispatches interact
        pathologically with the tunneled backend (measured both 5x-inflated
        and 10x-deflated windows); chaining is the reliable pattern."""
        y = fn(x0)
        jax.device_get(y[(0,) * (y.ndim - 1) + (slice(0, 1),)])
        n = 8
        while True:
            t0 = time.perf_counter()
            y = x0
            for _ in range(n):
                y = fn(y)
            jax.device_get(y[(0,) * (y.ndim - 1) + (slice(0, 1),)])
            dt = time.perf_counter() - t0
            if dt >= max(10 * SYNC, 0.3):
                break
            n *= 2
        samples = [dt]
        for _ in range(2):
            t0 = time.perf_counter()
            y = x0
            for _ in range(n):
                y = fn(y)
            jax.device_get(y[(0,) * (y.ndim - 1) + (slice(0, 1),)])
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return (samples[1] - SYNC) / n

    for bt in (256, 512, 1024):
        dt = _timed(lambda v: K.permutation(v, batch_tile=bt), state)
        print(f"bt={bt}: {dt*1e3:.3f} ms -> {B/dt/1e6:.3f}M perm/s", flush=True)

    # ---- fused rate-2 sponge kernel: correctness + cells/s ----
    from codex_storage_proofs_circuits_tpu.models import hashing as H
    from codex_storage_proofs_circuits_tpu.ops import poseidon2_jnp as P2
    from codex_storage_proofs_circuits_tpu.oracle import poseidon2 as OS

    SB = 1 << 13
    NF = 67  # felts of a 2048-byte cell
    canon = rng.integers(0, 1 << 62, size=(NF, SB), dtype=np.int64)
    felts = np.zeros((NF, L.NL, SB), np.uint32)
    for l in range(4):  # values < 2^62: limbs 0..3 only
        felts[:, l, :] = ((canon >> (16 * l)) & 0xFFFF).astype(np.uint32)
    blocks = P2.pad_felts_rate2(H.to_mont_stack(jnp.asarray(felts)))
    out = K.sponge2_absorb(blocks, batch_tile=512)
    chk = jax.device_get(out[:, :4])
    for b in range(4):
        exp = OS.sponge2([int(canon[f, b]) for f in range(NF)])
        got = sum(int(chk[l, b]) << (16 * l) for l in range(L.NL))
        assert got == bn254.to_mont(exp), b
    print("fused sponge bit-exact vs oracle on 4 cells", flush=True)
    # the sponge is not shape-preserving; chain through a re-blocked felt
    # stack built from the squeezed output (keeps the device queue busy with
    # dependent work like the chained perm loop)
    nb = blocks.shape[0]

    def sponge_step(blk):
        out = K.sponge2_absorb(blk)  # (NL, SB)
        return jnp.broadcast_to(out[None, None], (nb, 2, L.NL, SB)).astype(
            jnp.uint32
        )

    dt = _timed(sponge_step, blocks)
    print(
        f"sponge: {dt*1e3:.2f} ms -> {SB/dt:,.0f} cells/s"
        f" = {SB*blocks.shape[0]/dt/1e6:.2f}M perm/s",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
