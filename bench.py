"""Headline benchmark: Poseidon2 keyed compressions per second per chip.

The permutation is >95% of all work in the reference system (SURVEY.md
section 3.3); compress/s is the north-star per-chip metric in BASELINE.json
(target: >10M/s per chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / 10e6 (the BASELINE.json per-chip target — the
reference itself publishes no hashing-throughput numbers, SURVEY.md section 6).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_PER_CHIP = 10_000_000.0  # BASELINE.json north star


def main() -> int:
    import jax
    import jax.numpy as jnp

    from codex_storage_proofs_circuits_tpu.ops import limbs as L
    from codex_storage_proofs_circuits_tpu.ops import poseidon2_jnp as P2
    from codex_storage_proofs_circuits_tpu.ops import poseidon2_pallas as P2K

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    batch = 1 << 19 if on_tpu else 1 << 12
    iters = 8 if on_tpu else 2

    rng = np.random.default_rng(0)
    # random canonical states (any residues < 2^254 work; keep < P via top limb)
    states = rng.integers(0, 1 << 16, size=(3, L.NL, batch), dtype=np.uint32)
    states[:, L.NL - 1, :] &= 0x2FFF  # < P
    x = jnp.asarray(states)

    if on_tpu:
        perm = lambda s: P2K.permutation(s, batch_tile=512)
    else:
        perm = jax.jit(P2.permutation)

    # warmup / compile
    jax.device_get(perm(x)[0, 0, :1])

    def run_once():
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = perm(y)
        # fetch one element: forces completion even if block_until_ready is
        # lazy under tunneled PJRT backends
        jax.device_get(y[0, 0, :1])
        return (time.perf_counter() - t0) / iters

    dt = min(run_once() for _ in range(3))
    per_sec = batch / dt

    out = {
        "metric": f"poseidon2_compress_per_s_per_chip[{backend}]",
        "value": round(per_sec, 1),
        "unit": "compress/s",
        "vs_baseline": round(per_sec / TARGET_PER_CHIP, 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
