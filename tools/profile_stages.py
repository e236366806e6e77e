"""True per-stage device timing of the streaming slot pipeline (one chip).

The StreamingStats timers measure async dispatch, so nearly all device time
lands in finalize (VERDICT r3 weak #3).  This tool times each stage with a
block_until_ready fence so the breakdown sums to the wall:

  prng      — gen_rows (fake-data byte recurrence; Pallas kernel on TPU) alone
  encode    — byte rows -> felt limb planes alone
  sponge    — cell hashing alone
  reduce    — tree reduction alone
  fused     — the production single-dispatch chunk
  wall      — full streaming build at the given chunk size

Usage: python tools/profile_stages.py [--gl] [--chunk=13] [--cells=19]
"""

import os
import sys
import time
import pathlib

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
import jax
import jax.numpy as jnp


def _fence(r):
    # On the tunneled axon backend block_until_ready can return before
    # Pallas-containing computations execute; fetching one element is the
    # only reliable fence (docs/KERNEL_ANALYSIS.md round-4 timing caveat).
    leaf = jax.tree_util.tree_leaves(r)[-1]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def timed(fn, iters=4):
    _fence(fn())  # warm/compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        _fence(r)
        best = min(best, (time.perf_counter() - t0 - SYNC) / iters)
    return best


def main():
    gl = "--gl" in sys.argv
    chunk_log = next((int(a.split("=")[1]) for a in sys.argv if a.startswith("--chunk=")), 13)
    cells_log = next((int(a.split("=")[1]) for a in sys.argv if a.startswith("--cells=")), 19)
    cell_size, btd = 2048, 5
    B = 1 << chunk_log

    from codex_storage_proofs_circuits_tpu.ops.fake_prng import (
        gen_rows,
        fake_seed_planes,
    )

    s1, s2 = fake_seed_planes(12345, 0, B)

    print(f"field={'gl' if gl else 'bn254'} chunk=2^{chunk_log} "
          f"cells=2^{cells_log} sync={SYNC*1e3:.1f}ms", flush=True)

    t = timed(lambda: gen_rows(s1, s2, cell_size))
    print(f"prng:   {t*1e3:8.1f} ms/chunk  ({B*cell_size/t/1e6:.0f} MB/s)", flush=True)
    rows = gen_rows(s1, s2, cell_size)

    if gl:
        from codex_storage_proofs_circuits_tpu.ops.gl_encode import (
            encode_cells_gl_device,
        )
        from codex_storage_proofs_circuits_tpu.models import gl_hashing as GH
        from codex_storage_proofs_circuits_tpu.parallel.gl_tree import (
            gl_tree_reduce_layers,
        )
        from codex_storage_proofs_circuits_tpu.models.streaming import (
            _fused_fake_chunk_gl,
            streaming_slot_root_gl,
        )

        enc = jax.jit(lambda r: encode_cells_gl_device(r, cell_size))
        t = timed(lambda: enc(rows))
        print(f"encode: {t*1e3:8.1f} ms/chunk", flush=True)
        felts = enc(rows)
        sp = jax.jit(lambda f: GH.sponge_digests("poseidon2", f))
        t = timed(lambda: sp(felts))
        print(f"sponge: {t*1e3:8.1f} ms/chunk", flush=True)
        hashes = sp(felts)
        rd = jax.jit(
            lambda h: gl_tree_reduce_layers(h, "poseidon2", (0, btd))[-1]
        )
        t = timed(lambda: rd(hashes))
        print(f"reduce: {t*1e3:8.1f} ms/chunk", flush=True)
        from codex_storage_proofs_circuits_tpu.ops.fake_prng import fake_seed_bases

        b1, b2 = fake_seed_bases(12345, 0)
        t = timed(
            lambda: _fused_fake_chunk_gl(b1, b2, "poseidon2", cell_size, btd, B)[-1]
        )
        print(f"fused:  {t*1e3:8.1f} ms/chunk", flush=True)

        from codex_storage_proofs_circuits_tpu.oracle.slot import (
            DataSource,
            SlotConfig,
        )

        cfg = SlotConfig(cell_size=cell_size, block_size=65536,
                         n_cells=1 << cells_log, n_samples=1,
                         data_src=DataSource("fake", seed=12345))
        streaming_slot_root_gl(cfg, chunk_cells=B)  # compile
        t0 = time.perf_counter()
        streaming_slot_root_gl(cfg, chunk_cells=B)
        wall = time.perf_counter() - t0
    else:
        from codex_storage_proofs_circuits_tpu.ops.encode import encode_cells_device
        from codex_storage_proofs_circuits_tpu.models import hashing as H
        from codex_storage_proofs_circuits_tpu.models.streaming import (
            _fused_fake_chunk,
            streaming_slot_root,
        )

        enc = jax.jit(lambda r: encode_cells_device(r.T))
        t = timed(lambda: enc(rows))
        print(f"encode: {t*1e3:8.1f} ms/chunk", flush=True)
        felts = enc(rows)
        sp = jax.jit(H.hash_cells_mont)
        t = timed(lambda: sp(felts))
        print(f"sponge: {t*1e3:8.1f} ms/chunk", flush=True)
        hashes = sp(felts)
        rd = jax.jit(
            lambda h: H.tree_reduce_layers(h, bottom_depths=(0, btd))[-1]
        )
        t = timed(lambda: rd(hashes))
        print(f"reduce: {t*1e3:8.1f} ms/chunk", flush=True)
        from codex_storage_proofs_circuits_tpu.ops.fake_prng import fake_seed_bases

        b1, b2 = fake_seed_bases(12345, 0)
        t = timed(lambda: _fused_fake_chunk(b1, b2, cell_size, btd, B)[-1])
        print(f"fused:  {t*1e3:8.1f} ms/chunk", flush=True)

        from codex_storage_proofs_circuits_tpu.oracle.slot import (
            DataSource,
            SlotConfig,
        )

        cfg = SlotConfig(cell_size=cell_size, block_size=65536,
                         n_cells=1 << cells_log, n_samples=1,
                         data_src=DataSource("fake", seed=12345))
        streaming_slot_root(cfg, chunk_cells=B)
        t0 = time.perf_counter()
        streaming_slot_root(cfg, chunk_cells=B)
        wall = time.perf_counter() - t0
    n_chunks = (1 << cells_log) >> chunk_log
    print(f"wall:   {wall:8.3f} s for 2^{cells_log} cells "
          f"({n_chunks} chunks, {(1<<cells_log)*cell_size/wall/1e6:.0f} MB/s)",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    SYNC = measure_sync_overhead()
    main()
