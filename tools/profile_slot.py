"""Per-stage device timing of the streaming slot pipeline on the real chip."""
import os, time, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: F401  (sets machine-keyed JAX_COMPILATION_CACHE_DIR)
import jax, jax.numpy as jnp

from codex_storage_proofs_circuits_tpu.ops.fake_prng import gen_fake_cells_device
from codex_storage_proofs_circuits_tpu.ops.encode import encode_cells_device
from codex_storage_proofs_circuits_tpu.models import hashing as H
from codex_storage_proofs_circuits_tpu.ops import limbs as L

CHUNK = 1 << 13
CELL = 2048
BTD = 5


def timeit(name, fn, *a, iters=4):
    tc = time.perf_counter()
    out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:28s} compile+first: {time.perf_counter()-tc:7.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.1f} ms")
    return out


print("backend:", jax.default_backend())
cells = timeit("gen_fake_cells_device", lambda: gen_fake_cells_device(CELL, 12345, 0, CHUNK))
felts = timeit("encode_cells_device", lambda: encode_cells_device(cells))
mont = timeit("to_mont_stack", lambda: H.to_mont_stack(felts))
import codex_storage_proofs_circuits_tpu.ops.poseidon2_jnp as P2
padded = timeit("pad_felts_rate2", lambda: P2.pad_felts_rate2(mont))
hashes = timeit("sponge2_scan(pallas)", lambda: H.sponge2_scan(padded))
layers = timeit("tree_reduce_layers", lambda: H.tree_reduce_layers(hashes, bottom_depths=(0, BTD)))
full = timeit("slot_tree_from_felts(jit)", lambda: H.slot_tree_from_felts(felts, BTD))

from codex_storage_proofs_circuits_tpu.models.streaming import _fused_fake_chunk
from codex_storage_proofs_circuits_tpu.ops.fake_prng import fake_seed_bases

s1, s2 = fake_seed_bases(12345, 0)
timeit("fused_fake_chunk(1 dispatch)",
       lambda: _fused_fake_chunk(s1, s2, CELL, BTD, CHUNK))
nperm = CHUNK * 34
print(f"sponge perms per chunk: {nperm}")
