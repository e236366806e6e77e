"""Worker process for tests/test_distributed.py (not a pytest module).

Runs as one of N processes of a jax.distributed CPU cluster (gloo
collectives, 4 virtual devices per process), builds a fake-data dataset on a
global (slots x cells) mesh spanning both processes, and checks the dataset
root bit-exactly against the CPU oracle.  Prints "DSET_ROOT_OK <root>" on
success; the launching test asserts the marker from every process.

Usage: python _distributed_worker.py <pid> <nproc> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

import pathlib

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import jax

from codex_storage_proofs_circuits_tpu.parallel import distributed as DD

DD.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
    local_device_count=4,
)

from codex_storage_proofs_circuits_tpu.oracle.slot import DataSource, calc_slot_tree
from codex_storage_proofs_circuits_tpu.oracle.merkle import merkle_tree
from codex_storage_proofs_circuits_tpu.oracle.dataset import (
    GlobalConfig,
    DataSetConfig,
    slot_cfg_from_dataset_cfg,
)
from codex_storage_proofs_circuits_tpu.models import data as D
from codex_storage_proofs_circuits_tpu.ops.encode import encode_cells
from codex_storage_proofs_circuits_tpu.ops import limbs as L
from codex_storage_proofs_circuits_tpu.parallel import sharded_dataset_build

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc


def _barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier: keeps both processes' first collective
    within gloo's 30 s context-init window even when their XLA compiles
    finish minutes apart (observed under full-suite CPU contention)."""
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)

glob = GlobalConfig(max_depth=32, max_log2_n_slots=8, cell_size=64, block_size=128)
dset = DataSetConfig(
    n_slots=3, n_cells=16, n_samples=2, data_src=DataSource("fake", seed=5)
)
mesh = DD.make_global_mesh()  # (nproc, 4): slots across processes
assert mesh.shape == {"slots": nproc, "cells": 4}

cfgs = [slot_cfg_from_dataset_cfg(glob, dset, i) for i in range(dset.n_slots)]
pad = 2 * nproc  # slots axis must divide the padded slot count
lo, hi = DD.slot_range_for_process(mesh, pad)
local = np.stack(
    [
        np.asarray(encode_cells(D.load_slot_cells(cfgs[min(i, dset.n_slots - 1)])))
        for i in range(lo, hi)
    ]
)
felts = DD.make_global_cell_array(mesh, local, pad)

# Establish the gloo contexts for both mesh axes NOW, while the two
# processes are still aligned: a tiny all_gather over each axis compiles in
# seconds, so their first executions land well inside gloo's 30 s
# context-init window.  The big builds afterwards can then drift freely.
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from codex_storage_proofs_circuits_tpu.parallel.tree import shard_map

_barrier("pre_warm")
_tiny = jax.make_array_from_callback(
    (mesh.shape["slots"], mesh.shape["cells"]),
    NamedSharding(mesh, P("slots", "cells")),
    lambda idx: np.ones((1, 1), np.uint32),
)
_warm = shard_map(
    lambda x: jax.lax.all_gather(
        jax.lax.all_gather(x, "cells", axis=1, tiled=True),
        "slots", axis=0, tiled=True,
    ),
    mesh=mesh,
    in_specs=(P("slots", "cells"),),
    out_specs=P(None, None),
    check_vma=False,
)
np.asarray(jax.device_get(jax.jit(_warm)(_tiny)))

_barrier("pre_bn254_build")
locs, tops, dlayers = sharded_dataset_build(
    felts, mesh, glob.block_tree_depth, n_slots=dset.n_slots
)

# the dataset layers are replicated -> addressable from every process
root = L.unpack(np.asarray(jax.device_get(dlayers[-1])))[0]
oroot = merkle_tree([calc_slot_tree(c).root for c in cfgs]).root
assert root == oroot, (hex(root), hex(oroot))

# per-slot roots are sharded over the slots axis; check the local ones
for s in range(dset.n_slots):
    arr = tops[-1][s]
    if all(sh.is_fully_addressable for sh in [arr.sharding]):
        got = L.unpack(np.asarray(jax.device_get(arr)))[0]
        assert got == calc_slot_tree(cfgs[s]).root

print(f"DSET_ROOT_OK {hex(root)}", flush=True)

# Goldilocks twin over the same mesh (the reference's default field)
from codex_storage_proofs_circuits_tpu.models.gl_hashing import encode_cells_gl
from codex_storage_proofs_circuits_tpu.oracle.goldilocks import compress_fn
from codex_storage_proofs_circuits_tpu.oracle.goldilocks_pipeline import (
    calc_slot_tree_gl,
)
from codex_storage_proofs_circuits_tpu.parallel.gl_tree import (
    sharded_gl_dataset_build,
)

glocal = np.stack(
    [
        np.asarray(jax.device_get(
            encode_cells_gl(D.load_slot_cells(cfgs[min(i, dset.n_slots - 1)]))
        ))
        for i in range(lo, hi)
    ]
)
gfelts = DD.make_global_cell_array(mesh, glocal, pad)
_barrier("pre_gl_build")
_, gtops, gdlayers = sharded_gl_dataset_build(
    gfelts, mesh, "poseidon2", glob.block_tree_depth, n_slots=dset.n_slots
)
garr = np.asarray(jax.device_get(gdlayers[-1]))
groot = tuple(
    int(sum(int(garr[j, l, 0]) << (16 * l) for l in range(4))) for j in range(4)
)
goroot = merkle_tree(
    [calc_slot_tree_gl("poseidon2", c).root for c in cfgs], compress_fn("poseidon2")
).root
assert groot == goroot, (groot, goroot)
print(f"GL_DSET_ROOT_OK {groot[0]:#x}", flush=True)
