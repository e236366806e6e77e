"""Parity of the native C host library against the pure-Python oracle.

The C library (native/cspc_native.c) reimplements the math of the
reference's pinned native deps (constantine + nim-poseidon2,
reference/nim/proof_input/proof_input.nimble:11-13); these tests hold it
bit-exact to the oracle across every ABI entry point, including the odd /
singleton Merkle shapes and the end-to-end proof-input bundle.
"""

import numpy as np
import pytest

from codex_storage_proofs_circuits_tpu import native as N
from codex_storage_proofs_circuits_tpu.fields.bn254 import P
from codex_storage_proofs_circuits_tpu.oracle import poseidon2 as O
from codex_storage_proofs_circuits_tpu.oracle import slot as S
from codex_storage_proofs_circuits_tpu.oracle import merkle as M
from codex_storage_proofs_circuits_tpu.oracle.dataset import GlobalConfig, DataSetConfig
from codex_storage_proofs_circuits_tpu.oracle.sampling import (
    generate_proof_input,
    sample_cell_index,
)

pytestmark = pytest.mark.skipif(
    not N.available(), reason=f"native build failed: {N.build_error()}"
)


def test_permutation_kat():
    # reference/haskell/src/Poseidon2/Example.hs:13-19
    assert N.permutation((0, 1, 2)) == O.permutation((0, 1, 2))


def test_permutation_random_states():
    rng = np.random.default_rng(1)
    for _ in range(5):
        st = tuple(int(x) % P for x in rng.integers(0, 1 << 63, 3))
        assert N.permutation(st) == O.permutation(st)


def test_sponges_sweep_lengths():
    for n in range(9):
        xs = list(range(1, n + 1))
        assert N.sponge1(xs) == O.sponge1(xs)
        assert N.sponge2(xs) == O.sponge2(xs)


def test_keyed_compression_all_keys():
    for k in range(4):
        assert N.keyed_compression(k, 123, 456) == O.keyed_compression(k, 123, 456)


def test_fake_cells():
    got = N.fake_cells(96, 777, 3, 4)
    for j in range(4):
        assert got[j].tobytes() == S.gen_fake_cell(96, 777, 3 + j)


def test_hash_cells_byte_padding_sweep():
    # cell sizes straddling 31-byte chunk boundaries sweep the 10* padding
    for cs in (30, 31, 32, 62, 64, 128):
        data = S.gen_fake_cell(cs * 3, 42, 0)
        arr = np.frombuffer(data, np.uint8)
        got = N.hash_cells(arr, cs)
        want = [S.hash_cell_bytes(data[i * cs:(i + 1) * cs]) for i in range(3)]
        assert got == want, cs


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 11, 40])
def test_merkle_layers_shapes(n):
    leaves = [(i * 7919 + 13) % P for i in range(n)]
    assert N.merkle_layers(leaves) == M.merkle_tree(leaves).layers


def test_slot_tree_from_bytes():
    cfg = S.SlotConfig(cell_size=64, block_size=256, n_cells=32, n_samples=1,
                       data_src=S.DataSource("fake", seed=9))
    data = np.frombuffer(
        b"".join(S.load_cell(cfg, i) for i in range(cfg.n_cells)), np.uint8)
    minis, big = N.slot_tree_from_bytes(data, cfg.cell_size, cfg.cells_per_block)
    want = S.calc_slot_tree(cfg)
    assert [m for m in minis] == [t.layers for t in want.mini_trees]
    assert big == want.big_tree.layers


def test_sample_cell_index():
    for c in range(1, 6):
        assert N.sample_cell_index(111, 222, 64, c) == sample_cell_index(111, 222, 64, c)


def test_generate_proof_input_end_to_end():
    glob = GlobalConfig(max_depth=16, max_log2_n_slots=4, cell_size=128,
                        block_size=512)
    dset = DataSetConfig(n_slots=3, n_cells=16, n_samples=4)
    assert (N.generate_proof_input_native(glob, dset, 1, 999)
            == generate_proof_input(glob, dset, 1, 999))


# -- Goldilocks track --------------------------------------------------------


@pytest.mark.parametrize("hf", ["poseidon2", "monolith"])
def test_gl_permutation_random_states(hf):
    import random

    from codex_storage_proofs_circuits_tpu.oracle import goldilocks as OG

    random.seed(3)
    for _ in range(5):
        s = [random.randrange(OG.P_GL) for _ in range(12)]
        assert N.gl_permutation(hf, s) == OG.PERMUTATIONS[hf](s)


@pytest.mark.parametrize("hf", ["poseidon2", "monolith"])
def test_gl_digest_and_compress(hf):
    from codex_storage_proofs_circuits_tpu.oracle import goldilocks as OG

    for n in (0, 1, 7, 8, 9, 17):
        felts = [(i * 104729 + 7) % OG.P_GL for i in range(n)]
        assert N.gl_digest_felts(hf, felts) == OG.digest_felts(hf, felts)
    x = tuple((i * 7919 + 1) % OG.P_GL for i in range(4))
    y = tuple((i * 6277 + 5) % OG.P_GL for i in range(4))
    for key in range(4):
        assert N.gl_compress(hf, key, x, y) == OG.compress(hf, key, x, y)


@pytest.mark.parametrize("hf", ["poseidon2", "monolith"])
def test_gl_slot_tree_and_sampling(hf):
    from codex_storage_proofs_circuits_tpu.oracle import goldilocks as OG
    from codex_storage_proofs_circuits_tpu.oracle.goldilocks_pipeline import (
        calc_slot_tree_gl,
    )

    cfg = S.SlotConfig(cell_size=64, block_size=256, n_cells=32, n_samples=1,
                       data_src=S.DataSource("fake", seed=9))
    btd = cfg.cells_per_block.bit_length() - 1
    flat = N.gl_slot_tree_layers(hf, cfg.n_cells, cfg.cell_size,
                                 cfg.data_src.seed, btd)
    want = calc_slot_tree_gl(hf, cfg)
    assert flat[0] == [d for t in want.mini_trees for d in t.layers[0]]
    assert flat[-1][0] == want.root

    ent = OG.int_to_digest(123456)
    for c in range(1, 5):
        assert N.gl_sample_cell_index(hf, ent, want.root, cfg.n_cells, c) == (
            OG.sample_cell_index_gl(hf, ent, want.root, cfg.n_cells, c)
        )


@pytest.mark.parametrize("hf", ["poseidon2", "monolith"])
def test_gl_generate_proof_input_end_to_end(hf):
    from codex_storage_proofs_circuits_tpu.oracle.dataset import (
        DataSetConfig,
        GlobalConfig,
    )
    from codex_storage_proofs_circuits_tpu.oracle.goldilocks import int_to_digest
    from codex_storage_proofs_circuits_tpu.oracle.goldilocks_pipeline import (
        generate_proof_input_gl,
    )

    glob = GlobalConfig(max_depth=16, max_log2_n_slots=4, cell_size=128,
                        block_size=512)
    dset = DataSetConfig(n_slots=3, n_cells=32, n_samples=3,
                         data_src=S.DataSource("fake", seed=42))
    want = generate_proof_input_gl(hf, glob, dset, 1, int_to_digest(777))
    got = N.generate_proof_input_gl_native(hf, glob, dset, 1, int_to_digest(777))
    assert got == want
