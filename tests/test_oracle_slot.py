"""Oracle slot-model tests: fake PRNG, byte chunking, cell hashing, slot trees."""

import json
import pathlib

from codex_storage_proofs_circuits_tpu.oracle.poseidon2 import sponge2
from codex_storage_proofs_circuits_tpu.oracle.slot import (
    DataSource,
    SlotConfig,
    SlotTree,
    gen_fake_cell,
    pad_and_split_bytes,
    chunk_to_field,
    cell_data_to_field_elements,
    field_elems_per_cell,
    hash_cell_bytes,
    load_block,
    block_tree,
    calc_slot_tree,
    extract_cell_proof,
    check_cell_proof,
)

VECTORS = json.load(
    open(pathlib.Path(__file__).parent / "vectors" / "bn254_testvectors.json")
)


def small_cfg(n_cells=16, seed=12345):
    # cell 64B, block 256B -> 4 cells/block, depth-2 mini trees
    return SlotConfig(
        cell_size=64,
        block_size=256,
        n_cells=n_cells,
        n_samples=3,
        data_src=DataSource("fake", seed=seed),
    )


def test_fake_cell_deterministic():
    a = gen_fake_cell(64, 12345, 0)
    b = gen_fake_cell(64, 12345, 0)
    c = gen_fake_cell(64, 12345, 1)
    d = gen_fake_cell(64, 12346, 0)
    assert a == b and a != c and a != d and len(a) == 64


def test_fake_cell_wraparound_regression():
    # first bytes for seed=12345 idx=0 pinned: the u64-wraparound recurrence
    # (slot.nim:22-32) must never silently change
    cell = gen_fake_cell(8, 12345, 0)
    states = []
    state, seed1, seed2 = 1, (12345 + 0xDEADCAFE), (0 + 0x98765432)
    for _ in range(8):
        state = (
            state * (state + seed1) * (state + seed2)
            + state * (state ^ 0x5A5A5A5A)
            + seed1 * state
            + (seed2 + 17)
        ) % (1 << 64) % 1698428844001831
        states.append(state & 0xFF)
    assert list(cell) == states


def test_padding_chunk_edges():
    # empty -> one chunk [0x01, 0...]
    chunks = pad_and_split_bytes(b"")
    assert len(chunks) == 1 and chunks[0] == b"\x01" + b"\x00" * 30
    # 30 bytes -> one chunk ending in 0x01
    chunks = pad_and_split_bytes(bytes(30))
    assert len(chunks) == 1 and chunks[0][30] == 1
    # exactly 31 bytes -> the 0x01 spills into a second chunk
    chunks = pad_and_split_bytes(bytes(31))
    assert len(chunks) == 2 and chunks[1] == b"\x01" + b"\x00" * 30
    # 2048-byte cell -> 67 chunks
    assert len(pad_and_split_bytes(bytes(2048))) == 67
    assert field_elems_per_cell(2048) == 67


def test_chunk_to_field_little_endian():
    chunk = bytes([2] + [0] * 29 + [3])
    assert chunk_to_field(chunk) == 2 + 3 * (1 << 240)


def test_hash_bytes_vectors():
    # mirrors testvectors.nim:39-46 / TestVectors.hs:46-55; n=0..80 sweeps
    # all byte-padding cases across 31-byte boundaries
    for n in range(0, 81):
        data = bytes(range(1, n + 1))
        assert str(hash_cell_bytes(data)) == VECTORS["hash_bytes"][n]


def test_hash_cell_matches_sponge2_of_felts():
    data = bytes(range(200))
    assert hash_cell_bytes(data) == sponge2(cell_data_to_field_elements(data))


def test_slot_tree_and_cell_proofs():
    cfg = small_cfg()
    tree = calc_slot_tree(cfg)
    assert isinstance(tree, SlotTree)
    assert len(tree.mini_trees) == cfg.blocks_per_slot == 4
    # block tree of block 0 built independently agrees
    bt = block_tree(cfg, load_block(cfg, 0))
    assert bt.root == tree.mini_trees[0].root
    # every cell's merged proof passes the two-stage check
    for idx in range(cfg.n_cells):
        prf = extract_cell_proof(cfg, tree, idx)
        cell_hash = hash_cell_bytes(gen_fake_cell(cfg.cell_size, 12345, idx))
        assert prf.leaf_value == cell_hash
        assert check_cell_proof(cfg, tree.root, idx, cell_hash, prf.merkle_path)
        # wrong hash fails
        assert not check_cell_proof(
            cfg, tree.root, idx, (cell_hash + 1), prf.merkle_path
        )
