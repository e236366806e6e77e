"""Device slot-tree pipeline vs the pure-Python oracle (bit-exact)."""

import numpy as np
import pytest

from codex_storage_proofs_circuits_tpu.oracle.slot import (
    DataSource,
    SlotConfig,
    calc_slot_tree,
    gen_fake_cell,
    extract_cell_proof as oracle_extract,
    check_cell_proof,
)
from codex_storage_proofs_circuits_tpu.oracle.merkle import reconstruct_root
from codex_storage_proofs_circuits_tpu.models import data as D
from codex_storage_proofs_circuits_tpu.models.slot_tree import (
    build_slot_tree,
    build_slot_trees,
    extract_cell_proof,
)


def _cfg(cell=128, block=512, ncells=16, seed=7):
    return SlotConfig(
        cell_size=cell,
        block_size=block,
        n_cells=ncells,
        n_samples=3,
        data_src=DataSource("fake", seed=seed),
    )


def test_fake_cells_vectorized_matches_oracle():
    cs, seed = 64, 12345
    got = D.gen_fake_cells(cs, seed, np.arange(5))
    for i in range(5):
        assert got[i].tobytes() == gen_fake_cell(cs, seed, i)


def test_fake_cells_large_seed_wraparound():
    cs = 16
    seed = (1 << 64) - 3  # u64 wraparound in seed1 derivation
    got = D.gen_fake_cells(cs, seed & ((1 << 64) - 1), np.arange(3))
    for i in range(3):
        assert got[i].tobytes() == gen_fake_cell(cs, seed & ((1 << 64) - 1), i)


def test_device_slot_tree_matches_oracle():
    cfg = _cfg()
    tree = build_slot_tree(cfg)
    otree = calc_slot_tree(cfg)
    assert tree.root == otree.root
    # every layer of the flat stack must match the oracle trees
    assert list(tree.layers[0]) == [
        int(v) for t in otree.mini_trees for v in t.layers[0]
    ]
    btd = cfg.cells_per_block.bit_length() - 1
    assert list(tree.layers[btd]) == [int(v) for v in otree.big_tree.layers[0]]


def test_device_cell_proofs_match_oracle_and_verify():
    cfg = _cfg()
    tree = build_slot_tree(cfg)
    otree = calc_slot_tree(cfg)
    for idx in range(cfg.n_cells):
        p = extract_cell_proof(tree, idx)
        op = oracle_extract(cfg, otree, idx)
        assert p.merkle_path == op.merkle_path
        assert p.leaf_value == op.leaf_value
        assert check_cell_proof(cfg, tree.root, idx, p.leaf_value, p.merkle_path)


def test_batched_multi_slot_build():
    cfgs = [_cfg(seed=100 + k) for k in range(3)]
    trees = build_slot_trees(cfgs)
    for cfg, tree in zip(cfgs, trees):
        assert tree.root == calc_slot_tree(cfg).root


def test_single_block_slot():
    # n_cells == cells_per_block: big tree is a singleton-bottom odd node
    cfg = _cfg(cell=128, block=512, ncells=4)
    tree = build_slot_tree(cfg)
    otree = calc_slot_tree(cfg)
    assert tree.root == otree.root
    # NB: check_cell_proof itself rejects this degenerate shape (the
    # reference's ceilingLog2(1)=0 depth formula disagrees with the
    # singleton-bottom-odd compression, Merkle.hs:71-74); path equality with
    # the oracle extractor is the parity claim here.
    for idx in range(cfg.n_cells):
        p = extract_cell_proof(tree, idx)
        op = oracle_extract(cfg, otree, idx)
        assert p.merkle_path == op.merkle_path
        assert p.leaf_value == op.leaf_value


def test_odd_cell_size_encoding():
    # cell size not a multiple of 31 exercises the padding boundary
    cfg = _cfg(cell=62, block=248, ncells=8)
    assert build_slot_tree(cfg).root == calc_slot_tree(cfg).root


def test_extract_paths_device_matches_host():
    """Device batched path gather == scalar host extraction (SURVEY §2c
    per-host partitioned sampled-witness batches)."""
    import jax.numpy as jnp
    from codex_storage_proofs_circuits_tpu.models import hashing as H
    from codex_storage_proofs_circuits_tpu.models.slot_tree import (
        build_slot_tree,
        extract_cell_proof,
    )
    from codex_storage_proofs_circuits_tpu.models import data as D
    from codex_storage_proofs_circuits_tpu.ops.encode import encode_cells
    from codex_storage_proofs_circuits_tpu.ops import limbs as L

    cfg = SlotConfig(
        cell_size=64, block_size=256, n_cells=32, n_samples=4,
        data_src=DataSource("fake", seed=21),
    )
    btd = cfg.cells_per_block.bit_length() - 1
    felts = encode_cells(D.load_slot_cells(cfg))
    layers = H.slot_tree_from_felts(jnp.asarray(felts), btd)
    max_depth = 12
    idxs = [0, 5, 17, 31]
    paths = H.extract_paths_device(layers, jnp.asarray(idxs), max_depth)
    tree = build_slot_tree(cfg)
    for k, idx in enumerate(idxs):
        want = extract_cell_proof(tree, idx).padded(max_depth).merkle_path
        got = L.unpack(paths[:, :, k].T)
        assert got == [int(v) for v in want], idx
