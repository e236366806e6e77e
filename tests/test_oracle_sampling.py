"""Oracle sampling + proof-input generation tests (end-to-end, small config)."""

from codex_storage_proofs_circuits_tpu.oracle.poseidon2 import sponge2
from codex_storage_proofs_circuits_tpu.oracle.merkle import MerkleProof, reconstruct_root
from codex_storage_proofs_circuits_tpu.oracle.slot import (
    DataSource,
    hash_cell_felts,
)
from codex_storage_proofs_circuits_tpu.oracle.dataset import (
    GlobalConfig,
    DataSetConfig,
    parametric_slot_seed,
    slot_cfg_from_dataset_cfg,
)
from codex_storage_proofs_circuits_tpu.oracle.sampling import (
    sample_cell_index,
    sample_cell_indices,
    generate_proof_input,
)

GLOB = GlobalConfig(max_depth=16, max_log2_n_slots=5, cell_size=64, block_size=256)
DSET = DataSetConfig(
    n_slots=5, n_cells=16, n_samples=3, data_src=DataSource("fake", seed=12345)
)


def test_sample_index_formula():
    # idx = sponge2([entropy, slotRoot, counter]) mod nCells
    e, r = 1234567, 987654321
    h = sponge2([e, r, 3])
    assert sample_cell_index(e, r, 16, 3) == h % 16
    # counters start at 1 (Sampling.hs:75)
    assert sample_cell_indices(e, r, 16, 4) == [
        sample_cell_index(e, r, 16, c) for c in [1, 2, 3, 4]
    ]


def test_parametric_slot_seed():
    assert parametric_slot_seed(12345, 0) == 12345 + 72
    assert parametric_slot_seed(12345, 3) == 12345 + 72 + 3003
    # u64 wraparound
    assert parametric_slot_seed((1 << 64) - 10, 1) == (72 + 1001 - 10)


def test_generate_proof_input_shapes():
    pi = generate_proof_input(GLOB, DSET, slot_index=2, entropy=1234567)
    assert pi.slot_index == 2
    assert pi.n_slots_per_dataset == 5
    assert pi.n_cells_per_slot == 16
    assert len(pi.slot_proof) == GLOB.max_log2_n_slots
    assert len(pi.cell_data) == DSET.n_samples
    assert len(pi.merkle_paths) == DSET.n_samples
    assert all(len(p) == GLOB.max_depth for p in pi.merkle_paths)
    assert all(len(c) == GLOB.n_field_elems_per_cell for c in pi.cell_data)


def test_generate_proof_input_consistency():
    """Re-verify the generated witness exactly the way the circuit would:
    slot root from dataset path, cell hashes from cellData, two-stage
    Merkle walks to the slot root."""
    pi = generate_proof_input(GLOB, DSET, slot_index=1, entropy=42)

    # dataset-level inclusion (sample_cells.circom:95-109)
    ds_depth = (DSET.n_slots - 1).bit_length()
    slot_prf = MerkleProof(
        pi.slot_index, pi.slot_root, pi.slot_proof[:ds_depth], DSET.n_slots
    )
    assert reconstruct_root(slot_prf) == pi.data_set_root

    # per-sample checks (single_cell.circom:41-71)
    bt_depth = GLOB.block_tree_depth
    slot_depth = (DSET.n_cells - 1).bit_length()
    idxs = sample_cell_indices(42, pi.slot_root, DSET.n_cells, DSET.n_samples)
    cfg = slot_cfg_from_dataset_cfg(GLOB, DSET, 1)
    k = cfg.cells_per_block
    m = cfg.blocks_per_slot
    for s, idx in enumerate(idxs):
        cell_hash = hash_cell_felts(pi.cell_data[s])
        path = pi.merkle_paths[s]
        small = MerkleProof(idx % k, cell_hash, path[:bt_depth], k)
        block_hash = reconstruct_root(small)
        big = MerkleProof(
            idx // k, block_hash, path[bt_depth : slot_depth], m
        )
        assert reconstruct_root(big) == pi.slot_root
        # padding beyond the true depth is zero
        assert all(v == 0 for v in path[slot_depth:])
