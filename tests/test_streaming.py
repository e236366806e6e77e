"""Chunked streaming slot build vs the one-shot device build and the oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from codex_storage_proofs_circuits_tpu.models import data as D
from codex_storage_proofs_circuits_tpu.models import hashing as H
from codex_storage_proofs_circuits_tpu.models.streaming import (
    StreamingStats,
    streaming_slot_layers,
)
from codex_storage_proofs_circuits_tpu.ops import limbs as L
from codex_storage_proofs_circuits_tpu.ops.encode import encode_cells
from codex_storage_proofs_circuits_tpu.oracle.slot import (
    DataSource,
    SlotConfig,
    calc_slot_tree,
)


def test_streaming_matches_oneshot_and_oracle():
    cfg = SlotConfig(
        cell_size=64,
        block_size=256,
        n_cells=32,
        n_samples=1,
        data_src=DataSource("fake", seed=77),
    )
    btd = cfg.cells_per_block.bit_length() - 1
    stats = StreamingStats()
    layers = streaming_slot_layers(cfg, chunk_cells=8, stats=stats)
    assert stats.chunks == 4 and stats.cells == 32

    # one-shot device build
    felts = encode_cells(D.load_slot_cells(cfg))
    full = H.slot_tree_from_felts(jnp.asarray(felts), btd)
    assert len(layers) == len(full)
    for a, b in zip(layers, full):
        assert a.shape == b.shape
        assert L.unpack(a) == L.unpack(b)

    # oracle root
    otree = calc_slot_tree(cfg)
    assert L.unpack(layers[-1])[0] == otree.root


def test_streaming_single_chunk_degenerates():
    cfg = SlotConfig(
        cell_size=64,
        block_size=256,
        n_cells=16,
        n_samples=1,
        data_src=DataSource("fake", seed=3),
    )
    layers = streaming_slot_layers(cfg, chunk_cells=64)  # clamped to n_cells
    otree = calc_slot_tree(cfg)
    assert L.unpack(layers[-1])[0] == otree.root


def test_streaming_checkpoint_resume(tmp_path):
    cfg = SlotConfig(
        cell_size=64,
        block_size=256,
        n_cells=32,
        n_samples=1,
        data_src=DataSource("fake", seed=77),
    )
    ck = str(tmp_path / "ckpt")
    # interrupted build: only 2 of 4 chunks complete
    out = streaming_slot_layers(cfg, chunk_cells=8, checkpoint_dir=ck, stop_after_chunks=2)
    assert out is None
    import json, os
    man = json.load(open(os.path.join(ck, "manifest.json")))
    assert man["chunks"] == [0, 1]
    # resume: loads chunks 0-1 from disk, computes 2-3
    stats = StreamingStats()
    layers = streaming_slot_layers(cfg, chunk_cells=8, checkpoint_dir=ck, stats=stats)
    assert stats.chunks == 4
    assert stats.datagen_s > 0  # chunks 2-3 were really computed...
    otree = calc_slot_tree(cfg)
    assert L.unpack(layers[-1])[0] == otree.root
    # a different config must NOT resume from this checkpoint
    cfg2 = SlotConfig(
        cell_size=64, block_size=256, n_cells=32, n_samples=1,
        data_src=DataSource("fake", seed=78),
    )
    from codex_storage_proofs_circuits_tpu.models.streaming import ChunkCheckpoint
    assert ChunkCheckpoint(ck, cfg2, 8).done == set()


@pytest.mark.parametrize("hash_fun", ["poseidon2", "monolith"])
def test_streaming_gl_matches_oracle(hash_fun):
    from codex_storage_proofs_circuits_tpu.models.streaming import (
        streaming_slot_root_gl,
    )
    from codex_storage_proofs_circuits_tpu.oracle.goldilocks_pipeline import (
        calc_slot_tree_gl,
    )

    cfg = SlotConfig(
        cell_size=256,
        block_size=2048,
        n_cells=64,
        n_samples=1,
        data_src=DataSource("fake", seed=12345),
    )
    got = streaming_slot_root_gl(cfg, hash_fun, chunk_cells=16)
    assert got == calc_slot_tree_gl(hash_fun, cfg).root


def test_streaming_gl_proof_input_matches_oracle():
    from codex_storage_proofs_circuits_tpu.models.gl_proof_input import (
        generate_proof_input_gl_streaming,
    )
    from codex_storage_proofs_circuits_tpu.oracle.dataset import (
        DataSetConfig,
        GlobalConfig,
    )
    from codex_storage_proofs_circuits_tpu.oracle.goldilocks import int_to_digest
    from codex_storage_proofs_circuits_tpu.oracle.goldilocks_pipeline import (
        generate_proof_input_gl,
    )

    glob = GlobalConfig(max_depth=16, max_log2_n_slots=4, cell_size=64,
                        block_size=256)
    dset = DataSetConfig(n_slots=3, n_cells=32, n_samples=4,
                         data_src=DataSource("fake", seed=5))
    want = generate_proof_input_gl("poseidon2", glob, dset, 1, int_to_digest(99))
    got = generate_proof_input_gl_streaming(
        "poseidon2", glob, dset, 1, int_to_digest(99), chunk_cells=8
    )
    assert got == want
