"""Chunked streaming slot build vs the one-shot device build and the oracle."""

import numpy as np
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
