"""Pallas fake-PRNG kernel semantics vs the scan path and the host oracle.

The streaming pipeline's fake-data generator (reference mock backend,
reference/nim/proof_input/src/slot.nim:22-32) has two device
implementations: the portable lax.scan (`_gen_scan`) and the fused Pallas
kernel (`_gen_pallas`, TPU hot path).  These run the kernel in interpret
mode on CPU — default-on, so `make check` exercises the kernel's packed
u32 store layout and the (8, BT/8) tile reshape on every run.
"""

import numpy as np
import pytest

from codex_storage_proofs_circuits_tpu.ops import fake_prng as F
from codex_storage_proofs_circuits_tpu.oracle.slot import gen_fake_cell


@pytest.mark.parametrize("n_steps,B", [(64, F._BT_PRNG), (96, 2 * F._BT_PRNG)])
def test_pallas_matches_scan(n_steps, B):
    s1, s2 = F.fake_seed_planes(12345, 7, B)
    a = np.asarray(F._gen_scan(s1, s2, n_steps))
    b = np.asarray(F._gen_pallas(s1, s2, n_steps, interpret=True))
    assert a.dtype == b.dtype == np.uint8
    assert np.array_equal(a, b)


def test_pallas_matches_host_oracle():
    n_steps, B = 64, F._BT_PRNG
    seed, start = 424242, 11
    s1, s2 = F.fake_seed_planes(seed, start, B)
    rows = np.asarray(F._gen_pallas(s1, s2, n_steps, interpret=True))
    for i in (0, 1, B - 1):  # spot cells incl. the last lane of the tile
        assert rows[:, i].tobytes() == gen_fake_cell(n_steps, seed, start + i)


def test_gen_rows_dispatch_fallback():
    # B not divisible by the lane tile -> scan fallback, bit-exact either way
    s1, s2 = F.fake_seed_planes(5, 0, 96)
    rows = np.asarray(F.gen_rows(s1, s2, 32))
    assert rows[:, 0].tobytes() == gen_fake_cell(32, 5, 0)
