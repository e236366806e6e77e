"""Interpret-mode bit-exactness of the fused Pallas kernel vs the oracle.

Opt-in (CSPC_SLOW_TESTS=1): interpreting the fully-unrolled 64-round kernel
takes ~20 minutes on CPU.  On TPU hardware the same check runs in seconds
via tools/tpu_verify.py, and bench.py exercises the kernel every round.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from codex_storage_proofs_circuits_tpu.fields import bn254
from codex_storage_proofs_circuits_tpu.ops import limbs as L
from codex_storage_proofs_circuits_tpu.ops import poseidon2_pallas as K
from codex_storage_proofs_circuits_tpu.oracle import poseidon2 as O

pytestmark = pytest.mark.skipif(
    os.environ.get("CSPC_SLOW_TESTS") != "1",
    reason="interpret-mode kernel run takes ~20 min; set CSPC_SLOW_TESTS=1",
)


def test_kernel_interpret_matches_oracle():
    rng = np.random.default_rng(42)
    B = 8
    vals = [[int(rng.integers(0, 2**62)) for _ in range(B)] for _ in range(3)]
    vals[0][0], vals[1][0], vals[2][0] = 0, 1, 2  # KAT column
    mont = [[bn254.to_mont(v) for v in lane] for lane in vals]
    state = jnp.stack([L.pack(lane) for lane in mont])
    out = K.permutation(state, batch_tile=B, interpret=True)
    got = [L.unpack(out[i]) for i in range(3)]
    for b in range(B):
        exp = O.permutation((vals[0][b], vals[1][b], vals[2][b]))
        for i in range(3):
            assert got[i][b] == bn254.to_mont(exp[i]), (b, i)
