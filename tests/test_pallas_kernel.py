"""Interpret-mode bit-exactness of the fused BN254 Pallas kernel vs the
oracle — DEFAULT-ON via reduced round schedules.

Interpreting the fully-unrolled 64-round kernel costs a ~20-minute XLA:CPU
compile (the graph is ~55k ops), so the full-schedule test stays gated
behind CSPC_SLOW_TESTS=1 (on TPU hardware tools/tpu_verify.py runs it in
seconds).  The default-on tests instead run the *same* `_perm_kernel` /
`_sponge2_kernel` through pl.pallas_call(interpret=True) with a reduced
round schedule (rounds=(1, 2, 1)): every piece of the kernel machinery —
CIOS Montgomery product, Kogge-Stone carry resolve, multi-threshold lazy
reduction, entry/exit canonicalisation, external+internal round bodies,
n_chains tile splitting, fused sponge absorb chaining — executes with the
production code path, checked against a Python-int mini-oracle running the
identical schedule (same round-constant columns).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from codex_storage_proofs_circuits_tpu.fields import bn254
from codex_storage_proofs_circuits_tpu.ops import limbs as L
from codex_storage_proofs_circuits_tpu.ops import poseidon2_pallas as K
from codex_storage_proofs_circuits_tpu.oracle import poseidon2 as O

REDUCED = (1, 2, 1)  # ext-first, internal, ext-last rounds (gated variants)


def mini_permutation(x: int, y: int, z: int, rounds=REDUCED):
    """Python-int permutation with the kernel's reduced schedule: the same
    round-constant columns the kernel uses for the rounds it runs
    (ext-first k -> EXTERNAL_ROUND_CONSTS[k], internal k ->
    INTERNAL_ROUND_CONSTS[k], ext-last k -> EXTERNAL_ROUND_CONSTS[4+k])."""
    re1, ri, re2 = rounds
    x, y, z = O._linear_layer(x, y, z)
    for k in range(re1):
        x, y, z = O._external_round(bn254.EXTERNAL_ROUND_CONSTS[k], x, y, z)
    for k in range(ri):
        x, y, z = O._internal_round(bn254.INTERNAL_ROUND_CONSTS[k], x, y, z)
    for k in range(re2):
        x, y, z = O._external_round(bn254.EXTERNAL_ROUND_CONSTS[4 + k], x, y, z)
    return x, y, z


def _random_state(rng, b):
    vals = [[int(rng.integers(0, 2**62)) for _ in range(b)] for _ in range(3)]
    vals[0][0], vals[1][0], vals[2][0] = 0, 1, 2
    mont = [[bn254.to_mont(v) for v in lane] for lane in vals]
    state = jnp.stack([L.pack(lane) for lane in mont])
    return vals, state


def test_perm_kernel_external_round_chains():
    """One external round through the real kernel, n_chains=2: entry
    canonicalisation, linear layer, 3 S-boxes (CIOS + norms + lazy
    reductions), external MDS, exit canonicalisation, chain splitting."""
    rng = np.random.default_rng(42)
    B, tile = 8, 8
    vals, state = _random_state(rng, B)
    out = K.permutation(
        state, batch_tile=tile, interpret=True, n_chains=2, rounds=(1, 0, 0)
    )
    got = [L.unpack(out[i]) for i in range(3)]
    for b in range(B):
        exp = mini_permutation(vals[0][b], vals[1][b], vals[2][b], (1, 0, 0))
        for i in range(3):
            assert got[i][b] == bn254.to_mont(exp[i]), (b, i)


def test_perm_kernel_internal_round_grid():
    """One internal round, 2 grid tiles: internal matrix, single-lane
    S-box, tile indexing."""
    rng = np.random.default_rng(3)
    B, tile = 16, 8
    vals, state = _random_state(rng, B)
    out = K.permutation(state, batch_tile=tile, interpret=True, rounds=(0, 1, 0))
    got = [L.unpack(out[i]) for i in range(3)]
    for b in range(B):
        exp = mini_permutation(vals[0][b], vals[1][b], vals[2][b], (0, 1, 0))
        for i in range(3):
            assert got[i][b] == bn254.to_mont(exp[i]), (b, i)


def test_sponge2_kernel_absorb_chain():
    """Fused sponge with 3 absorb blocks (fori_loop chaining, loose state
    between permutations) on a 1-ext-round schedule."""
    rng = np.random.default_rng(7)
    B, tile, nb = 8, 8, 3
    pairs = [
        [(int(rng.integers(0, 2**62)), int(rng.integers(0, 2**62))) for _ in range(nb)]
        for _ in range(B)
    ]
    blocks = np.zeros((nb, 2, K.NL, B), np.uint32)
    for b in range(B):
        for j, (a, c) in enumerate(pairs[b]):
            am, cm = bn254.to_mont(a), bn254.to_mont(c)
            for i in range(K.NL):
                blocks[j, 0, i, b] = (am >> (16 * i)) & 0xFFFF
                blocks[j, 1, i, b] = (cm >> (16 * i)) & 0xFFFF
    out = K.sponge2_absorb(
        jnp.asarray(blocks), batch_tile=tile, interpret=True, rounds=(1, 0, 0)
    )
    # n_chains=2 splits the tile lanes into two in-body dependence chains;
    # must be bit-identical (measured moot for throughput on HW — the fori
    # body already saturates scheduling — but the knob stays semantics-safe)
    out2 = K.sponge2_absorb(
        jnp.asarray(blocks),
        batch_tile=tile,
        interpret=True,
        rounds=(1, 0, 0),
        n_chains=2,
    )
    assert np.array_equal(np.asarray(out), np.asarray(out2))
    got = L.unpack(out)
    for b in range(B):
        x, y, z = 0, 0, O.SPONGE2_IV % bn254.P
        for a, c in pairs[b]:
            x, y, z = mini_permutation(
                (x + a) % bn254.P, (y + c) % bn254.P, z, (1, 0, 0)
            )
        assert got[b] == bn254.to_mont(x), b


@pytest.mark.skipif(
    os.environ.get("CSPC_SLOW_TESTS") != "1",
    reason="full 64-round interpret compile takes ~20 min; set CSPC_SLOW_TESTS=1"
    " (TPU hardware: tools/tpu_verify.py covers this in seconds)",
)
def test_kernel_interpret_matches_oracle_full_rounds():
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
