"""Oracle Poseidon2 tests: KAT anchor + frozen vector suites + padding edges."""

import json
import pathlib

from codex_storage_proofs_circuits_tpu.fields.bn254 import (
    P,
    PERMUTATION_KAT_INPUT,
    PERMUTATION_KAT_OUTPUT,
)
from codex_storage_proofs_circuits_tpu.oracle.poseidon2 import (
    permutation,
    compression,
    keyed_compression,
    sponge1,
    sponge2,
)

VECTORS = json.load(
    open(pathlib.Path(__file__).parent / "vectors" / "bn254_testvectors.json")
)


def test_permutation_kat():
    # reference/haskell/src/Poseidon2/Example.hs:13-19
    assert permutation(PERMUTATION_KAT_INPUT) == PERMUTATION_KAT_OUTPUT


def test_permutation_range():
    out = permutation((P - 1, P - 2, 12345))
    assert all(0 <= v < P for v in out)


def test_compression_is_keyed_zero():
    assert compression(7, 11) == keyed_compression(0, 7, 11)
    assert compression(7, 11) == permutation((7, 11, 0))[0]
    # distinct keys must give distinct results
    outs = {keyed_compression(k, 7, 11) for k in range(4)}
    assert len(outs) == 4


def test_sponge_vectors():
    # mirrors testvectors.nim:20-35 / TestVectors.hs:28-42
    for n in range(0, 9):
        inp = list(range(1, n + 1))
        assert str(sponge1(inp)) == VECTORS["sponge_rate1_felts"][n]
        assert str(sponge2(inp)) == VECTORS["sponge_rate2_felts"][n]


def test_sponge2_padding_block_structure():
    # empty input absorbs exactly one block (1,0); one elem absorbs (x,1)
    from codex_storage_proofs_circuits_tpu.oracle.poseidon2 import SPONGE2_IV

    civ = SPONGE2_IV % P
    assert sponge2([]) == permutation((1, 0, civ))[0]
    assert sponge2([42]) == permutation((42, 1, civ))[0]
    # two elems: two blocks (x,y) then (1,0)
    st = permutation((5, 9, civ))
    assert sponge2([5, 9]) == permutation(((st[0] + 1) % P, st[1], st[2]))[0]


def test_sponge1_padding_block_structure():
    from codex_storage_proofs_circuits_tpu.oracle.poseidon2 import SPONGE1_IV

    civ = SPONGE1_IV % P
    assert sponge1([]) == permutation((1, 0, civ))[0]
    st = permutation((3, 0, civ))
    assert sponge1([3]) == permutation(((st[0] + 1) % P, st[1], st[2]))[0]
