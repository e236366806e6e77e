"""Witness-level constraint evaluation: per-template semantics + negative
(ShouldFail) cases + full SampleAndProve tamper detection.

Mirrors the reference's r1cs-solver test strategy (test/Circuit/*.hs,
SURVEY.md section 4.1): each lib template is checked over exhaustive small
input spaces including cases that MUST fail, and the full circuit witness is
tampered signal-by-signal to confirm every constrained value is load-bearing.
"""

import random

import pytest

from codex_storage_proofs_circuits_tpu.fields.bn254 import P
from codex_storage_proofs_circuits_tpu.models import witness as W
from codex_storage_proofs_circuits_tpu.models.witness import (
    ConstraintError,
    WitnessBundle,
    _Ctx,
    _binary_compare,
    _ceiling_log2,
    _extract_lower_bits,
    _is_equal,
    _log2,
    _root_from_merkle_path,
    _to_bits,
)
from codex_storage_proofs_circuits_tpu.oracle.dataset import (
    DataSetConfig,
    GlobalConfig,
)
from codex_storage_proofs_circuits_tpu.oracle.sampling import generate_proof_input
from codex_storage_proofs_circuits_tpu.oracle.slot import DataSource
from codex_storage_proofs_circuits_tpu.oracle.merkle import merkle_tree, extract_proof


def _gen_then_eval(build):
    """Run a template builder in gen mode, then re-evaluate the bundle."""
    w = WitnessBundle()
    build(_Ctx(w, gen=True))
    build(_Ctx(w, gen=False))
    return w


# ---------------------------------------------------------------------------
# ToBits / BinaryCompare


def test_to_bits_roundtrip_and_range():
    for v in [0, 1, 5, 255, 256]:
        w = _gen_then_eval(lambda c, v=v: _to_bits(c, "tb", v, 9))
        assert [w[f"tb.out[{i}]"] for i in range(9)] == [(v >> i) & 1 for i in range(9)]
    # inp >= 2^n: witness generation produces bits that can't sum to inp
    w = WitnessBundle()
    _to_bits(_Ctx(w, gen=True), "tb", 512, 9)
    with pytest.raises(ConstraintError):
        _to_bits(_Ctx(w, gen=False), "tb", 512, 9)


def test_to_bits_nonboolean_rejected():
    w = WitnessBundle()
    _to_bits(_Ctx(w, gen=True), "tb", 6, 4)
    w.values["tb.out[1]"] = 2  # 2*1 + 4*1 == 6 as a sum, but not boolean
    w.values["tb.out[2]"] = 0
    with pytest.raises(ConstraintError):
        _to_bits(_Ctx(w, gen=False), "tb", 6, 4)


@pytest.mark.parametrize("n", [4, 5])
def test_binary_compare_exhaustive(n):
    # full cross-product like test/Circuit/BinaryCompare.hs:36-58
    for a in range(1 << n):
        for b in range(1 << n):
            A = [(a >> i) & 1 for i in range(n)]
            B = [(b >> i) & 1 for i in range(n)]
            w = _gen_then_eval(lambda c: _binary_compare(c, "bc", A, B))
            out = w["bc.out"]
            want = 0 if a == b else (1 if a > b else P - 1)
            assert out == want, (a, b, out)


# ---------------------------------------------------------------------------
# ExtractLowerBits: the <r enforcement is the whole point


def test_extract_lower_bits_basic():
    for v in [0, 1, 0xDEADBEEF, P - 1]:
        w = _gen_then_eval(lambda c, v=v: _extract_lower_bits(c, "eb", v, 16))
        got = sum(w[f"eb.tb.out[{i}]"] << i for i in range(16))
        assert got == v & 0xFFFF


def test_extract_lower_bits_rejects_shifted_decomposition():
    """bits(inp + P) also satisfies the ToBits sum mod r (2^253 < P < 2^254),
    but must be rejected by the enforced `bits < r` (extract_bits.circom:30-36)
    — the attack that would let a prover choose different low bits."""
    inp = 12345
    alt = inp + P  # < 2^254, so it has a 254-bit decomposition
    w = WitnessBundle()
    _extract_lower_bits(_Ctx(w, gen=True), "eb", inp, 16)
    # overwrite the decomposition with bits(inp + P) and fix up the compare
    for i in range(254):
        w.values[f"eb.tb.out[{i}]"] = (alt >> i) & 1
    # booleanity and the sum check still hold; the comparison chain must trip
    with pytest.raises(ConstraintError):
        _extract_lower_bits(_Ctx(w, gen=False), "eb", inp, 16)


# ---------------------------------------------------------------------------
# Log2 / CeilingLog2  (ShouldFail analogues of test/Circuit/Log2.hs:33-36)


def test_log2_powers_and_failures():
    n = 7
    for k in range(1, n + 1):
        w = _gen_then_eval(lambda c, k=k: _log2(c, "lg", 1 << k, n))
        assert w["lg.out"] == k
    # non-powers-of-two (and 0, 1) must fail: Log2 requires 0 < out <= n
    for bad in [0, 1, 3, 5, 6, 7, 100, (1 << n) + 1]:
        w = WitnessBundle()
        _log2(_Ctx(w, gen=True), "lg", bad, n)
        with pytest.raises(ConstraintError):
            _log2(_Ctx(w, gen=False), "lg", bad, n)


def test_log2_mask_tamper_rejected():
    w = WitnessBundle()
    _log2(_Ctx(w, gen=True), "lg", 16, 7)
    w.values["lg.mask[2]"] = 0  # break the 1..1 0..0 shape
    with pytest.raises(ConstraintError):
        _log2(_Ctx(w, gen=False), "lg", 16, 7)


def test_ceiling_log2_values():
    # matches CeilingLog2 semantics: out = k with 2^k <= ... inp-1 bits
    n = 6
    expect = {1: 0, 2: 1, 3: 2, 4: 2, 5: 3, 8: 3, 9: 4, 16: 4, 17: 5, 33: 6}
    for inp, k in expect.items():
        w = _gen_then_eval(lambda c, inp=inp: _ceiling_log2(c, "cl", inp, n))
        assert w["cl.out"] == k, (inp, w["cl.out"])
        mask = [w[f"cl.mask[{i}]"] for i in range(n + 1)]
        assert mask == [1] * k + [0] * (n + 1 - k)


# ---------------------------------------------------------------------------
# RootFromMerklePath: singleton fixup + odd/even keys vs the oracle


def _walk(c, leaf, idx, tree_size, depth, path):
    path_bits = [(idx >> i) & 1 for i in range(depth)]
    last_bits = [((tree_size - 1) >> i) & 1 for i in range(depth)]
    k = (tree_size - 1).bit_length() if tree_size > 1 else 0
    mask_bits = [1] * k + [0] * (depth + 1 - k)
    return _root_from_merkle_path(c, "mp", leaf, path_bits, last_bits, mask_bits, path)


@pytest.mark.parametrize("size", [1, 2, 3, 5, 8])
def test_root_from_merkle_path_vs_oracle(size):
    leaves = [1000 + 7 * i for i in range(size)]
    tree = merkle_tree(leaves)
    depth = 4
    for idx in range(size):
        prf = extract_proof(tree, idx)
        path = list(prf.merkle_path) + [0] * (depth - len(prf.merkle_path))
        outer = {}

        def build(c):
            outer["root"] = _walk(c, leaves[idx], idx, size, depth, path)

        _gen_then_eval(build)
        assert outer["root"] == tree.root, (size, idx)


def test_root_from_merkle_path_singleton_fixup():
    """size=1: maskBits are all zero; maskBitsCorrected[0]=1 must still
    select the depth-1 node (merkle.circom:53-62)."""
    tree = merkle_tree([42])
    outer = {}

    def build(c):
        outer["root"] = _walk(c, 42, 0, 1, 3, [0, 0, 0])

    _gen_then_eval(build)
    assert outer["root"] == tree.root


# ---------------------------------------------------------------------------
# Full SampleAndProve witness: evaluation + tamper sweep


@pytest.fixture(scope="module")
def small_proof():
    glob = GlobalConfig(max_depth=8, max_log2_n_slots=3, cell_size=64, block_size=128)
    dset = DataSetConfig(
        n_slots=3, n_cells=8, n_samples=2, data_src=DataSource("fake", seed=99)
    )
    pi = generate_proof_input(glob, dset, slot_index=1, entropy=0xABCDEF)
    return glob, pi


def test_witness_evaluates_clean(small_proof):
    glob, pi = small_proof
    w = W.generate_witness(glob, pi)
    W.evaluate_witness(glob, pi, w)  # no raise
    assert len(w.values) > 500


def test_witness_tamper_any_signal_caught(small_proof):
    glob, pi = small_proof
    w = W.generate_witness(glob, pi)
    names = [n for n in w.values if n not in w.free]
    rng = random.Random(4)
    sample = rng.sample(names, 25)
    # make sure structurally interesting signals are always covered
    sample += [
        n
        for n in names
        if n.endswith(("lg.out", "clog.out", "mtop.aux[1]", "s0.calci.md.le.out"))
    ]
    for name in set(sample):
        w2 = WitnessBundle(dict(w.values), set(w.free))
        w2.values[name] = (w2.values[name] + 1) % P
        with pytest.raises(ConstraintError):
            W.evaluate_witness(glob, pi, w2)


def test_witness_tamper_proof_input_caught(small_proof):
    glob, pi = small_proof
    w = W.generate_witness(glob, pi)
    import dataclasses

    bad = dataclasses.replace(pi, data_set_root=(pi.data_set_root + 1) % P)
    with pytest.raises(ConstraintError):
        W.evaluate_witness(glob, bad, w)
