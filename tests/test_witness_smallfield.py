"""Exhaustive template-semantics tests over the 65537 test field.

The reference enumerates its lib-template semantics exhaustively over tiny
proving fields with the r1cs-solver harness (test/Main.hs:22-44,
test/Circuit/*.hs; the 65537 field has a dedicated circuit variant,
circuit/lib/extract_bits.circom:50-73, because prime-bit constants differ).
The witness evaluator (models/witness.py) is parameterized the same way:
these tests run the template walkers with WitnessBundle(p=65537) and
enumerate the full input space, positive and ShouldFail cases alike —
BinaryCompare over the complete n-bit cross-product for n <= 7,
ExtractLowerBits over EVERY field element, Log2/CeilingLog2 over the
reference harness's ranges.
"""

import pytest

from codex_storage_proofs_circuits_tpu.models.witness import (
    ConstraintError,
    WitnessBundle,
    _Ctx,
    _binary_compare,
    _ceiling_log2,
    _extract_lower_bits,
    _is_equal,
    _log2,
    _to_bits,
)

F = 65537  # the reference's test field (extract_bits.circom:50)


def _gen_eval(walk):
    """Run a template walker in gen mode then re-evaluate every constraint."""
    w = WitnessBundle(p=F)
    out = walk(_Ctx(w, gen=True))
    walk(_Ctx(w, gen=False))
    return w, out


def _bits(v, n):
    return [(v >> i) & 1 for i in range(n)]


@pytest.mark.parametrize("n", range(2, 8))
def test_binary_compare_exhaustive(n):
    """Full n-bit cross-product (the reference does n in {4,5,7},
    Circuit/BinaryCompare.hs:36-58; here every n in 2..7)."""
    for a in range(1 << n):
        for b in range(1 << n):
            _, out = _gen_eval(
                lambda c, a=a, b=b: _binary_compare(
                    c, "bc", _bits(a, n), _bits(b, n)
                )
            )
            want = 1 if a > b else (0 if a == b else F - 1)
            assert out == want, (n, a, b)


def test_binary_compare_tamper_rejected():
    n = 4
    for sig, delta in (("bc.eq[2]", 1), ("bc.jump[1]", 1), ("bc.aux[0]", 3),
                       ("bc.out", 1)):
        w = WitnessBundle(p=F)
        _binary_compare(_Ctx(w, gen=True), "bc", _bits(9, n), _bits(5, n))
        w.values[sig] = (w.values[sig] + delta) % F
        with pytest.raises(ConstraintError):
            _binary_compare(_Ctx(w, gen=False), "bc", _bits(9, n), _bits(5, n))


def test_extract_lower_bits_exhaustive_all_field_elements():
    """Every element of F_65537, the ExtractLowerBits_testfield65537
    analogue: 17-bit decomposition + enforced bits < 65537."""
    for n in (1, 4, 16):
        for inp in range(F):
            w = WitnessBundle(p=F)
            got = _extract_lower_bits(_Ctx(w, gen=True), "x", inp, n)
            assert got == _bits(inp, n), (n, inp)
        # spot re-evaluation across the range (full re-eval of 65537 cases
        # triples runtime for no new coverage; the constraint system is
        # identical per input)
        for inp in range(0, F, 257):
            _, got = _gen_eval(lambda c, inp=inp: _extract_lower_bits(c, "x", inp, n))
            assert got == _bits(inp, n)


def test_extract_lower_bits_rejects_overwide_decomposition():
    """A 17-bit decomposition encoding a value >= p must fail the < r
    compare: witness bits claiming inp + p (impossible value) are rejected."""
    inp = 10
    w = WitnessBundle(p=F)
    _extract_lower_bits(_Ctx(w, gen=True), "x", inp, 4)
    # tamper: represent inp as itself (bits) but flip the top decomposition
    # bit so the binary value is inp + 2^16 ... + adjust bit 0 to keep the
    # weighted sum equal mod p: 2^16 == p - 1 - (2^0 - ...)  Actually
    # inp + 2^16 ≡ inp - 1 (mod p), so ALSO flip bit 0 of inp-1... simplest
    # equivalent-sum tamper: bits of (inp - 1) + 2^16 == inp + p - 2... use
    # the canonical shifted-decomposition attack: bits encode inp + p
    alt = inp + F  # needs 18 bits -> cannot fit 17; use inp - 1 + 2^16 + 1?
    # inp + p = inp + 2^16 + 1: bits = inp+1 plus bit16, fits 17 bits when
    # inp + 1 < 2^16
    alt_bits = _bits(inp + 1, 16) + [1]
    for i, b in enumerate(alt_bits):
        w.values[f"x.tb.out[{i}]"] = b
    with pytest.raises(ConstraintError):
        _extract_lower_bits(_Ctx(w, gen=False), "x", inp, 4)


@pytest.mark.parametrize("n", range(1, 8))
def test_log2_exhaustive(n):
    """Log2(n) over inputs 0..2^(n+1)+3 (Circuit/Log2.hs:19-67): accepts
    exactly inp == 2^out with 0 < out <= n (log2.circom:7-8 — note inp=1
    FAILS via mask[0] === 1); everything else ShouldFail."""
    for inp in range(0, (1 << (n + 1)) + 4):
        w = WitnessBundle(p=F)
        _log2(_Ctx(w, gen=True), "lg", inp, n)
        ok = inp >= 2 and (inp & (inp - 1)) == 0 and inp <= (1 << n)
        if ok:
            out, mask = _log2(_Ctx(w, gen=False), "lg", inp, n)
            assert out == inp.bit_length() - 1
            assert mask == [1 if (1 << i) < inp else 0 for i in range(n + 1)]
        else:
            with pytest.raises(ConstraintError):
                _log2(_Ctx(w, gen=False), "lg", inp, n)


@pytest.mark.parametrize("n", range(1, 8))
def test_ceiling_log2_exhaustive(n):
    """CeilingLog2(n) over 1..2^n (Circuit/CeilingLog2.hs:32-68): out,
    bits of inp-1 and the mask 2^ceil(log2 inp) - 1 all checked."""
    for inp in range(1, (1 << n) + 1):
        _, (out, bits, mask) = _gen_eval(
            lambda c, inp=inp: _ceiling_log2(c, "cl", inp, n)
        )
        want = (inp - 1).bit_length()
        assert out == want, (n, inp)
        assert bits == _bits(inp - 1, n)
        want_mask = (1 << want) - 1
        assert sum(m << i for i, m in enumerate(mask)) == want_mask


def test_to_bits_and_is_equal_small_field():
    for v in range(0, F, 641):
        _, bits = _gen_eval(lambda c, v=v: _to_bits(c, "tb", v, 17))
        assert bits == _bits(v, 17)
    for a in range(0, 40):
        for b in range(0, 40):
            _, out = _gen_eval(lambda c, a=a, b=b: _is_equal(c, "ie", a, b))
            assert out == (1 if a == b else 0)
