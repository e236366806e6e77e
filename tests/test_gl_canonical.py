"""Canonical-instance anchors for the Goldilocks hash constants.

The reference's Goldilocks track is computed by the pinned
`nim-goldilocks-hash` (reference/nim/proof_input/proof_input.nimble:13),
which implements the published canonical instances.  These tests pin the
repo's tables (fields/goldilocks.py) to values transcribed from the
published sources, independently of the generation procedures:

* Poseidon2-Goldilocks t=12, alpha=7, R_F=8, R_P=22 — HorizenLabs/poseidon2
  `poseidon2_instance_goldilocks.rs` (RC12, MAT_DIAG12_M_1), mirrored by
  Plonky3 `goldilocks/src/poseidon2.rs`
  (HL_GOLDILOCKS_12_{EXTERNAL,INTERNAL}_ROUND_CONSTANTS,
  MATRIX_DIAG_12_GOLDILOCKS).
* Monolith-64 t=12, R=6 — the Monolith paper (eprint 2023/1025): SHAKE-128
  round constants, Plonky2-compatible Concrete matrix
  (Plonky2 `hash/poseidon.rs` MDS_MATRIX_CIRC/MDS_MATRIX_DIAG).

Because each constant table is the prefix-anchored output of one
deterministic stream (Grain LFSR / SHAKE-128), matching the transcribed
head certifies the full table.
"""

from codex_storage_proofs_circuits_tpu.fields import goldilocks as G

# Transcribed: Plonky3 HL_GOLDILOCKS_12_EXTERNAL_ROUND_CONSTANTS[0]
# == HorizenLabs RC12 external round 0.
PUBLISHED_EXTERNAL_RC0 = (
    0x13DCF33ABA214F46,
    0x30B3B654A1DA6D83,
    0x1FC634ADA6159B56,
    0x937459964DC03466,
    0xEDD2EF2CA7949924,
    0xEDE9AFFDE0E22F68,
    0x8515B9D6BAC9282D,
    0x6B5C07B4E9E900D8,
    0x1EC66368838C8A08,
    0x9042367D80D1FBAB,
    0x400283564A3C3799,
    0x4A00BE0466BCA75E,
)

# Transcribed: Plonky3 HL_GOLDILOCKS_12_INTERNAL_ROUND_CONSTANTS[0].
PUBLISHED_INTERNAL_RC0 = 0x4ADF842AA75D4316

# Transcribed: HorizenLabs MAT_DIAG12_M_1 == Plonky3
# MATRIX_DIAG_12_GOLDILOCKS (M_I = J + diag(v); searched, not Grain output).
PUBLISHED_DIAG_M1 = (
    0xC3B6C08E23BA9300,
    0xD84B5DE94A324FB6,
    0x0D0C371C5B35B84F,
    0x7964F570E7188037,
    0x5DAF18BBD996604B,
    0x6743BC47B9595257,
    0x5528B9362C59BB70,
    0xAC45E25B7127B68B,
    0xA2077D7DFBB606B5,
    0xF3FAAC6FAEE378AE,
    0x0C6388B51545E883,
    0xD27DBB6944917B60,
)

# Transcribed: Plonky2 GoldilocksField Poseidon MDS (the Monolith paper's
# t=12 Concrete choice).
PLONKY2_MDS_CIRC = (17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20)
PLONKY2_MDS_DIAG0 = 8


def test_constants_source_is_canonical():
    assert G.CONSTANTS_SOURCE == "canonical"


def test_poseidon2_external_rc_round0_matches_published():
    assert tuple(G.P2GL_EXTERNAL_RC[0]) == PUBLISHED_EXTERNAL_RC0


def test_poseidon2_internal_rc0_matches_published():
    assert G.P2GL_INTERNAL_RC[0] == PUBLISHED_INTERNAL_RC0


def test_poseidon2_schedule_shape():
    assert len(G.P2GL_EXTERNAL_RC) == 8
    assert all(len(r) == 12 for r in G.P2GL_EXTERNAL_RC)
    assert len(G.P2GL_INTERNAL_RC) == 22
    assert all(0 <= v < G.P_GL for r in G.P2GL_EXTERNAL_RC for v in r)
    assert all(0 <= v < G.P_GL for v in G.P2GL_INTERNAL_RC)


def test_internal_diag_matches_published():
    assert tuple(G.P2GL_INTERNAL_DIAG_M1) == PUBLISHED_DIAG_M1
    # consumer contract: P2GL_INTERNAL_DIAG holds the full diagonal of
    # M_I = J + diag(v), i.e. v + 1
    assert tuple(G.P2GL_INTERNAL_DIAG) == tuple(
        (v + 1) % G.P_GL for v in PUBLISHED_DIAG_M1
    )


def test_monolith_concrete_is_plonky2_mds():
    T = G.T
    for r in range(T):
        for c in range(T):
            want = PLONKY2_MDS_CIRC[(c - r) % T] + (
                PLONKY2_MDS_DIAG0 if (r == c and r == 0) else 0
            )
            assert G.MONOLITH_CONCRETE[r][c] == want
    # MDS sanity: circulant + diag must be invertible mod p (necessary
    # condition; full MDS check is the published matrix's property)
    import numpy as np

    M = np.array(G.MONOLITH_CONCRETE, dtype=object)
    # det mod p via fraction-free Gaussian elimination
    p = G.P_GL
    A = [[int(v) % p for v in row] for row in G.MONOLITH_CONCRETE]
    det = 1
    for i in range(T):
        piv = next((r for r in range(i, T) if A[r][i] % p), None)
        assert piv is not None
        if piv != i:
            A[i], A[piv] = A[piv], A[i]
            det = -det
        det = det * A[i][i] % p
        inv = pow(A[i][i], p - 2, p)
        for r in range(i + 1, T):
            f = A[r][i] * inv % p
            for c in range(i, T):
                A[r][c] = (A[r][c] - f * A[i][c]) % p
    assert det % p != 0


def test_monolith_rc_shape_and_last_round_zero():
    assert len(G.MONOLITH_RC) == G.MONOLITH_ROUNDS == 6
    assert all(len(r) == 12 for r in G.MONOLITH_RC)
    assert all(v == 0 for v in G.MONOLITH_RC[-1])
    assert all(0 <= v < G.P_GL for r in G.MONOLITH_RC[:-1] for v in r)
    # constants must be SHAKE output, not degenerate
    assert any(v != 0 for r in G.MONOLITH_RC[:-1] for v in r)


def test_monolith_shake_stream_head():
    """The SHAKE-128 domain ("Monolith" || [t,R] || p_le8 || [8]*8) is a
    deterministic procedure; freeze its head so accidental domain changes
    are caught without re-deriving downstream digests."""
    import hashlib

    shake = hashlib.shake_128()
    shake.update(b"Monolith")
    shake.update(bytes([12, 6]))
    shake.update(G.P_GL.to_bytes(8, "little"))
    shake.update(bytes([8] * 8))
    first = int.from_bytes(shake.digest(8), "little")
    # first draw (possibly rejected) must seed MONOLITH_RC[0][0]
    if first < G.P_GL:
        assert G.MONOLITH_RC[0][0] == first


def test_grain_stream_is_single_sequence():
    """Regenerating with the canonical procedure reproduces the module
    tables (guards the import-time generation against drift)."""
    ext, intr = G._gen_poseidon2_round_constants()
    assert ext == G.P2GL_EXTERNAL_RC
    assert intr == G.P2GL_INTERNAL_RC
