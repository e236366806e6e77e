"""Goldilocks field (p = 2^64 - 2^32 + 1) and hash instance constants.

The reference's Goldilocks track lives in the external pinned dependency
`nim-goldilocks-hash` (reference/nim/proof_input/proof_input.nimble:13), which
is NOT vendored in the reference repo; only the call surface is
(reference/nim/proof_input/src/merkle/goldilocks/{poseidon2,monolith}.nim,
types/goldilocks.nim).  This module therefore instantiates the two hash
functions from their public specifications with deterministic, reproducible
constant generation:

* Poseidon2-Goldilocks, t=12, alpha=7, RF=8, RP=22.  Round constants come
  from the canonical Grain-LFSR procedure of the Poseidon reference
  implementation (the same procedure Poseidon2 instances use); the internal
  diagonal is drawn from the same Grain stream.
* Monolith-64, t=12, 6 rounds.  Structure (Bars/Bricks/Concrete) per the
  Monolith paper; round constants from SHAKE-128 over a domain tag.

If cross-library vectors against the upstream `nim-goldilocks-hash` pin are
ever frozen, only the constant tables in this file need to be swapped — the
permutation code (oracle/goldilocks.py, ops/goldilocks_jnp.py) is
constant-table-driven.
"""

from __future__ import annotations

import hashlib

P_GL = (1 << 64) - (1 << 32) + 1  # Goldilocks prime

T = 12  # state width
RATE = 8  # sponge rate (reference merkle/goldilocks/poseidon2.nim:19-20)
CAPACITY = 4  # Digest = F4 (reference types/goldilocks.nim: Digest, F4)

# Poseidon2 schedule
RF = 8  # external (full) rounds, split 4 + 4
RP = 22  # internal (partial) rounds
ALPHA = 7  # S-box power (x^7; gcd(7, p-1) = 1)

# The 4x4 block of the Poseidon2 external matrix circ(2*M4, M4, ..., M4)
M4 = (
    (5, 7, 1, 3),
    (4, 6, 1, 1),
    (1, 3, 5, 7),
    (1, 1, 4, 6),
)


# ---------------------------------------------------------------------------
# Grain LFSR (the Poseidon reference constant-generation procedure).


class _GrainLFSR:
    """80-bit Grain LFSR, initialized per the Poseidon reference script:
    2 bits field type (GF(p)=01), 4 bits sbox (x^alpha=0000), 12 bits n,
    12 bits t, 10 bits RF, 10 bits RP, 30 ones; 160 warm-up bits dropped;
    self-shrinking output (emit a bit only when the preceding bit is 1)."""

    def __init__(self, n_bits: int, t: int, rf: int, rp: int):
        bits = []
        bits += [0, 1]  # field = GF(p)
        bits += [0, 0, 0, 0]  # sbox = x^alpha
        for width, val in ((12, n_bits), (12, t), (10, rf), (10, rp)):
            bits += [(val >> (width - 1 - i)) & 1 for i in range(width)]
        bits += [1] * 30
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._next_raw()

    def _next_raw(self) -> int:
        s = self.state
        b = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [b]
        return b

    def next_bit(self) -> int:
        while True:
            if self._next_raw() == 1:
                return self._next_raw()
            self._next_raw()

    def next_felt(self, p: int, n_bits: int) -> int:
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.next_bit()
            if v < p:
                return v


def _gen_poseidon2_constants():
    g = _GrainLFSR(64, T, RF, RP)
    ext = [[g.next_felt(P_GL, 64) for _ in range(T)] for _ in range(RF)]
    intr = [g.next_felt(P_GL, 64) for _ in range(RP)]
    # internal diagonal mu (M_I = J + diag(mu - 1)): nonzero, distinct draws
    diag = []
    while len(diag) < T:
        v = g.next_felt(P_GL, 64)
        if v not in (0, 1) and v not in diag:
            diag.append(v)
    return ext, intr, diag


P2GL_EXTERNAL_RC, P2GL_INTERNAL_RC, P2GL_INTERNAL_DIAG = _gen_poseidon2_constants()


# ---------------------------------------------------------------------------
# Monolith-64 t=12 constants.

MONOLITH_ROUNDS = 6
MONOLITH_BARS = 4  # Bars applied to the first 4 state elements


def _gen_monolith_constants():
    """Round constants from SHAKE-128 over a domain tag, 6 rounds x 12 felts;
    the final round adds no constants (Monolith paper round structure)."""
    shake = hashlib.shake_128()
    shake.update(b"Monolith")
    shake.update(bytes([T, MONOLITH_ROUNDS]))
    shake.update(P_GL.to_bytes(8, "little"))
    shake.update(bytes([8, 8, 8, 8, 8, 8, 8, 8]))  # bar limb widths
    stream = shake.digest(MONOLITH_ROUNDS * T * 8 * 4)
    pos = 0

    def draw():
        nonlocal pos
        while True:
            v = int.from_bytes(stream[pos : pos + 8], "little")
            pos += 8
            if v < P_GL:
                return v

    rc = [[draw() for _ in range(T)] for _ in range(MONOLITH_ROUNDS - 1)]
    rc.append([0] * T)  # last round: no constants
    return rc


MONOLITH_RC = _gen_monolith_constants()

# Concrete layer matrix: the t=12 circulant circ(2*M4, M4, M4) (the Poseidon2
# external matrix, MDS-like and cheap on TPU).  The upstream Monolith
# instance pins a searched circulant row inside the unvendored
# nim-goldilocks-hash; swap CONCRETE_USES_P2_EXTERNAL off and fill
# MONOLITH_CIRC_ROW to adopt it.
CONCRETE_USES_P2_EXTERNAL = True
MONOLITH_CIRC_ROW: tuple[int, ...] = ()


# ---------------------------------------------------------------------------
# External constant override (the "pin the upstream instance" hook).
#
# The exact Poseidon2-GL / Monolith tables of the reference's pinned
# `nim-goldilocks-hash` cannot be regenerated offline; this loader makes the
# pin a pure data drop: point CSPC_GL_CONSTANTS at a JSON file (or place
# `gl_instance.json` next to this module) and every table above is replaced
# before any consumer module reads it.  `export_constants()` writes the
# active tables in the same schema (64-bit values as decimal strings).

import json as _json
import os as _os

CONSTANTS_SOURCE = "derived-grain-shake"


def export_constants(path: str) -> None:
    data = {
        "poseidon2": {
            "external_rc": [[str(v) for v in row] for row in P2GL_EXTERNAL_RC],
            "internal_rc": [str(v) for v in P2GL_INTERNAL_RC],
            "diag": [str(v) for v in P2GL_INTERNAL_DIAG],
        },
        "monolith": {"rc": [[str(v) for v in row] for row in MONOLITH_RC]},
    }
    with open(path, "w") as f:
        _json.dump(data, f, indent=1)


def _maybe_load_external() -> None:
    global P2GL_EXTERNAL_RC, P2GL_INTERNAL_RC, P2GL_INTERNAL_DIAG
    global MONOLITH_RC, CONSTANTS_SOURCE
    path = _os.environ.get("CSPC_GL_CONSTANTS") or _os.path.join(
        _os.path.dirname(__file__), "gl_instance.json"
    )
    if not _os.path.exists(path):
        return
    with open(path) as f:
        data = _json.load(f)
    p2 = data.get("poseidon2", {})
    if p2:
        ext = [[int(v) for v in row] for row in p2["external_rc"]]
        intr = [int(v) for v in p2["internal_rc"]]
        diag = [int(v) for v in p2["diag"]]
        assert len(ext) == RF and all(len(r) == T for r in ext)
        assert len(intr) == RP and len(diag) == T
        assert all(0 <= v < P_GL for r in ext for v in r)
        assert all(0 <= v < P_GL for v in intr + diag)
        P2GL_EXTERNAL_RC, P2GL_INTERNAL_RC, P2GL_INTERNAL_DIAG = ext, intr, diag
    mono = data.get("monolith", {})
    if mono:
        rc = [[int(v) for v in row] for row in mono["rc"]]
        assert len(rc) == MONOLITH_ROUNDS and all(len(r) == T for r in rc)
        assert all(0 <= v < P_GL for r in rc for v in r)
        MONOLITH_RC = rc
    CONSTANTS_SOURCE = f"external:{path}"


_maybe_load_external()
