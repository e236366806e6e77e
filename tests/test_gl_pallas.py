"""Goldilocks Pallas kernel semantics vs the scalar oracle (interpret mode).

The full 30-round unrolled permutation takes minutes to compile under the
XLA:CPU interpreter on small hosts, so CPU CI checks each kernel building
block in a mini pallas_call instead; the composed permutation / sponge are
verified bit-exactly on real TPU hardware by tools/gl_tpu_verify.py and by
the routed pipeline tests (the jnp path shares none of this code, so
agreement of both with the oracle is two independent proofs).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from codex_storage_proofs_circuits_tpu.ops import goldilocks_pallas as K
from codex_storage_proofs_circuits_tpu.oracle import goldilocks as O
from codex_storage_proofs_circuits_tpu.fields import goldilocks as G

T, NL = K.T, K.NL
B = 8


def _pack(vals: np.ndarray) -> jnp.ndarray:
    arr = np.zeros((NL * T, vals.shape[1]), np.uint32)
    for k in range(NL):
        arr[k * T : (k + 1) * T, :] = ((vals >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(
            np.uint32
        )
    return jnp.asarray(arr)


def _unpack(out: np.ndarray, b: int) -> list[int]:
    return [
        int(sum(int(out[k * T + l, b]) << (16 * k) for k in range(NL)))
        for l in range(T)
    ]


def _run(kern, *arrs):
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NL * T, B), jnp.uint32),
        interpret=True,
    )(*arrs)
    return np.asarray(jax.device_get(out))


def _rand(rng):
    return rng.integers(0, O.P_GL, size=(T, B), dtype=np.uint64)


def test_mul_add_canon():
    rng = np.random.default_rng(5)
    av, bv = _rand(rng), _rand(rng)

    def kern(a_ref, b_ref, o_ref):
        a4 = K._split_state(a_ref)
        b4 = K._split_state(b_ref)
        m = K._canon(K._mul(a4, b4))
        s = K._canon(K._add(a4, b4))
        # interleave: rows 0..5 of each limb from the product, 6..11 from the sum
        for k in range(NL):
            o_ref[k * T : k * T + 6, :] = m[k][0:6]
            o_ref[k * T + 6 : (k + 1) * T, :] = s[k][6:12]

    out = _run(kern, _pack(av), _pack(bv))
    for b in range(B):
        got = _unpack(out, b)
        for l in range(6):
            assert got[l] == int(av[l, b]) * int(bv[l, b]) % O.P_GL
        for l in range(6, T):
            assert got[l] == (int(av[l, b]) + int(bv[l, b])) % O.P_GL


def test_mul_loose_edge_values():
    """Loose inputs (< 2^64, >= p) and the p-1 / 0 / 2^32 edge family."""
    edge = [0, 1, O.P_GL - 1, O.P_GL, (1 << 64) - 1, 1 << 32, (1 << 32) - 1,
            O.P_GL + 12345]
    av = np.array([edge + [7] * (T - len(edge))] * B, dtype=np.uint64).T
    bv = np.array([list(reversed(edge)) + [9] * (T - len(edge))] * B, dtype=np.uint64).T

    def kern(a_ref, b_ref, o_ref):
        a4 = K._split_state(a_ref)
        b4 = K._split_state(b_ref)
        m = K._canon(K._mul(a4, b4))
        for k in range(NL):
            o_ref[k * T : (k + 1) * T, :] = m[k]

    out = _run(kern, _pack(av), _pack(bv))
    for b in range(2):
        got = _unpack(out, b)
        for l in range(T):
            assert got[l] == int(av[l, b]) * int(bv[l, b]) % O.P_GL, l


def test_external_linear_matches_oracle():
    rng = np.random.default_rng(7)
    av = _rand(rng)

    def kern(a_ref, o_ref):
        f4 = K._canon(K._external_linear(K._split_state(a_ref)))
        for k in range(NL):
            o_ref[k * T : (k + 1) * T, :] = f4[k]

    out = _run(kern, _pack(av))
    for b in range(B):
        exp = O._external_linear([int(v) for v in av[:, b]])
        assert _unpack(out, b) == exp


def test_internal_round_matches_oracle():
    rng = np.random.default_rng(9)
    av = _rand(rng)
    r = 3

    def kern(rc_ref, a_ref, o_ref):
        bt = a_ref.shape[1]

        def rc(col, k):
            return jnp.broadcast_to(rc_ref[k * T : (k + 1) * T, col : col + 1], (T, bt))

        f4 = K._split_state(a_ref)
        f4 = K._add_rc_lane0(f4, rc, K.INT_RC_COL0 + r)
        f4 = K._sbox7_lane0(f4)
        f4 = K._canon(K._internal_linear(f4, rc))
        for k in range(NL):
            o_ref[k * T : (k + 1) * T, :] = f4[k]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NL * T, B), jnp.uint32),
        interpret=True,
    )(jnp.asarray(K.RC_TABLE), _pack(av))
    out = np.asarray(jax.device_get(out))
    for b in range(B):
        s = [int(v) for v in av[:, b]]
        s[0] = O._sbox7((s[0] + G.P2GL_INTERNAL_RC[r]) % O.P_GL)
        exp = O._internal_linear(s)
        assert _unpack(out, b) == exp


def test_external_round_matches_oracle():
    rng = np.random.default_rng(11)
    av = _rand(rng)
    r = 2

    def kern(rc_ref, a_ref, o_ref):
        bt = a_ref.shape[1]

        def rc(col, k):
            return jnp.broadcast_to(rc_ref[k * T : (k + 1) * T, col : col + 1], (T, bt))

        f4 = K._split_state(a_ref)
        f4 = K._add_rc(f4, rc, r)
        f4 = K._sbox7_all(f4)
        f4 = K._canon(K._external_linear(f4))
        for k in range(NL):
            o_ref[k * T : (k + 1) * T, :] = f4[k]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NL * T, B), jnp.uint32),
        interpret=True,
    )(jnp.asarray(K.RC_TABLE), _pack(av))
    out = np.asarray(jax.device_get(out))
    for b in range(B):
        s = [int(v) for v in av[:, b]]
        s = [O._sbox7((v + c) % O.P_GL) for v, c in zip(s, G.P2GL_EXTERNAL_RC[r])]
        exp = O._external_linear(s)
        assert _unpack(out, b) == exp


def test_monolith_round_matches_oracle():
    """One full Monolith round (Bars -> Bricks -> Concrete -> +RC)."""
    rng = np.random.default_rng(13)
    av = _rand(rng)
    r = 1

    def kern(rc_ref, a_ref, o_ref):
        bt = a_ref.shape[1]

        def rc(col, k):
            return jnp.broadcast_to(rc_ref[k * T : (k + 1) * T, col : col + 1], (T, bt))

        nb = G.MONOLITH_BARS
        f4 = K._split_state(a_ref)
        rows = K._canon([f4[k][:nb] for k in range(NL)])
        rows = K._canon([K._bar_limb16(v) for v in rows])
        f4 = [jnp.concatenate([rows[k], f4[k][nb:]], axis=0) for k in range(NL)]
        sq = K._mul(f4, f4)
        zero1 = jnp.zeros_like(f4[0][0:1])
        shifted = [jnp.concatenate([zero1, sq[k][:-1]], axis=0) for k in range(NL)]
        f4 = K._add(f4, shifted)
        f4 = K._external_linear(f4)
        f4 = K._add_rc(f4, rc, K.MONO_RC_COL0 + r)
        f4 = K._canon(f4)
        for k in range(NL):
            o_ref[k * T : (k + 1) * T, :] = f4[k]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NL * T, B), jnp.uint32),
        interpret=True,
    )(jnp.asarray(K.RC_TABLE), _pack(av))
    out = np.asarray(jax.device_get(out))
    for b in range(B):
        s = [int(v) for v in av[:, b]]
        s = [
            O._bar64(s[i]) % O.P_GL if i < G.MONOLITH_BARS else s[i]
            for i in range(T)
        ]
        s = O._bricks(s)
        s = O._external_linear(s)
        s = [(v + c) % O.P_GL for v, c in zip(s, G.MONOLITH_RC[r])]
        assert _unpack(out, b) == s


def test_rc_table_layout():
    """The packed constant table round-trips to the field constants."""
    for r in range(G.RF):
        for lane in range(T):
            v = sum(
                int(K.RC_TABLE[k * T + lane, r]) << (16 * k) for k in range(NL)
            )
            assert v == G.P2GL_EXTERNAL_RC[r][lane]
    for r in range(G.RP):
        v = sum(
            int(K.RC_TABLE[k * T, K.INT_RC_COL0 + r]) << (16 * k) for k in range(NL)
        )
        assert v == G.P2GL_INTERNAL_RC[r]
    for lane in range(T):
        v = sum(int(K.RC_TABLE[k * T + lane, K.DIAG_COL]) << (16 * k) for k in range(NL))
        assert v == (G.P2GL_INTERNAL_DIAG[lane] - 1) % G.P_GL
    v = sum(int(K.RC_TABLE[k * T, K.IV_COL]) << (16 * k) for k in range(NL))
    assert v == O.SPONGE_IV_GL
