"""Fused Pallas TPU kernel for the batched Poseidon2-Goldilocks t=12
permutation, keyed digest compression and rate-8 sponge.

Goldilocks (p = 2^64 - 2^32 + 1) is the reference system's *default* field
(reference/nim/proof_input/src/cli.nim:47-51), and it is dramatically more
TPU-friendly than BN254: felts are 4 uint32 planes of 16-bit limbs, a full
64x64->128 product is 16 exact u32 multiplies, and the reduction is two
cheap folds via 2^64 ≡ 2^32 - 1, 2^96 ≡ -1 — no Montgomery form, no
254-bit carry chains.  Semantics are bit-exact to ops/goldilocks_jnp.py /
oracle/goldilocks.py (tests/test_gl_pallas.py).

Design:

* **Limb-major lane planes.**  A 12-lane state batch is a (48, BT) uint32
  VMEM block, row = limb*12 + lane: each 16-bit limb plane of the whole
  state is a contiguous (12, BT) slice, so the schoolbook product of two
  felt batches is 16 *elementwise* plane multiplies — no broadcasts, no
  sublane shuffles anywhere in the hot loop.

* **Lazy (loose) representation.**  Values are kept canonical-limbed
  (< 2^16 per limb) but only bounded by 2^64, not p, between ops; a single
  conditional subtract at kernel exit canonicalises.  Products of loose
  values are exact in uint32 (16x16->32), and the 128-bit product folds to
  a loose value with two ripple+fold passes.

* **Fully unrolled rounds.**  All 30 rounds (RF=8 external with 12 x^7
  S-boxes, RP=22 internal with one) are emitted straight-line; round
  constants are lane-slices of one (48, 128) table.  The external linear
  layer circ(2*M4, M4, M4) uses the 8-add M4 fast chain on single-row
  slices; the internal layer J + diag(mu-1) is a sublane reduction plus one
  constant-plane multiply.

Per-permutation cost is ~1/8 of the BN254 t=3 kernel per *compression*
(GL compresses two 4-felt digests per permutation, BN254 two felts), which
is what makes Goldilocks the fast path for slot-tree builds.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import goldilocks as G
from . import gl_core as C

T = G.T  # 12 lanes
NL = 4  # 16-bit limbs per felt
LB = 16
MASK = 0xFFFF
U32 = jnp.uint32
P = G.P_GL
RATE = G.RATE

# ---------------------------------------------------------------------------
# Constant table: (48, 128) uint32, one column per constant, rows limb-major
# (row = limb*12 + lane).  Columns:
#   0..7    external round constants (12 lanes each)
#   8       diag(mu - 1) for the internal linear layer (12 lanes)
#   16..37  internal round constants (lane 0; rows limb*12 only)
#   40      sponge capacity IV (lane 0 rows)
#   44..47  Merkle keys 0..3 (lane 0 rows)
DIAG_COL = 8
INT_RC_COL0 = 16
IV_COL = 40
KEY0_COL = 44


def _lane_limbs(vals) -> np.ndarray:
    """12 ints -> (48,) rows limb-major."""
    out = np.zeros(48, np.uint32)
    for lane, v in enumerate(vals):
        for k in range(NL):
            out[k * T + lane] = (v >> (LB * k)) & MASK
    return out


RC_TABLE = np.zeros((48, 128), np.uint32)
for _r in range(G.RF):
    RC_TABLE[:, _r] = _lane_limbs(G.P2GL_EXTERNAL_RC[_r])
RC_TABLE[:, DIAG_COL] = _lane_limbs([(d - 1) % P for d in G.P2GL_INTERNAL_DIAG])
for _r in range(G.RP):
    RC_TABLE[:, INT_RC_COL0 + _r] = _lane_limbs(
        [G.P2GL_INTERNAL_RC[_r]] + [0] * (T - 1)
    )
from ..oracle.goldilocks import SPONGE_IV_GL  # noqa: E402

RC_TABLE[:, IV_COL] = _lane_limbs([SPONGE_IV_GL] + [0] * (T - 1))
for _k in range(4):
    RC_TABLE[:, KEY0_COL + _k] = _lane_limbs([_k] + [0] * (T - 1))
MONO_RC_COL0 = 48  # 6 monolith round-constant columns
for _r in range(G.MONOLITH_ROUNDS):
    RC_TABLE[:, MONO_RC_COL0 + _r] = _lane_limbs(G.MONOLITH_RC[_r])

P_LIMB = C.P_LIMB


# Field/round primitives shared with the jnp path (see ops/gl_core.py).
_ripple = C.ripple
_fold_carry = C.fold_carry
_add = C.add
_mul = C.mul
_canon = C.canon
_sbox7_all = C.sbox7_all
_external_linear = C.external_linear


def _mul_const_col(a4, rc, col):
    """a * table-column constant (lane-resident limbs)."""
    return C.mul(a4, [rc(col, k) for k in range(NL)])


def _internal_linear(f4, rc):
    return C.internal_linear(f4, [rc(DIAG_COL, k) for k in range(NL)])


def _add_rc(f4, rc, col):
    return C.add(f4, [rc(col, k) for k in range(NL)])


def _add_rc_lane0(f4, rc, col):
    return C.add_rc_lane0(f4, [rc(col, k)[0:1] for k in range(NL)])


_sbox7_lane0 = C.sbox7_lane0


def _perm_core_gl(rc, f4):
    """Full unrolled 30-round Poseidon2-GL permutation, loose in/out."""
    f4 = _external_linear(f4)
    for r in range(G.RF // 2):
        f4 = _add_rc(f4, rc, r)
        f4 = _sbox7_all(f4)
        f4 = _external_linear(f4)
    for r in range(G.RP):
        f4 = _add_rc_lane0(f4, rc, INT_RC_COL0 + r)
        f4 = _sbox7_lane0(f4)
        f4 = _internal_linear(f4, rc)
    for r in range(G.RF // 2, G.RF):
        f4 = _add_rc(f4, rc, r)
        f4 = _sbox7_all(f4)
        f4 = _external_linear(f4)
    return f4


def _bar_limb16(x):
    """8-bit Monolith bar on both bytes of a 16-bit limb plane:
    bar(b) = rotl1(b ^ (rotl1(~b) & rotl2(b) & rotl3(b)))."""
    lo = x & jnp.uint32(0xFF)
    hi = (x >> 8) & jnp.uint32(0xFF)

    def bar(b):
        rot = lambda v, k: ((v << k) | (v >> (8 - k))) & jnp.uint32(0xFF)
        y = b ^ (rot(~b & jnp.uint32(0xFF), 1) & rot(b, 2) & rot(b, 3))
        return rot(y, 1)

    return bar(lo) | (bar(hi) << 8)


def _mono_core_gl(rc, f4):
    """Full unrolled 6-round Monolith-64 permutation, loose in/out
    (structure: oracle/goldilocks.py monolith_permutation)."""
    nb = G.MONOLITH_BARS
    f4 = C.concrete(f4)  # initial Concrete (Plonky2-compatible circulant)
    for r in range(G.MONOLITH_ROUNDS):
        # Bars on the first nb lanes (bytewise map needs canonical input;
        # raw output < 2^64 is reduced like the oracle's % P_GL)
        rows = _canon([f4[k][:nb] for k in range(NL)])
        rows = _canon([_bar_limb16(v) for v in rows])
        f4 = [jnp.concatenate([rows[k], f4[k][nb:]], axis=0) for k in range(NL)]
        # Bricks: out_0 = x_0, out_i = x_i + x_{i-1}^2
        sq = _mul(f4, f4)
        zero1 = jnp.zeros_like(f4[0][0:1])
        shifted = [jnp.concatenate([zero1, sq[k][:-1]], axis=0) for k in range(NL)]
        f4 = _add(f4, shifted)
        # Concrete + round constants
        f4 = C.concrete(f4)
        f4 = _add_rc(f4, rc, MONO_RC_COL0 + r)
    return f4


PERM_CORES = {"poseidon2": _perm_core_gl, "monolith": _mono_core_gl}


def _split_state(ref_block):
    return [ref_block[k * T : (k + 1) * T, :] for k in range(NL)]


def _perm_kernel_gl(rc_ref, state_ref, out_ref, *, hash_fun: str = "poseidon2"):
    bt = state_ref.shape[1]

    def rc(col, k):
        return jnp.broadcast_to(rc_ref[k * T : (k + 1) * T, col : col + 1], (T, bt))

    f4 = _split_state(state_ref)
    f4 = PERM_CORES[hash_fun](rc, f4)
    f4 = _canon(f4)
    for k in range(NL):
        out_ref[k * T : (k + 1) * T, :] = f4[k]


def _sponge8_kernel_gl(rc_ref, blocks_ref, out_ref, *, hash_fun: str = "poseidon2"):
    """Fused rate-8 sponge: absorb all blocks in-kernel, state loose between
    permutations.  blocks_ref rows: block-major, within a block limb-major
    over the 8 rate lanes (row = blk*32 + limb*8 + lane)."""
    bt = blocks_ref.shape[1]
    nb = blocks_ref.shape[0] // (4 * RATE)

    def rc(col, k):
        return jnp.broadcast_to(rc_ref[k * T : (k + 1) * T, col : col + 1], (T, bt))

    zero = jnp.zeros((T, bt), U32)
    iv = [rc(IV_COL, k) for k in range(NL)]
    # state lanes 0..10 zero, lane 11 = IV (capacity convention of
    # oracle/goldilocks.py digest_felts: s = [0]*(T-1) + [IV])
    f4 = [
        jnp.concatenate([zero[: T - 1], iv[k][0:1]], axis=0) for k in range(NL)
    ]

    def body(b, f4):
        f4 = list(f4)
        base = b * 4 * RATE
        for k in range(NL):
            blk = blocks_ref[pl.ds(base + k * RATE, RATE), :]
            padded = jnp.concatenate([blk, jnp.zeros((T - RATE, bt), U32)], axis=0)
            f4[k] = f4[k] + padded
        limbs, c = _ripple(f4, NL)
        f4 = _fold_carry(limbs, c)
        return tuple(PERM_CORES[hash_fun](rc, f4))

    f4 = jax.lax.fori_loop(0, nb, body, tuple(f4))
    f4 = _canon(list(f4))
    for k in range(NL):
        out_ref[k * T : (k + 1) * T, :] = f4[k]


# ---------------------------------------------------------------------------
# Public API (mirrors ops/goldilocks_jnp.py shapes)

DEFAULT_TILE = 512


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret", "hash_fun"))
def permutation(
    state: jnp.ndarray,
    batch_tile: int = DEFAULT_TILE,
    interpret: bool = False,
    hash_fun: str = "poseidon2",
) -> jnp.ndarray:
    """(12, 4, B) canonical -> (12, 4, B) canonical, fused kernel.

    B must be a multiple of batch_tile.  Bit-exact twin of
    ops.goldilocks_jnp.poseidon2_gl_permutation.
    """
    t, nl, b = state.shape
    assert t == T and nl == NL
    assert b % batch_tile == 0, (b, batch_tile)
    flat = state.transpose(1, 0, 2).reshape(NL * T, b)  # limb-major rows
    out = pl.pallas_call(
        functools.partial(_perm_kernel_gl, hash_fun=hash_fun),
        out_shape=jax.ShapeDtypeStruct((NL * T, b), jnp.uint32),
        grid=(b // batch_tile,),
        in_specs=[
            pl.BlockSpec((NL * T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL * T, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (NL * T, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.asarray(RC_TABLE), flat)
    return out.reshape(NL, T, b).transpose(1, 0, 2)


def compress(x: jnp.ndarray, y: jnp.ndarray, key: int, **kw) -> jnp.ndarray:
    """Keyed 2-digest compression via the fused kernel.

    x, y: (4, 4, B) digest batches (lanes, limbs, B).  Returns (4, 4, B).
    Twin of ops.goldilocks_jnp.compress_batch(hash_fun="poseidon2").
    """
    b = x.shape[-1]
    keyv = np.zeros((1, NL, 1), np.uint32)
    for k in range(NL):
        keyv[0, k, 0] = (key >> (LB * k)) & MASK
    key_plane = jnp.broadcast_to(jnp.asarray(keyv), (1, NL, b)).astype(U32)
    zero = jnp.zeros((3, NL, b), U32)
    state = jnp.concatenate([x, y, key_plane, zero], axis=0)
    return permutation(state, **kw)[:4]


def sponge_digest_felts(
    felts: jnp.ndarray,
    batch_tile: int = DEFAULT_TILE,
    interpret: bool = False,
    hash_fun: str = "poseidon2",
) -> jnp.ndarray:
    """Fused rate-8 sponge over (n, 4, B) felt batches -> (4, 4, B) digests.

    Applies the 10* felt padding (append 1, zero-fill to a rate multiple)
    like oracle digest_felts / jnp sponge_digest_felts.
    """
    n, nl, b = felts.shape
    assert nl == NL
    assert b % batch_tile == 0, (b, batch_tile)
    total = n + 1
    total += (-total) % RATE
    one = np.zeros((1, NL, 1), np.uint32)
    one[0, 0, 0] = 1
    pads = [jnp.broadcast_to(jnp.asarray(one), (1, NL, b)).astype(U32)]
    if total > n + 1:
        pads.append(jnp.zeros((total - n - 1, NL, b), U32))
    full = jnp.concatenate([felts] + pads, axis=0)  # (total, NL, B)
    nb = total // RATE
    # rows: block-major, limb-major within block over the 8 rate lanes
    flat = (
        full.reshape(nb, RATE, NL, b)
        .transpose(0, 2, 1, 3)
        .reshape(nb * NL * RATE, b)
    )
    out = pl.pallas_call(
        functools.partial(_sponge8_kernel_gl, hash_fun=hash_fun),
        out_shape=jax.ShapeDtypeStruct((NL * T, b), jnp.uint32),
        grid=(b // batch_tile,),
        in_specs=[
            pl.BlockSpec((NL * T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nb * NL * RATE, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (NL * T, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.asarray(RC_TABLE), flat)
    return out.reshape(NL, T, b).transpose(1, 0, 2)[:4]
