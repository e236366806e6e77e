"""Fused Pallas TPU kernel for the batched Poseidon2 t=3 permutation.

One kernel runs all 64 rounds for a tile of the batch, fully unrolled, with
the whole (3 x 16-limb) state resident in vector registers / VMEM.  Semantics
are identical to ops/poseidon2_jnp.py (verified against the oracle's
permutation KAT, reference/haskell/src/Poseidon2/Example.hs:13-19).

Design (round 2 rewrite — ~12x the round-1 kernel):

* **Fully unrolled rounds.**  All 64 rounds and all 16 CIOS steps are
  emitted straight-line; round constants are static lane-slices of one
  (16, 128) table, so there are no dynamic slices and no fori_loop-carried
  states — Mosaic schedules the whole permutation as one dependence graph.

* **Lazy reduction with value-bound tracking.**  mont_mul (CIOS, radix
  2^16, 16 limb planes) omits the canonical conditional-subtract entirely:
  for inputs < k*P the output is < (k^2 * (P/2^256) + 1)*P, and
  P/2^256 = 0.18903, so the multiply is closed on values < 3.9P.  The
  container ceiling is 2^256/P = 5.2896P; additions run in carry-save
  "column" space (plain u32 adds).

* **Approximate multi-threshold reduction** instead of borrow-chain
  conditional subtracts.  On a freshly carry-resolved value (canonical
  limbs, value < 5.05P), compare the top limb against T_k = floor(kP/2^240)+1
  for k = 1..4 and add (2^256 - P) * (#thresholds passed) in column space:
  top16 >= T_k guarantees value >= kP, so the subtraction is safe, and if
  top16 < T_k the value is < kP + 2^240, i.e. bounds only loosen by
  2^240 ~ 1.3e-4 * P.  Result is always < 1.06P for inputs < 5.05P, at a
  cost of ~2.5 vector ops (no borrow chain, no select).  All threshold
  tests run on canonical (norm'd) inputs only — column forms may carry
  pending 2^256 wrap bits that would make a top-limb test unsound.

* **Exact canonicalisation only at kernel exit** (carry resolve +
  one exact borrow-chain subtract per lane), so the public API stays
  canonical-Montgomery in / canonical < P out, drop-in for the jnp path.

Bound ledger (entry lanes < 5.05P in columns): entry norm+red -> < 1.06P;
initial linear s = x+y+z < 3.18P, x+s < 4.24P -> finish -> < 1.06P.
Internal round: c = x+rc < 2.06P -> u2 < 1.81P -> u4 < 1.62P -> u5 < 1.64P
-> redP -> u5' < 1.01P; u = u5'+y+z < 3.13P; out_x = u+u5' < 4.14P;
out_y = u+y < 4.19P; out_z = u+2z < 5.25P < 5.2896P; finish -> < 1.06P.
External round: s_i < 1.01P each, out < 4.04P -> < 1.06P.  All mul inputs
<= 2.06P < 3.9P.  Closed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import bn254
from . import limbs as L
from .poseidon2_jnp import EXT_RC_MONT, INT_RC_MONT

NL = L.NL  # 16
LB = 16
MASK = 0xFFFF
U32 = jnp.uint32

# ---------------------------------------------------------------------------
# Static tables

# Round-constant table (16, 128): column k = Montgomery limbs of constant k.
#   cols 0-11   first 4 external rounds x 3 lanes (round-major)
#   cols 12-67  56 internal round constants
#   cols 68-79  last 4 external rounds x 3 lanes
_cols = []
for _k in range(4):
    for _lane in range(3):
        _cols.append(EXT_RC_MONT[_k, _lane, :, 0])
for _k in range(56):
    _cols.append(INT_RC_MONT[_k, :, 0])
for _k in range(4, 8):
    for _lane in range(3):
        _cols.append(EXT_RC_MONT[_k, _lane, :, 0])
RC_TABLE = np.zeros((NL, 128), np.uint32)
RC_TABLE[:, : len(_cols)] = np.stack(_cols, axis=1)


def _limbs_np(x: int) -> np.ndarray:
    return np.array([(x >> (LB * i)) & MASK for i in range(NL)], np.uint32)


_P_INT = bn254.P
# Constant planes handed to the kernel pre-broadcast to tile width:
# P and its complement 2^256 - P (one masked multiple-add subtracts k*P).
CONST_PLANES = np.stack([_limbs_np(_P_INT), _limbs_np((1 << 256) - _P_INT)])

# top16(value) >= T[k]  =>  value >= (k+1) * P
THRESHOLDS = tuple(((k * _P_INT) >> 240) + 1 for k in range(1, 5))
assert THRESHOLDS[-1] <= MASK

# ---------------------------------------------------------------------------
# Kernel body helpers (pure jnp, traced fully unrolled inside the kernel)


def _shift_down(x):
    """out[i] = x[i+1] (zero at top) along the sublane/limb axis."""
    return jnp.concatenate([x[1:], jnp.zeros((1,) + x.shape[1:], U32)], axis=0)


def _shift_up(x, d=1):
    return jnp.concatenate([jnp.zeros((d,) + x.shape[1:], U32), x[:-d]], axis=0)


def _cios(a, b, p):
    """Montgomery product a*b/2^256 in carry-save columns (<= 2^23).

    a, b canonical 16-bit limb planes (any value < 3.9P); p = P pre-broadcast.
    Uses P == 1 (mod 2^16): the per-limb quotient is a plain negation.
    """
    acc = jnp.zeros(a.shape, U32)
    zero_top = jnp.zeros((NL - 1,) + a.shape[1:], U32)
    for j in range(NL):
        t = a * b[j : j + 1]
        tl = t & MASK
        mj = (U32(0) - (acc[0:1] + tl[0:1])) & MASK
        q = p * mj
        s = acc + tl + (q & MASK)
        carry = s[0:1] >> LB
        acc = (
            _shift_down(s)
            + (t >> LB)
            + (q >> LB)
            + jnp.concatenate([carry, zero_top], axis=0)
        )
    return acc


def _norm(x):
    """Carry-save columns (<= 2^23) -> canonical 16-bit limbs mod 2^256.

    One masked pass (limbs then <= 0xFFFF + 0x7F) + Kogge-Stone resolve.
    """
    x = (x & MASK) + _shift_up(x >> LB)
    low = x & MASK
    gen = x >> LB
    prop = (low == MASK).astype(U32)
    d = 1
    while d < NL:
        gen = gen | (prop & _shift_up(gen, d))
        prop = prop & _shift_up(prop, d)
        d *= 2
    return (low + _shift_up(gen)) & MASK


def _red1(x, negp):
    """Canonical x < 2P -> column form < 1.01P (single threshold)."""
    top = x[NL - 1 : NL]
    return x + negp * (top >= U32(THRESHOLDS[0])).astype(U32)


def _red4(x, negp):
    """Canonical x < 5.05P -> column form < 1.06P (four thresholds).

    Adds (2^256 - P) * (#thresholds passed); the dropped 2^256 wrap bits
    live above bit 15 of the top column and are masked off by _norm.
    """
    top = x[NL - 1 : NL]
    msum = (top >= U32(THRESHOLDS[0])).astype(U32)
    for t in THRESHOLDS[1:]:
        msum = msum + (top >= U32(t)).astype(U32)
    return x + negp * msum


def _exact_canonical(x, p):
    """Column form, value < 2P -> exact canonical limbs < P.

    Full carry resolve then one exact borrow-chain conditional subtract.
    """
    x = _norm(x)
    t = x + U32(0x10000) - p
    gen = (t >> LB) ^ U32(1)
    prop = (t == 0x10000).astype(U32)
    d = 1
    while d < NL:
        gen = gen | (prop & _shift_up(gen, d))
        prop = prop & _shift_up(prop, d)
        d *= 2
    borrow_in = _shift_up(gen)
    diff = (t - borrow_in) & MASK
    no_borrow = (gen[NL - 1 : NL] == 0).astype(U32)  # 1 iff x >= P
    return jnp.where(no_borrow == 1, diff, x)


def _perm_body(rc, p, negp, x, y, z):
    """Full unrolled 64-round permutation.  x, y, z: (NL, BT) limb planes in
    Montgomery form, column-space values < 5.05P.  Returns exact canonical
    (< P) Montgomery-form planes."""

    def finish(cols):
        # column value < 5.05P -> column form < 1.06P
        return _red4(_norm(cols), negp)

    def sbox(c_cols):
        # c (columns, < 2.06P) -> x^5 in column form < 1.01P
        c = _norm(c_cols)
        u2 = _norm(_cios(c, c, p))
        u4 = _norm(_cios(u2, u2, p))
        u5 = _norm(_cios(u4, c, p))
        return _red1(u5, negp)

    # entry normalisation + reduction: anything < 5.05P -> < 1.06P
    x, y, z = finish(x), finish(y), finish(z)

    # initial linear layer
    s = x + y + z
    x, y, z = finish(x + s), finish(y + s), finish(z + s)

    def ext_round(x, y, z, base):
        sx = sbox(x + rc(base + 0))
        sy = sbox(y + rc(base + 1))
        sz = sbox(z + rc(base + 2))
        s = sx + sy + sz
        return finish(sx + s), finish(sy + s), finish(sz + s)

    def int_round(x, y, z, col):
        sx = sbox(x + rc(col))
        u = sx + y + z
        return finish(u + sx), finish(u + y), finish(u + z + z)

    for k in range(4):
        x, y, z = ext_round(x, y, z, 3 * k)
    for k in range(56):
        x, y, z = int_round(x, y, z, 12 + k)
    for k in range(4, 8):
        x, y, z = ext_round(x, y, z, 68 + 3 * (k - 4))

    return (
        _exact_canonical(x, p),
        _exact_canonical(y, p),
        _exact_canonical(z, p),
    )


def _perm_kernel(rc_ref, cp_ref, state_ref, out_ref):
    bt = state_ref.shape[1]

    def rc(col):
        # static lane slice of the constant table, broadcast across the tile
        return jnp.broadcast_to(rc_ref[:, col : col + 1], (NL, bt))

    p = cp_ref[0:NL, :]
    negp = cp_ref[NL : 2 * NL, :]
    x = state_ref[0:NL, :]
    y = state_ref[NL : 2 * NL, :]
    z = state_ref[2 * NL : 3 * NL, :]
    x, y, z = _perm_body(rc, p, negp, x, y, z)
    out_ref[0:NL, :] = x
    out_ref[NL : 2 * NL, :] = y
    out_ref[2 * NL : 3 * NL, :] = z


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def permutation(
    state: jnp.ndarray, batch_tile: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """Batched permutation via the fused kernel.

    state: (3, NL, B) uint32 canonical Montgomery-form limb planes (< P);
    B must be a multiple of batch_tile.  Output canonical Montgomery < P.
    """
    three, nl, b = state.shape
    assert three == 3 and nl == NL
    assert b % batch_tile == 0, (b, batch_tile)
    flat = state.reshape(3 * NL, b)
    grid = (b // batch_tile,)
    cp = np.repeat(CONST_PLANES.reshape(2 * NL, 1), batch_tile, axis=1)
    out = pl.pallas_call(
        _perm_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * NL, b), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NL, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NL, batch_tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NL, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3 * NL, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.asarray(RC_TABLE), jnp.asarray(cp), flat)
    return out.reshape(3, NL, b)


def compress(x: jnp.ndarray, y: jnp.ndarray, key_mont: jnp.ndarray, **kw) -> jnp.ndarray:
    """Batched keyed compression via the fused kernel: x, y (NL, B)."""
    b = x.shape[1]
    key = jnp.broadcast_to(key_mont, (NL, b)).astype(jnp.uint32)
    state = jnp.stack([x, y, key])
    return permutation(state, **kw)[0]
