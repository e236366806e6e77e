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

Bound ledger (entry lanes < 5.2P in columns): entry norm+red5 -> < 1.001P;
initial linear s = x+y+z < 3.01P, x+s < 4.01P -> finish -> < 1.001P.
Internal round: c = x+rc < 2.01P -> u2 < 1.77P -> u4 < 1.60P -> u5 < 1.61P
-> red1 on raw columns -> u5' < 1.012P; u = u5'+y+z < 3.02P;
out_x = u+u5' < 4.04P; out_y = u+y < 4.03P; out_z = u+2z < 5.03P < 5.2896P;
finish (norm + 5-threshold red) -> < 1.001P.  External round: s_i < 1.012P
each, out < 4.06P -> < 1.001P.  All mul inputs <= 2.01P < 3.9P.  Closed.
"""

from __future__ import annotations

import functools
import os

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
# extra columns: 80 = rate-2 sponge IV, 81..84 = Merkle keys 0..3 (Montgomery)
IV2_COL = 80
KEY0_COL = 81
from .poseidon2_jnp import KEY_MONT, SPONGE2_IV_MONT  # noqa: E402

RC_TABLE[:, IV2_COL] = SPONGE2_IV_MONT[:, 0]
for _k in range(4):
    RC_TABLE[:, KEY0_COL + _k] = KEY_MONT[_k][:, 0]


def _limbs_np(x: int) -> np.ndarray:
    return np.array([(x >> (LB * i)) & MASK for i in range(NL)], np.uint32)


_P_INT = bn254.P
# Constant planes handed to the kernel pre-broadcast to tile width:
# P and its complement 2^256 - P (one masked multiple-add subtracts k*P).
CONST_PLANES = np.stack([_limbs_np(_P_INT), _limbs_np((1 << 256) - _P_INT)])

# top16(value) >= T[k]  =>  value >= (k+1) * P;  five thresholds cover
# values up to the 5.289P container ceiling with residual < 1.001P
THRESHOLDS = tuple(((k * _P_INT) >> 240) + 1 for k in range(1, 6))
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


def _norm_ks(x):
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


def _norm_packed(x):
    """Bit-packed carry resolve (KERNEL_ANALYSIS "remaining levers" #1).

    After the masked pass, per-limb generate (0/1) and propagate bits pack
    into one 16-bit word per element (bit i = limb i) via a sublane OR
    tree; the full carry resolution is then the classic packed-adder
    identity c = (g + (g|p)) ^ g ^ (g|p) — bit i of c is the carry INTO
    limb i — and unpacks with one varying-amount shift.  Replaces the
    4-stage full-width Kogge-Stone dependence chain with one (1, B) add.
    """
    x = (x & MASK) + _shift_up(x >> LB)
    low = x & MASK
    iota = jax.lax.broadcasted_iota(U32, (NL, 1), 0)
    gsh = (x >> LB) << iota
    psh = (low == MASK).astype(U32) << iota

    def _or_tree(v):
        # contiguous halves (Mosaic lowers these; sublane strides it can't)
        v = v[:8] | v[8:]
        v = v[:4] | v[4:]
        v = v[:2] | v[2:]
        return v[0:1] | v[1:2]  # (1, B)

    g = _or_tree(gsh)
    gp = g | _or_tree(psh)
    c = (g + gp) ^ g ^ gp  # bit i = carry into limb i (bit 0 always 0)
    cin = (jnp.broadcast_to(c, low.shape) >> iota) & U32(1)
    return (low + cin) & MASK


_norm = _norm_packed if os.environ.get("CSPC_NORM", "packed") == "packed" else _norm_ks


def _red1(x, negp):
    """x < 2P -> column form < 1.011P (single threshold).

    Sound on canonical inputs AND on positive unresolved CIOS columns
    (no complement adds pending): there the top column under-reports the
    true top16 by at most the pending lower-limb carry (< 0x81), so a fired
    subtract is safe (top >= T1 implies value >= T1*2^240 > P) and a missed
    one only loosens the residual bound by < 0x81 * 2^240 ~ 0.001P."""
    top = x[NL - 1 : NL]
    return x + negp * (top >= U32(THRESHOLDS[0])).astype(U32)


def _red4(x, negp):
    """Canonical x < 5.28P -> column form < 1.001P (five thresholds).

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


def _perm_core(rc, p, negp, x, y, z, rounds=(4, 56, 4)):
    """Full unrolled 64-round permutation on loose values.  x, y, z:
    (NL, BT) Montgomery limb planes, column-space values < 5.2P.  Returns
    column forms < 1.001P (call _exact_canonical for strict < P output).
    Chained invocations (sponges, tree levels) stay loose throughout.

    `rounds=(ext_first, internal, ext_last)` is a test hook: the production
    schedule (4, 56, 4) is always used by the public API; reduced schedules
    keep the same round-constant columns for the rounds they run, letting
    the interpret-mode CPU tests compile the *same kernel machinery* in
    seconds instead of the ~20-minute fully-unrolled graph
    (tests/test_pallas_kernel.py)."""

    def finish(cols):
        # column value < 5.28P -> column form < 1.001P
        return _red4(_norm(cols), negp)

    def sbox(c_cols):
        # c (columns, < 2.07P) -> x^5 in column form < 1.012P.  The final
        # reduction runs directly on u5's carry-save columns (positive, no
        # complement adds — see _red1); consumers are adds, and the next
        # mul's input normalize handles the carries.
        c = _norm(c_cols)
        u2 = _norm(_cios(c, c, p))
        u4 = _norm(_cios(u2, u2, p))
        return _red1(_cios(u4, c, p), negp)

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

    re1, ri, re2 = rounds
    for k in range(re1):
        x, y, z = ext_round(x, y, z, 3 * k)
    for k in range(ri):
        x, y, z = int_round(x, y, z, 12 + k)
    for k in range(re2):
        x, y, z = ext_round(x, y, z, 68 + 3 * k)

    return x, y, z


def _perm_kernel(
    rc_ref, cp_ref, state_ref, out_ref, *, n_chains: int = 1, rounds=(4, 56, 4)
):
    bt = state_ref.shape[1]
    cw = bt // n_chains  # columns per chain

    # n_chains > 1 splits the tile into independent dependence chains so the
    # Mosaic scheduler can interleave them and fill the serial-latency
    # bubbles of the Montgomery quotient row chain (measured ~42% of cycles
    # are bubbles at n_chains=1, docs/KERNEL_ANALYSIS.md).
    for c in range(n_chains):
        lo = c * cw

        def rc(col):
            return jnp.broadcast_to(rc_ref[:, col : col + 1], (NL, cw))

        p = cp_ref[0:NL, lo : lo + cw]
        negp = cp_ref[NL : 2 * NL, lo : lo + cw]
        x = state_ref[0:NL, lo : lo + cw]
        y = state_ref[NL : 2 * NL, lo : lo + cw]
        z = state_ref[2 * NL : 3 * NL, lo : lo + cw]
        x, y, z = _perm_core(rc, p, negp, x, y, z, rounds=rounds)
        out_ref[0:NL, lo : lo + cw] = _exact_canonical(x, p)
        out_ref[NL : 2 * NL, lo : lo + cw] = _exact_canonical(y, p)
        out_ref[2 * NL : 3 * NL, lo : lo + cw] = _exact_canonical(z, p)


def _sponge2_kernel(
    rc_ref, cp_ref, blocks_ref, out_ref, *, rounds=(4, 56, 4), n_chains: int = 1
):
    """Fused rate-2 sponge: all absorb rounds chained in-kernel, state loose
    between permutations (column forms < 1.001P; absorb adds keep entry
    values < 2.01P, inside the 5.2P entry contract of _perm_core).

    n_chains > 1 splits the tile's lanes into independent dependence chains
    *inside one fori body* (separate fori loops would serialize at the loop
    boundary), so Mosaic can interleave the chains' serial Montgomery
    quotient rows like the permutation kernel does (docs/KERNEL_ANALYSIS.md
    round-4 ablation)."""
    bt = blocks_ref.shape[1]
    nb = blocks_ref.shape[0] // (2 * NL)
    cw = bt // n_chains

    def rc(col):
        return jnp.broadcast_to(rc_ref[:, col : col + 1], (NL, cw))

    zero = jnp.zeros((NL, cw), U32)
    iv = rc(IV2_COL)

    def chain_views(c):
        lo = c * cw
        return cp_ref[0:NL, lo : lo + cw], cp_ref[NL : 2 * NL, lo : lo + cw]

    def body(b, states):
        blk = blocks_ref[pl.ds(pl.multiple_of(b * 2 * NL, 2 * NL), 2 * NL), :]
        out = []
        for c in range(n_chains):
            p, negp = chain_views(c)
            x, y, z = states[3 * c : 3 * c + 3]
            x = x + blk[0:NL, c * cw : (c + 1) * cw]
            y = y + blk[NL : 2 * NL, c * cw : (c + 1) * cw]
            out.extend(_perm_core(rc, p, negp, x, y, z, rounds=rounds))
        return tuple(out)

    states = jax.lax.fori_loop(0, nb, body, (zero, zero, iv) * n_chains)
    for c in range(n_chains):
        p, _ = chain_views(c)
        out_ref[:, c * cw : (c + 1) * cw] = _exact_canonical(states[3 * c], p)


# sponge tiles above this VMEM budget fall back to per-permutation calls
# (v5e has 128 MB VMEM/core; the block input for a 2048-byte cell at
# batch_tile 512 is ~8.9 MB, well within budget)
_SPONGE_VMEM_BUDGET = 48 * 1024 * 1024


def sponge2_fits(nblocks: int, batch_tile: int = 512) -> bool:
    return 2 * nblocks * 2 * NL * batch_tile * 4 <= _SPONGE_VMEM_BUDGET


def _sponge2_absorb_impl(
    blocks: jnp.ndarray,
    batch_tile: int = 512,
    interpret: bool = False,
    rounds: tuple = (4, 56, 4),
    n_chains: int = 1,
) -> jnp.ndarray:
    """Fused-kernel rate-2 sponge over pre-padded Montgomery blocks.

    blocks: (nblocks, 2, NL, B); returns the squeezed first lane (NL, B),
    exact canonical Montgomery.  Semantics identical to
    ops.poseidon2_jnp.sponge2_absorb (poseidon2_sponge.circom:28-99).

    Unjitted implementation: tests call this directly so interpret mode
    executes eagerly (per-op dispatch) instead of paying a monolithic
    XLA:CPU compile of the interpreter graph.
    """
    nb, two, nl, b = blocks.shape
    assert two == 2 and nl == NL
    assert b % batch_tile == 0, (b, batch_tile)
    assert batch_tile % n_chains == 0
    flat = blocks.reshape(nb * 2 * NL, b)
    cp = np.repeat(CONST_PLANES.reshape(2 * NL, 1), batch_tile, axis=1)
    return pl.pallas_call(
        functools.partial(_sponge2_kernel, rounds=rounds, n_chains=n_chains),
        out_shape=jax.ShapeDtypeStruct((NL, b), jnp.uint32),
        grid=(b // batch_tile,),
        in_specs=[
            pl.BlockSpec((NL, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NL, batch_tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nb * 2 * NL, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((NL, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(RC_TABLE), jnp.asarray(cp), flat)


sponge2_absorb = functools.partial(
    jax.jit, static_argnames=("batch_tile", "interpret", "rounds", "n_chains")
)(_sponge2_absorb_impl)


def _permutation_impl(
    state: jnp.ndarray,
    batch_tile: int = 512,
    interpret: bool = False,
    n_chains: int = 1,
    rounds: tuple = (4, 56, 4),
) -> jnp.ndarray:
    """Batched permutation via the fused kernel (unjitted implementation —
    see _sponge2_absorb_impl for why tests call this directly).

    state: (3, NL, B) uint32 canonical Montgomery-form limb planes (< P);
    B must be a multiple of batch_tile.  Output canonical Montgomery < P.
    n_chains splits each tile into independent scheduling chains.
    """
    three, nl, b = state.shape
    assert three == 3 and nl == NL
    assert b % batch_tile == 0, (b, batch_tile)
    assert batch_tile % n_chains == 0
    flat = state.reshape(3 * NL, b)
    grid = (b // batch_tile,)
    cp = np.repeat(CONST_PLANES.reshape(2 * NL, 1), batch_tile, axis=1)
    out = pl.pallas_call(
        functools.partial(_perm_kernel, n_chains=n_chains, rounds=rounds),
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


permutation = functools.partial(
    jax.jit, static_argnames=("batch_tile", "interpret", "n_chains", "rounds")
)(_permutation_impl)


def compress(x: jnp.ndarray, y: jnp.ndarray, key_mont: jnp.ndarray, **kw) -> jnp.ndarray:
    """Batched keyed compression via the fused kernel: x, y (NL, B)."""
    b = x.shape[1]
    key = jnp.broadcast_to(key_mont, (NL, b)).astype(jnp.uint32)
    state = jnp.stack([x, y, key])
    return permutation(state, **kw)[0]
