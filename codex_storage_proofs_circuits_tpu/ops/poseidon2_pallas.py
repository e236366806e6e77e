"""Fused Pallas TPU kernel for the batched Poseidon2 t=3 permutation.

One kernel runs all 64 rounds for a tile of the batch, keeping the whole
(3 x 16-limb) state resident in VMEM — no HBM round-trips between rounds,
unlike the jnp path where XLA may materialize inter-round states.

Semantics are identical to ops/poseidon2_jnp.py (itself verified against the
oracle's permutation KAT, reference/haskell/src/Poseidon2/Example.hs:13-19).
The limb algebra is shared with ops/limbs.py — those helpers are pure jnp and
lower through Mosaic unchanged.

Layout inside the kernel: the state tile is (48, BT) uint32 — rows 0-15 are
lane x's limb planes, 16-31 lane y, 32-47 lane z; BT is the batch tile on
VPU lanes.  Round constants arrive as one (16, 68) transposed table so a
per-round (16, 1) column slice broadcasts directly against (16, BT) planes.
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

NL = L.NL

# Round-constant table, transposed to (16, 68):
#   columns 0-11  : first 4 external rounds x 3 lanes (round-major)
#   columns 12-67 : 56 internal round constants
#   columns 56+12..: last 4 external rounds x 3 lanes -> columns 68-79
_RC_COLS = []
for k in range(4):
    for lane in range(3):
        _RC_COLS.append(EXT_RC_MONT[k, lane, :, 0])
for k in range(56):
    _RC_COLS.append(INT_RC_MONT[k, :, 0])
for k in range(4, 8):
    for lane in range(3):
        _RC_COLS.append(EXT_RC_MONT[k, lane, :, 0])
# Flat sublane-major layout (80*16, 1): entry k*16+l = limb l of constant k.
# A round's (16, 1) limb column is a dynamic *sublane* slice at offset 16k
# (always 8-aligned, which Mosaic requires); the lane dimension stays static.
RC_TABLE = np.concatenate(_RC_COLS).astype(np.uint32).reshape(-1, 1)  # (1280, 1)
N_CONSTS = len(_RC_COLS)

# The field constants P and -P^-1 mod 2^256 enter as a separate input,
# pre-materialized at full tile width: Mosaic folds (NL, 1)-constant
# broadcasts into lane-replicated layouts it then cannot re-expand inside
# the product loops ("Broadcast in both sublanes and lanes").
PCONSTS = np.concatenate([L.P_LIMBS, L.PINV_LIMBS]).astype(np.uint32)  # (32, 1)


def _perm_body(rc_ref, pc_ref, x, y, z):
    """Full 64-round permutation on (NL, BT) limb planes x, y, z."""

    def rc(col):
        # col may be a traced fori_loop index: dynamic 16-sublane slice
        return rc_ref[pl.ds(pl.multiple_of(col * NL, NL), NL), :]

    p = pc_ref[0:NL, :]
    pinv = pc_ref[NL : 2 * NL, :]
    bt = x.shape[1]
    # 3x-wide constants for the lane-batched external S-boxes
    p3 = jnp.concatenate([p, p, p], axis=1)
    pinv3 = jnp.concatenate([pinv, pinv, pinv], axis=1)

    def add(u, v):
        return L.add_mod(u, v, p)

    def sbox3(u):
        # one x^5 chain over all three lanes concatenated on the batch axis:
        # keeps the compiled loop body at 3 mont_muls instead of 9
        u2 = L.mont_mul(u, u, p3, pinv3, unroll=True)
        u4 = L.mont_mul(u2, u2, p3, pinv3, unroll=True)
        return L.mont_mul(u4, u, p3, pinv3, unroll=True)

    def sbox(u):
        u2 = L.mont_mul(u, u, p, pinv, unroll=True)
        u4 = L.mont_mul(u2, u2, p, pinv, unroll=True)
        return L.mont_mul(u4, u, p, pinv, unroll=True)

    # initial linear layer
    s = add(add(x, y), z)
    x, y, z = add(x, s), add(y, s), add(z, s)

    def ext_round(x, y, z, base):
        cat = jnp.concatenate(
            [add(x, rc(base + 0)), add(y, rc(base + 1)), add(z, rc(base + 2))],
            axis=1,
        )
        s5 = sbox3(cat)
        sx = s5[:, 0:bt]
        sy = s5[:, bt : 2 * bt]
        sz = s5[:, 2 * bt : 3 * bt]
        s = add(add(sx, sy), sz)
        return add(sx, s), add(sy, s), add(sz, s)

    def int_round(x, y, z, col):
        sx = sbox(add(x, rc(col)))
        u = add(add(sx, y), z)
        return (
            add(u, sx),
            add(u, y),
            add(add(u, z), z),
        )

    # rounds via fori_loop so the traced/compiled body stays one round wide
    x, y, z = jax.lax.fori_loop(
        0, 4, lambda k, c: ext_round(*c, 3 * k), (x, y, z)
    )
    x, y, z = jax.lax.fori_loop(
        0, 56, lambda k, c: int_round(*c, 12 + k), (x, y, z)
    )
    x, y, z = jax.lax.fori_loop(
        0, 4, lambda k, c: ext_round(*c, 68 + 3 * k), (x, y, z)
    )
    return x, y, z


def _perm_kernel(rc_ref, pc_ref, state_ref, out_ref):
    x = state_ref[0:NL, :]
    y = state_ref[NL : 2 * NL, :]
    z = state_ref[2 * NL : 3 * NL, :]
    x, y, z = _perm_body(rc_ref, pc_ref, x, y, z)
    out_ref[0:NL, :] = x
    out_ref[NL : 2 * NL, :] = y
    out_ref[2 * NL : 3 * NL, :] = z


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def permutation(state: jnp.ndarray, batch_tile: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Batched permutation via the fused kernel.

    state: (3, NL, B) uint32 Montgomery-form limb planes; B must be a
    multiple of batch_tile (pad with anything — garbage columns are fine).
    """
    three, nl, b = state.shape
    assert three == 3 and nl == NL
    assert b % batch_tile == 0, (b, batch_tile)
    flat = state.reshape(3 * NL, b)
    grid = (b // batch_tile,)
    out = pl.pallas_call(
        _perm_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * NL, b), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(RC_TABLE.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NL, batch_tile), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NL, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3 * NL, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        jnp.asarray(RC_TABLE),
        jnp.asarray(np.tile(PCONSTS, (1, batch_tile))),
        flat,
    )
    return out.reshape(3, NL, b)


def compress(x: jnp.ndarray, y: jnp.ndarray, key_mont: jnp.ndarray, **kw) -> jnp.ndarray:
    """Batched keyed compression via the fused kernel: x, y (NL, B)."""
    b = x.shape[1]
    key = jnp.broadcast_to(key_mont, (NL, b)).astype(jnp.uint32)
    state = jnp.stack([x, y, key])
    return permutation(state, **kw)[0]
