"""Device-side Goldilocks cell encoding: raw bytes -> 62-bit felt limbs.

Twin of models/gl_hashing.encode_cells_gl (host numpy), but running on
device so the fake-data streaming pipeline can fuse PRNG -> pad -> encode ->
sponge -> tree in one dispatch (models/streaming.py).  Semantics
(json/goldilocks.nim:19-25 via the oracle): `10*` byte padding to a
multiple of 62 bytes, each 62-byte chunk split little-endian into 8 felts
of 62 bits.

Each 16-bit limb of a felt spans at most 3 consecutive bytes of the padded
cell; the whole encode is 3 static gathers + shifts over the (bytes, B)
plane, with per-(felt, limb) byte offsets and bit shifts precomputed as
numpy constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..oracle.goldilocks import CHUNK_BYTES_GL

NL = 4
FELT_BITS = 62
LIMB_BITS = 16


@functools.lru_cache(maxsize=None)
def _encode_tables(cell_size: int):
    """Per-(felt, limb): 3 byte indices + shift + mask, as numpy arrays."""
    padded = cell_size + 1
    padded += (-padded) % CHUNK_BYTES_GL
    n_chunks = padded // CHUNK_BYTES_GL
    nf = n_chunks * 8
    idx = np.zeros((3, nf, NL), np.int32)
    shift = np.zeros((nf, NL), np.int32)
    mask = np.zeros((nf, NL), np.uint32)
    for f in range(nf):
        chunk, sub = divmod(f, 8)
        for l in range(NL):
            bit0 = FELT_BITS * sub + LIMB_BITS * l
            nbits = min(LIMB_BITS, FELT_BITS - LIMB_BITS * l)  # 16,16,16,14
            byte0 = chunk * CHUNK_BYTES_GL + bit0 // 8
            s = bit0 % 8
            for k in range(3):
                # clamp reads past the chunk end to a zero-contribution
                # byte (the shift below pushes it out anyway when unused)
                idx[k, f, l] = min(byte0 + k, padded - 1)
            shift[f, l] = s
            mask[f, l] = (1 << nbits) - 1
    return padded, nf, idx, shift, mask


def encode_cells_gl_device(rows_u8: jnp.ndarray, cell_size: int) -> jnp.ndarray:
    """(cell_size, B) uint8-valued rows -> (nfelts, 4, B) uint32 limb planes.

    rows_u8 may be any integer dtype holding byte values.  Applies the 10*
    byte padding on device.

    The 62-byte chunk structure repeats, so every (felt-in-chunk, limb)
    combination reads THREE fixed rows of the (n_chunks, 62, B) view —
    static contiguous slices, which XLA lowers as cheap copies, instead of
    the first version's three whole-array gathers (measured ~4x faster on
    the chip)."""
    padded, nf, idx, shift, mask = _encode_tables(cell_size)
    n_chunks = padded // CHUNK_BYTES_GL
    b = rows_u8.shape[1]
    one = jnp.ones((1, b), jnp.uint32)
    zeros = jnp.zeros((padded - cell_size - 1, b), jnp.uint32)
    buf = jnp.concatenate([rows_u8.astype(jnp.uint32), one, zeros], axis=0)
    chunks = buf.reshape(n_chunks, CHUNK_BYTES_GL, b)
    vals = []  # (8*NL) arrays of (n_chunks, B), felt-in-chunk major
    for sub in range(8):
        for l in range(NL):
            bit0 = FELT_BITS * sub + LIMB_BITS * l
            nbits = min(LIMB_BITS, FELT_BITS - LIMB_BITS * l)
            byte0 = bit0 // 8
            s = bit0 % 8
            r0 = chunks[:, byte0, :]
            r1 = (
                chunks[:, byte0 + 1, :]
                if byte0 + 1 < CHUNK_BYTES_GL
                else jnp.zeros_like(r0)
            )
            r2 = (
                chunks[:, byte0 + 2, :]
                if byte0 + 2 < CHUNK_BYTES_GL
                else jnp.zeros_like(r0)
            )
            v = (r0 >> s) | (r1 << (8 - s)) | (r2 << (16 - s))
            vals.append(v & np.uint32((1 << nbits) - 1))
    # (8, NL, n_chunks, B) -> (n_chunks, 8, NL, B) -> (nf, NL, B)
    out = jnp.stack(vals).reshape(8, NL, n_chunks, b)
    return jnp.moveaxis(out, 2, 0).reshape(nf, NL, b)
