"""Byte -> field-element encoding on device (L3 data path).

Vectorized equivalent of the oracle's pad_and_split_bytes/chunk_to_field
(reference/haskell/src/Slot.hs:243-270): `10*` byte padding, 31-byte
little-endian chunks, each chunk one canonical felt (< 2^248 < P) laid out as
(NL, B) limb planes.  Bytes pair up into 16-bit limbs; limb 15 is the single
top byte 30.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import limbs as L

NL = L.NL
CHUNK_BYTES = 31


def n_chunks(nbytes: int) -> int:
    """Number of 31-byte chunks after `10*` padding (always >= 1)."""
    return (nbytes + 1 + CHUNK_BYTES - 1) // CHUNK_BYTES


def pad_bytes_np(data: np.ndarray) -> np.ndarray:
    """(B, nbytes) uint8 -> (B, n_chunks*31) uint8 with the 0x01 marker."""
    b, nbytes = data.shape
    total = n_chunks(nbytes) * CHUNK_BYTES
    out = np.zeros((b, total), dtype=np.uint8)
    out[:, :nbytes] = data
    out[:, nbytes] = 1
    return out


def bytes_to_felt_limbs(data: jnp.ndarray) -> jnp.ndarray:
    """(B, nbytes) uint8 on device -> (nchunks, NL, B) canonical felt limbs.

    The byte-level `10*` padding must already be applied (pad_bytes_np), i.e.
    nbytes must be a multiple of 31.
    """
    b, total = data.shape
    assert total % CHUNK_BYTES == 0
    nch = total // CHUNK_BYTES
    chunks = data.reshape(b, nch, CHUNK_BYTES).astype(jnp.uint32)
    # bytes 0..29 pair into limbs 0..14; byte 30 is limb 15
    lo = chunks[:, :, 0:30:2]
    hi = chunks[:, :, 1:31:2]
    low_limbs = lo + (hi << 8)  # (B, nch, 15)
    top = chunks[:, :, 30:31]  # (B, nch, 1)
    limbs15 = jnp.concatenate([low_limbs, top], axis=2)  # (B, nch, 16)
    # -> (nch, 16, B)
    return jnp.transpose(limbs15, (1, 2, 0))


def pad_bytes_device(data: jnp.ndarray) -> jnp.ndarray:
    """Device twin of pad_bytes_np: append the 0x01 marker byte + zero fill."""
    b, nbytes = data.shape
    total = n_chunks(nbytes) * CHUNK_BYTES
    marker = jnp.concatenate(
        [
            jnp.full((b, 1), 1, jnp.uint8),
            jnp.zeros((b, total - nbytes - 1), jnp.uint8),
        ],
        axis=1,
    )
    return jnp.concatenate([data, marker], axis=1)


def encode_cells_device(data: jnp.ndarray) -> jnp.ndarray:
    """Fully on-device encode: (B, cell_size) uint8 -> (nfelts, NL, B)."""
    return bytes_to_felt_limbs(pad_bytes_device(data))


def encode_cells(data: jnp.ndarray) -> jnp.ndarray:
    """(B, cell_size) raw cell bytes -> (nfelts, NL, B) canonical felts.

    Applies byte padding host-side (static shapes) then packs on device.
    """
    if not isinstance(data, np.ndarray):
        import jax

        data = jax.device_get(data)
    padded = pad_bytes_np(data)
    return bytes_to_felt_limbs(jnp.asarray(padded))
