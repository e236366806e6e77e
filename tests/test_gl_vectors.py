"""Frozen Goldilocks vector suites: oracle regression + device parity.

The suites (tests/vectors/gl_testvectors.json, regen with
tools/gen_gl_vectors.py) freeze the GL hash composition — felt/byte `10*`
padding, 62-byte chunking, keyed Merkle convention — for both hash
instances, mirroring the reference's vector program shapes
(reference/nim/testvectors/src/testvectors.nim:20-72).
"""

import json
import pathlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codex_storage_proofs_circuits_tpu.oracle import goldilocks as OG
from codex_storage_proofs_circuits_tpu.oracle.merkle import merkle_tree

VEC = json.load(
    open(pathlib.Path(__file__).parent / "vectors" / "gl_testvectors.json")
)

HASHES = ("poseidon2", "monolith")


def _dig(strs):
    return tuple(int(s) for s in strs)


@pytest.mark.parametrize("hf", HASHES)
def test_digest_felts_vectors(hf):
    for n, want in enumerate(VEC[hf]["digest_felts"]):
        assert OG.digest_felts(hf, range(1, n + 1)) == _dig(want), n


@pytest.mark.parametrize("hf", HASHES)
def test_digest_bytes_vectors(hf):
    for n, want in enumerate(VEC[hf]["digest_bytes"]):
        data = bytes((i % 256) for i in range(1, n + 1))
        assert OG.digest_bytes(hf, data) == _dig(want), n


@pytest.mark.parametrize("hf", HASHES)
def test_merkle_felts_vectors(hf):
    comp = OG.compress_fn(hf)
    for i, want in enumerate(VEC[hf]["merkle_felts"]):
        n = i + 1
        leaves = [OG.int_to_digest(k) for k in range(1, n + 1)]
        assert merkle_tree(leaves, comp).root == _dig(want), n


@pytest.mark.parametrize("hf", HASHES)
def test_device_jnp_path_matches_vectors(hf):
    """The batched jnp sponge reproduces a sample of the frozen digests."""
    from codex_storage_proofs_circuits_tpu.ops import goldilocks_jnp as GJ

    for n in (1, 8, 9, 17):
        felts = np.arange(1, n + 1, dtype=np.uint64)
        arr = np.zeros((n, 4, 2), np.uint32)
        for k in range(4):
            arr[:, k, :] = (((felts >> np.uint64(16 * k)) & np.uint64(0xFFFF))
                            .astype(np.uint32)[:, None])
        out = np.asarray(
            jax.device_get(GJ.sponge_digest_felts(hf, jnp.asarray(arr)))
        )
        got = tuple(
            int(sum(int(out[j, l, 0]) << (16 * l) for l in range(4)))
            for j in range(4)
        )
        assert got == _dig(VEC[hf]["digest_felts"][n]), n
