#!/usr/bin/env python
"""Regenerate the frozen Goldilocks test-vector suites from the CPU oracle.

GL twin of tools/gen_vectors.py, mirroring the reference's vector program
shapes (reference/nim/testvectors/src/testvectors.nim:20-72) for both GL
hash instances:

  digest_felts   : digest([1..n])                   n = 0..17 (sweeps the
                   10* felt padding across two rate-8 blocks)
  digest_bytes   : digest_bytes([1..n])             n = 0..130 (sweeps the
                   `10*` byte padding across 62-byte chunk boundaries)
  merkle_felts   : root of [intToDigest(1..n)]      n = 1..40 (odd/even/
                   singleton layer shapes)

Provenance: the permutation constants are the canonical published instances
(fields/goldilocks.py): Poseidon2-Goldilocks t=12 via the canonical
Grain-LFSR procedure anchored against the published HorizenLabs/Plonky3
tables, and Monolith-64 per its paper's SHAKE-128 procedure with the
Plonky2-compatible Concrete matrix.  These vectors freeze the sponge/
Merkle composition (the reference's nim-goldilocks-hash call surface) on
top of those canonical permutations.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from codex_storage_proofs_circuits_tpu.oracle.goldilocks import (
    compress_fn,
    digest_bytes,
    digest_felts,
    int_to_digest,
)
from codex_storage_proofs_circuits_tpu.oracle.merkle import merkle_tree


def main() -> None:
    vectors = {}
    for hf in ("poseidon2", "monolith"):
        comp = compress_fn(hf)
        vectors[hf] = {
            "digest_felts": [
                [str(v) for v in digest_felts(hf, range(1, n + 1))]
                for n in range(0, 18)
            ],
            "digest_bytes": [
                [str(v) for v in digest_bytes(hf, bytes((i % 256) for i in range(1, n + 1)))]
                for n in range(0, 131)
            ],
            "merkle_felts": [
                [str(v) for v in merkle_tree(
                    [int_to_digest(i) for i in range(1, n + 1)], comp
                ).root]
                for n in range(1, 41)
            ],
        }
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "vectors", "gl_testvectors.json"
    )
    with open(out, "w") as f:
        json.dump(vectors, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
